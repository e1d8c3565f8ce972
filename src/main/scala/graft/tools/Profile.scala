package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage profiler (runMain graft.tools.Profile <sfDir>). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").cache()
    println("docs: " + d.count())
    val sigs = time("minhash sigs") {
      val x = d.select(col("doc_id"), Dedup.minhash(col("text"), 4, 32).as("sig")).cache()
      x.count(); x
    }
    val cands = time("candidates") {
      val c = Dedup.minhashCandidates(d, col("doc_id"), col("text")).cache()
      println("n_cands: " + c.count()); c
    }
    time("jaccard verify") {
      println("verified: " + Dedup.jaccardVerify(cands, d, col("doc_id"), col("text"), minJaccard = 0.5).count())
    }
    spark.stop()
  }
}
