package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, CacheTracker}

/** Phase timings for q48_keep_best: pair engine vs closure algorithms. */
object KeepBestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.EntryQueries.ensureRegistered(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet(s"$dir/documents.parquet")
    var t0 = System.nanoTime()
    val pairs = Dedup.simhashPairs(d, col("doc_id"), col("text"), maxHamming = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val np = pairs.count()
    println(s"phase pairs: ${(System.nanoTime()-t0)/1e9}s n=$np")
    for (alg <- Seq("label", "star", "auto", "label")) {
      t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"), algorithm = alg)
      val nc = comps.count()
      println(s"phase closure[$alg]: ${(System.nanoTime()-t0)/1e9}s n=$nc")
      CacheTracker.releaseAll()
    }
    pairs.unpersist()
    spark.stop()
  }
}
