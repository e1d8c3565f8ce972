package graft.tools
import org.apache.spark.sql.SparkSession
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    var t0 = System.nanoTime()
    try graft.SparkEntry.prepare(spark, dir)
    catch { case t: Throwable => println("PREPARE FAILED: " + t) }
    println(s"prepare: ${(System.nanoTime()-t0)/1e9}s")
    graft.operators.CacheTracker.releaseAll()
    t0 = System.nanoTime()
    val n = graft.EntryQueries.q42AnnIndex(spark, dir).count()
    println(s"q42 timed: ${(System.nanoTime()-t0)/1e9}s rows=$n")
    t0 = System.nanoTime()
    val n2 = graft.EntryQueries.q42AnnIndex(spark, dir).count()
    println(s"q42 again: ${(System.nanoTime()-t0)/1e9}s rows=$n2")
    spark.stop()
  }
}
