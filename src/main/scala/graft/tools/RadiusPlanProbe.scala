package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.st
import graft.operators.SpatialOps
object RadiusPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = spark.range(100000).select(col("id"),
      (pmod(st.mix64(col("id")), lit(360000L)).cast("double") / 1000.0 - 180.0).as("lon"),
      (pmod(st.mix64(col("id") + 1000000), lit(170000L)).cast("double") / 1000.0 - 85.0).as("lat"))
    val r = SpatialOps.radiusPairsHaversine(pts, col("id"), col("lon"), col("lat"), 100000.0, 7)
    r.explain("formatted")
    val t0 = System.nanoTime(); val n = r.count()
    println(s"pairs=$n in ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
