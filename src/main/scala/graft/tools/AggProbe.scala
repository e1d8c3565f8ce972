package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal probe: does a bare hash aggregation scale on this box?
  * runMain graft.tools.AggProbe <cpus> <n> <groups>
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val groups = if (args.length > 2) args(2).toLong else 17000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, n, 1, 128)
        .groupBy(pmod(col("id") * 2654435761L % 1000000007L, lit(groups)).as("g"))
        .agg(count(lit(1)).as("c"))
        .agg(sum("c")).head()
      (System.nanoTime() - t0) / 1e9
    }
    run()
    val best = (1 to 3).map(_ => run()).min
    println(f"""{"probe":"agg","cpus":$cpus,"n":$n,"seconds":$best%.3f,"rows_per_sec":${n / best}%.0f}""")
    spark.stop()
  }
}
