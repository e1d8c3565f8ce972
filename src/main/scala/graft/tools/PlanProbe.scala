package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one SparkEntry query (plan-audit
  * tooling; usage: runMain graft.tools.PlanProbe <queryName> [sfDir]). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q29_image_neardup"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
