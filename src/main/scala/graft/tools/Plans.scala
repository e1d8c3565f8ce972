package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints executedPlan summaries for the headline queries so
  * pushdown / broadcast / codegen spans can be inspected.
  * runMain graft.tools.Plans [sfDir] [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.EntryQueries.ensureRegistered(spark)
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    qs.foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      try {
        val df = fn(spark, dir)
        println(df.queryExecution.executedPlan.toString.take(4000))
      } catch { case e: Throwable => println(s"[plan] failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
