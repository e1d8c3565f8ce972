package graft.tools

import org.apache.spark.sql.SparkSession

import graft.EntryQueries

/** Print the formatted physical plan of named oracle queries — the
  * plan-audit loop ("is the filter pushed, is the agg partial, is the join
  * broadcast") without attaching a debugger. Usage:
  * `runMain graft.tools.ExplainProbe <sfDir> <queryName> [<queryName>…]`. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-explain").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      args.drop(1).foreach { name =>
        val df = EntryQueries.oracleQueries(name)._1(spark, dir)
        println(s"===== $name =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    } finally spark.stop()
  }
}
