package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the image→geometry→PIP-join→tile pipeline end to end. */
  def entry(spark: SparkSession): DataFrame =
    EntryQueries.q20ImagePipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryQueries.oracleQueries.map { case (k, (fn, _)) => k -> fn } ++
      EntryQueries.rowsOnlyQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EntryQueries.oracleQueries.map { case (k, (_, sql)) => k -> sql }

  /** Untimed fixture pre-build (Bench warmup): indexes that queries reuse. */
  def prepare(spark: SparkSession, dir: String): Unit =
    EntryQueries.prepareFixtures(spark, dir)
}
