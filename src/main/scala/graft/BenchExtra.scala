package graft
import org.apache.spark.sql.SparkSession

/** A/B measurement harness for optimization work — NOT the driver's bench
  * (Bench.scala is frozen; this main exists so per-query effects can be
  * separated from the host's sub-minute capacity flapping, BENCH/BASELINE.md
  * §0). Runs each selected query `SPARK_GRAFT_REPEATS` times (default 3) in
  * one session and reports per-query min + all samples; the min of several
  * back-to-back samples is robust against one-sided external-occupancy
  * noise. Same contract as Bench otherwise: data dir from
  * `SPARK_GRAFT_SF_DIR`, cores from `SPARK_GRAFT_CPUS`,
  * `SPARK_GRAFT_ONLY=q...,q...` filters.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // untimed full-path warmup (first selected query) + fixtures
    ordered.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      finally graft.operators.CacheTracker.releaseAll()
    }
    try SparkEntry.prepare(spark, sfDir)
    catch { case _: Throwable => () }
    finally graft.operators.CacheTracker.releaseAll()
    val results = ordered.map { case (name, fn) =>
      val ts = (0 until repeats).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(name)
        try fn(spark, sfDir).count()
        catch { case t: Throwable => println(s"ERROR $name: ${t.getMessage}") }
        finally graft.operators.CacheTracker.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }
      (name, ts)
    }
    val qs = results.map { case (k, ts) =>
      s"\"$k\":{\"min\":${ts.min},\"samples\":[${ts.mkString(",")}]}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"benchx","repeats":$repeats,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
