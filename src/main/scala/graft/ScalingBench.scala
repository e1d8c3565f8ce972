package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.st
import graft.operators.SpatialOps
import graft.sources.ImageTable

/** Scaling-efficiency evidence for the north rule: the same spatial-join +
  * tile-assignment job at two parallelism levels (local[N] vs local[4N] —
  * the sandbox proxy for N vs 4N executors; see BASELINE.md). Reports
  * throughput (rows/sec) so BENCH/BASELINE.md can record
  * eff = thr(4N) / (4 · thr(N)).
  *
  * Workload = the target metric's pipeline: synthesize image metadata (the
  * column-pruned scan equivalent), derive points from phash, cell-prefilter
  * broadcast PIP join against the district polygon dictionary, z-order tile
  * assignment, per-tile aggregation. 30% of rows sit in 3 hot cells (skew).
  *
  * Usage: runMain graft.ScalingBench <cpus> [nRows] [repeats]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 4000000L
    val repeats = if (args.length > 2) args(2).toInt else 3

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    st.registerAll(spark)

    val polys = EntryQueries.districtPolygons(spark)

    val mode = sys.env.getOrElse("SCALING_MODE", "full")

    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      // partitions fixed independent of cpus → same plan shape at both sizes
      val images = spark.range(0, n, 1, 128)
        .withColumn("phash", st.phashFor(col("id")))
        .withColumn("lon", SpatialOps.phashLon(col("phash")))
        .withColumn("lat", SpatialOps.phashLat(col("phash")))
      val out: Long = mode match {
        case "synth" =>
          images.select(st.cellId(col("lon"), col("lat"), 7).as("tile"))
            .agg(sum(col("tile").bitwiseAND(lit(1L)))).head().getLong(0)
        case "join" =>
          SpatialOps.pipJoin(images.select("id", "phash", "lon", "lat"),
            col("lon"), col("lat"), polys, "geom", res = 7)
            .agg(count(lit(1))).head().getLong(0)
        case _ =>
          val joined = SpatialOps.pipJoin(
            images.select("id", "phash", "lon", "lat"),
            col("lon"), col("lat"), polys, "geom", res = 7)
            .withColumn("tile", st.cellId(col("lon"), col("lat"), 7))
          val agg = joined.groupBy("tile").agg(count(lit(1)).as("n_images"))
          agg.agg(sum("n_images"), count(lit(1))).head().getLong(0)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, out)
    }

    run() // warmup (JIT + codegen)
    val results = (1 to repeats).map(_ => run())
    val best = results.minBy(_._1)
    val rows = best._2
    println(f"""{"bench":"scaling","cpus":$cpus,"n":$n,"joined_rows":$rows,"seconds":${best._1}%.3f,"rows_per_sec":${n / best._1}%.0f}""")
    spark.stop()
  }
}
