package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.st
import graft.operators.SpatialOps

/** Skew evidence: a large-large cell equi-join where 30% of the probe side
  * sits in 3 hot cells, executed (a) as a plain sort-merge join with AQE
  * skew handling DISABLED (what a naive engine does), (b) with AQE skew
  * join, (c) with our explicit salting. Prints wall seconds for each.
  * runMain graft.tools.SkewBench <cpus> <nPoints> <buildPerCell>
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 20000000L
    val buildRows = if (args.length > 2) args(2).toInt else 2000000

    def session(aqeSkew: Boolean) = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"skew-$aqeSkew")
        .config("spark.sql.shuffle.partitions", 64)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", aqeSkew)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      st.registerAll(s)
      s
    }

    def pointsDf(s: SparkSession) = s.range(0, n, 1, 128)
      .withColumn("phash", st.phashFor(col("id")))
      .withColumn("cell", st.cellId(
        SpatialOps.phashLon(col("phash")), SpatialOps.phashLat(col("phash")), 7))

    // build side: a handful of rows per DISTINCT cell (like a polygon/tile
    // dictionary) — join output stays ~4×|probe|; the skew shows up as the
    // hot cells' probe rows landing in single shuffle partitions, not as a
    // quadratic output blowup
    def buildDf(s: SparkSession) = s.range(0, buildRows, 1, 64)
      .withColumn("phash", st.phashFor(col("id") * 7L + 3L))
      .withColumn("cell", st.cellId(
        SpatialOps.phashLon(col("phash")), SpatialOps.phashLat(col("phash")), 7))
      .select(col("cell")).distinct()
      .select(col("cell"), explode(array(lit(0), lit(1), lit(2), lit(3))).as("variant"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"""{"bench":"skew","variant":"$name","cpus":$cpus,"n":$n,"joined":$rows,"seconds":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    }

    { // (a) plain SMJ, AQE skew off
      val s = session(aqeSkew = false)
      val p = pointsDf(s); val b = buildDf(s)
      time("smj_no_skew_handling") {
        p.join(b, "cell").agg(count(lit(1))).head().getLong(0)
      }
      // (c) explicit salting in the same session (skew handling is ours)
      val hot = SpatialOps.hotCells(p, col("cell"), factor = 8.0, topN = 64)
      println(s"""{"bench":"skew","hot_cells":${hot.length}}""")
      time("explicit_salted") {
        SpatialOps.saltedCellJoin(p, col("cell"), col("id"), b, col("cell"),
          hot.toSeq, saltFactor = 16).agg(count(lit(1))).head().getLong(0)
      }
      s.stop()
    }
    { // (b) AQE skew join
      val s = session(aqeSkew = true)
      val p = pointsDf(s); val b = buildDf(s)
      time("aqe_skew_join") {
        p.join(b, "cell").agg(count(lit(1))).head().getLong(0)
      }
      s.stop()
    }
  }
}
