package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.st
import graft.core.CellIndex

/** Distributed spatial operators, built Spark-first (SURVEY.md §2.3 J5–J7,
  * §2.6 O4): declarative plans over the cell index; Catalyst/AQE pick
  * physical strategies; explicit broadcast + salting where the optimizer
  * can't know better.
  *
  * Scale design notes (100 TB target):
  *  - PIP join is always cell-prefilter equi-join + exact residual — never a
  *    theta/cross join. Polygon side exploded to covering cells; points carry
  *    exactly one cell each, so no post-join dedup is needed.
  *  - Small polygon dictionaries are broadcast (no shuffle of the point
  *    side); large ones fall back to sort-merge on cell with optional
  *    explicit salting for hot cells (skew rule in BASELINE.json).
  *  - kNN is ring expansion: a handful of bounded distributed passes, each an
  *    equi-join on cell; stragglers (sparse regions) escalate ring radius
  *    geometrically. No per-row driver loops.
  */
object SpatialOps {

  /** lon column derived from a phash column (high 32 bits). */
  def phashLon(phash: Column): Column =
    shiftrightunsigned(phash, 32).cast("double") / 4294967296.0 * 360.0 - 180.0

  /** lat column derived from a phash column (low 32 bits). */
  def phashLat(phash: Column): Column =
    (phash.bitwiseAND(lit(0xFFFFFFFFL))).cast("double") / 4294967296.0 * 170.0 - 85.0

  /** Point-in-polygon join: each point row joined to every polygon containing
    * it. `polys` must have (`idCols`..., `geomCol`: WKB). Returns point rows
    * + polygon id columns.
    *
    * @param broadcastPolys broadcast the exploded polygon-cell dict (correct
    *   for dictionaries up to ~100s of MB; the common case). When false, a
    *   sort-merge join on `cell` is used — combine with [[saltCells]] for
    *   hot-cell skew.
    */
  def pipJoin(
      points: DataFrame, lon: Column, lat: Column,
      polys: DataFrame, geomCol: String,
      res: Int,
      broadcastPolys: Boolean = true): DataFrame = {
    val polyCells = polys
      .withColumn("__cell", explode(st.cellCover(col(geomCol), res)))
    val pts = points.withColumn("__cell", st.cellId(lon, lat, res))
    val build = if (broadcastPolys) broadcast(polyCells) else polyCells
    pts.join(build, "__cell")
      .filter(st.contains(col(geomCol), lon, lat))
      .drop("__cell", geomCol)
  }

  /** Cell equi-join with explicit salting for hot cells (explicit skew
    * handling mandated by BASELINE.json; AQE skew-join also stays on).
    *
    * The probe (big) side salts each row deterministically from
    * `saltSource` (content hash — NOT partition-dependent ids); the build
    * side is replicated `saltFactor` ways for the `hotCells` subset only.
    */
  def saltedCellJoin(
      big: DataFrame, bigCell: Column, saltSource: Column,
      build: DataFrame, buildCell: Column,
      hotCells: Seq[Long], saltFactor: Int): DataFrame = {
    val hot = hotCells.toSet
    val isHotBig = bigCell.isInCollection(hot)
    val bigSalted = big
      .withColumn("__salt", when(isHotBig, pmod(st.mix64(saltSource), lit(saltFactor))).otherwise(lit(0)))
      .withColumn("__cell", bigCell)
    val isHotBuild = buildCell.isInCollection(hot)
    val buildSalted = build
      .withColumn("__cell", buildCell)
      .withColumn("__salt",
        explode(when(isHotBuild, sequence(lit(0), lit(saltFactor - 1))).otherwise(array(lit(0)))))
    bigSalted.join(buildSalted, Seq("__cell", "__salt")).drop("__salt")
  }

  /** Per-cell histogram → the cells holding more than `threshold` rows.
    * Used to derive the explicit salt set deterministically from data. */
  def hotCells(points: DataFrame, cell: Column, threshold: Long): Array[Long] =
    points.groupBy(cell.as("__cell")).count()
      .filter(col("count") > threshold)
      .orderBy(col("__cell"))
      .select("__cell").collect().map(_.getLong(0))

  /** k nearest `points` for each row of `queries` by planar squared distance
    * (exact arithmetic → deterministic ordering; ties broken by `pointId`).
    *
    * Ring expansion: pass i joins still-unsatisfied queries against all
    * point-cells within Chebyshev radius r_i of the query cell
    * (r grows geometrically), keeps each query's current top-k, and marks a
    * query done when its kth distance is provably ≤ any point outside the
    * searched disk (distance ≥ r · cellHeight). Queries still unsatisfied
    * after `maxRing` fall back to a brute-force join — correctness never
    * depends on the cutoff.
    *
    * Each pass is a distributed cell equi-join; the number of passes is
    * bounded (≤ log2(maxRing)+2), independent of data size.
    */
  def knnJoin(
      spark: SparkSession,
      queries: DataFrame, qId: Column, qLon: Column, qLat: Column,
      points: DataFrame, pId: Column, pLon: Column, pLat: Column,
      k: Int, res: Int, maxRing: Int = 64): DataFrame = {

    val q0 = queries.select(qId.as("q_id"), qLon.as("q_lon"), qLat.as("q_lat"))
      .withColumn("q_cell", st.cellId(col("q_lon"), col("q_lat"), res))
    val pts = points.select(pId.as("p_id"), pLon.as("p_lon"), pLat.as("p_lat"))
      .withColumn("p_cell", st.cellId(col("p_lon"), col("p_lat"), res))

    val cellH = 180.0 / (1L << res).toDouble
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("p_id"))

    def topkFor(qs: DataFrame, radius: Int): DataFrame =
      qs.withColumn("cand_cell", explode(st.cellDisk(col("q_cell"), lit(radius))))
        .join(pts, col("cand_cell") === col("p_cell"))
        .withColumn("dist", st.sqDist(col("q_lon"), col("q_lat"), col("p_lon"), col("p_lat")))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select("q_id", "q_lon", "q_lat", "q_cell", "p_id", "dist", "rn")

    var pending = q0
    var radius = 1
    var acc: Option[DataFrame] = None
    var iter = 0
    while (iter < 12 && radius <= maxRing) {
      // persisted so the stats pass and the final union share one
      // computation; blocks are evicted LRU (caller actions hit the cache)
      val topk = topkFor(pending, radius).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val guarantee = radius.toDouble * cellH
      // satisfied: k results and kth distance within the guaranteed disk
      val stats = topk.groupBy("q_id")
        .agg(count(lit(1)).as("n"), max(col("dist")).as("kth"))
        .withColumn("ok", col("n") === k && col("kth") <= lit(guarantee * guarantee))
      val done = topk.join(stats.filter(col("ok")).select("q_id"), "q_id")
        .select("q_id", "p_id", "dist", "rn")
      acc = Some(acc.map(_.unionAll(done)).getOrElse(done))
      pending = pending.join(stats.filter(col("ok")).select("q_id"), Seq("q_id"), "left_anti")
      radius *= 2
      iter += 1
      if (pending.isEmpty) { radius = maxRing + 1 } // exit
    }
    // brute-force fallback for any query still pending (empty in practice)
    val rest =
      if (pending.isEmpty) None
      else Some(pending.crossJoin(pts)
        .withColumn("dist", st.sqDist(col("q_lon"), col("q_lat"), col("p_lon"), col("p_lat")))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select("q_id", "p_id", "dist", "rn"))
    (acc, rest) match {
      case (Some(a), Some(r)) => a.unionAll(r)
      case (Some(a), None)    => a
      case (None, Some(r))    => r
      case (None, None)       => queries.sparkSession.emptyDataFrame
    }
  }

  /** Deterministic tile assignment + z-order layout: tile = cell at
    * `tileRes`; output repartitioned by tile range (morton/z-order key) and
    * sorted within partitions → byte-stable files at any parallelism
    * (partition count fixed by `numPartitions`, not by cluster size).
    */
  def tileAssign(
      df: DataFrame, lon: Column, lat: Column,
      tileRes: Int, numPartitions: Int, sortCols: Seq[String]): DataFrame = {
    val tiled = df.withColumn("tile", st.cellId(lon, lat, tileRes))
    tiled
      .repartitionByRange(numPartitions, col("tile"))
      .sortWithinPartitions(col("tile") +: sortCols.map(col): _*)
  }
}
