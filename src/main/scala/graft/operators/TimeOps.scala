package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time operators Spark's relational surface lacks as primitives:
  * as-of join, gap sessionization, and point-in-interval join.
  *
  * All three are shaped for the 100-TB case: one hash shuffle each, no
  * range-condition (theta) joins, no per-row fan-out proportional to data
  * size, and bit-deterministic output at any parallelism (explicit total
  * orders everywhere a window or tie-break decides a row).
  */
object TimeOps {

  /** As-of join: attach to every left row the most recent right row with
    * `rightTs <= leftTs` in the same key group (inclusive match; ties on
    * the timestamp broken by the LARGEST `tieBreak`), or nulls when no
    * such row exists.
    *
    * Spark-first shape: tag each side, `unionByName`, then ONE per-key
    * window pass — `last(payload, ignoreNulls)` over rows from the start
    * of the key group to the current row. That is a single hash shuffle
    * on the key; there is no range join and no candidate fan-out, so cost
    * is O(rows log rows-per-key) at any corpus size. Right rows sort
    * before left rows at an equal timestamp (side 0 < 1), which is what
    * makes the match inclusive; among right rows at the same timestamp the
    * largest tie-break wins, so the result is bit-deterministic.
    *
    * `horizon`: optional interval literal (e.g. "7 days"). A match older
    * than `leftTs - horizon` is nulled out post-hoc — the window pass is
    * unchanged, so the horizon costs no extra shuffle.
    *
    * At giant single-key timelines the window is per-key sequential (as-of
    * semantics are inherently a per-key scan); keys are independent, so
    * the cure for a skewed tenant is time-slicing that tenant upstream,
    * not a different join algorithm.
    *
    * Left/payload column names must not collide; both timestamp columns
    * must be non-null.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      payload: Seq[String],
      horizon: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val clash = left.columns.toSet.intersect(payload.toSet)
    require(clash.isEmpty, s"left already has payload columns: $clash")

    val pay = struct(payload.map(col) :+ col(rightTs).as("__mts"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        col(tieBreak).cast("long").as("__tie"),
        pay.as("__pay"),
        lit(0).as("__side")): _*)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__side", lit(1))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val gated = horizon match {
      case Some(h) =>
        matched.withColumn("__m",
          when(col("__m").getField("__mts") >= col("__ts") - expr(s"INTERVAL $h"), col("__m")))
      case None => matched
    }
    gated.select(leftCols.map(col) ++
      payload.map(p => col("__m").getField(p).as(p)): _*)
  }

  /** Gap sessionization: events of one key closer than `gap` chain into a
    * session. Uses Spark's native `session_window` (codegen'd, and the
    * same operator Structured Streaming uses for stateful session windows,
    * so the batch and streaming paths share semantics): windows
    * `[ts, ts+gap)` merge while they overlap OR touch — a new session
    * starts exactly when the gap to the previous event is STRICTLY
    * greater than `gap` (a gap of exactly `gap` still merges; pinned by
    * spec).
    *
    * Output per session: keys, `session_start`/`session_end` = min/max
    * EVENT time (not the padded window bound — min/max are engine-neutral
    * and replay in any SQL engine), `n_events`, and `total_value` as an
    * exact DECIMAL sum cast back to double (order-independent).
    */
  def sessionize(
      events: DataFrame,
      keys: Seq[String],
      ts: String,
      gap: String,
      value: String): DataFrame = {
    events
      .groupBy(session_window(col(ts), gap).as("__sw") +: keys.map(col): _*)
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(value).cast(DecimalType(20, 6))).cast("double").as("total_value"))
      .select(keys.map(col) ++ Seq(col("session_start"), col("session_end"),
        col("n_events"), col("total_value")): _*)
  }

  /** Hopping (sliding) event-time window aggregation via Spark's native
    * `window(ts, windowLen, slide)` — each event lands in
    * `windowLen/slide` overlapping windows (epoch-aligned, the same
    * semantics Structured Streaming uses, so the batch and streaming paths
    * agree). The window replication happens MAP-SIDE and feeds a partially
    * aggregated shuffle, so shuffle volume is O(windows × keys), not
    * O(rows × windowLen/slide) — at 100 TB the fan-out never crosses the
    * wire un-aggregated.
    *
    * Output per (window, keys): `window_start`/`window_end` (event-time
    * bounds), `n_events`, and `total_value` as an exact DECIMAL sum cast
    * back to double (order-independent, engine-neutral). */
  def hoppingAgg(
      events: DataFrame,
      ts: String,
      windowLen: String,
      slide: String,
      keys: Seq[String],
      value: String): DataFrame = {
    events
      .groupBy(window(col(ts), windowLen, slide).as("__w") +: keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(value).cast(DecimalType(20, 6))).cast("double").as("total_value"))
      .select(Seq(col("__w.start").as("window_start"), col("__w.end").as("window_end")) ++
        keys.map(col) ++ Seq(col("n_events"), col("total_value")): _*)
  }

  /** Point-in-interval join (`start <= ts < end`, end-exclusive) via a
    * time-bucket equi-join: each interval explodes to the `bucketUnit`
    * buckets it covers, each point maps to its own bucket, and the join is
    * a plain equi-join on the bucket plus the exact residual predicate.
    * A matching pair meets in exactly ONE bucket — the point's — so there
    * is no post-join dedup. One hash shuffle; interval fan-out =
    * number of buckets covered (choose `bucketUnit` near the typical
    * interval length). Empty intervals (`end <= start`) match nothing and
    * are dropped up front.
    *
    * `salt` > 1 splits each time bucket into `salt` sub-buckets (points
    * hashed by their timestamp, intervals replicated) for hot-bucket skew
    * — e.g. a flash-sale hour holding 1% of all points. Output rows are
    * identical for any salt value.
    *
    * `bucketUnit` is a `date_trunc` unit: "hour", "day", "week", ….
    */
  def intervalJoin(
      points: DataFrame,
      ts: String,
      intervals: DataFrame,
      start: String,
      end: String,
      bucketUnit: String,
      salt: Int = 1): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val iv0 = intervals.filter(col(end) > col(start))
      .withColumn("__b", explode(expr(
        s"sequence(date_trunc('$bucketUnit', $start), " +
          s"date_trunc('$bucketUnit', $end - INTERVAL 1 MICROSECOND), INTERVAL 1 $bucketUnit)")))
    val iv = if (salt == 1) iv0.withColumn("__s", lit(0))
    else iv0.withColumn("__s", explode(lit((0 until salt).toArray)))
    val pt = points
      .withColumn("__b", expr(s"date_trunc('$bucketUnit', $ts)"))
      .withColumn("__s",
        if (salt == 1) lit(0) else pmod(xxhash64(col(ts)), lit(salt)).cast("int"))
    pt.join(iv,
        pt("__b") === iv("__b") && pt("__s") === iv("__s") &&
          pt(ts) >= iv(start) && pt(ts) < iv(end))
      .drop("__b").drop("__s")
  }
}
