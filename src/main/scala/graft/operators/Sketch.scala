package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.{st, KMinDistinct, MisraGries}

/** Cardinality sketches — deterministic, integer-exact APPROXIMATE distinct
  * counting. The 100-TB calibration primitive ("vocabulary size per source",
  * "unique users per shard") where exact `count(distinct …)` shuffles every
  * distinct value: the KMV sketch ships one ≤k·8-byte state per group.
  *
  * Unlike Spark's `approx_count_distinct` (HyperLogLog++ with
  * implementation-defined float bias tables — irreproducible outside the
  * JVM), KMV's estimate ⌊(k−1)·2^64 / kthHash⌋ is pure integer arithmetic
  * over a deterministic hash, so the whole sketch replays bit-identically
  * in the DuckDB oracle. Standard error ≈ 1/√k (k=256 ≈ 6%).
  */
object Sketch {

  /** KMV state column: the k smallest DISTINCT hashes of the group in
    * unsigned ascending order ([[graft.functions.KMinDistinct]] — a
    * TypedImperativeAggregate, so the partial/merge passes are map-side). */
  def kMins(hash: Column, k: Int): Column =
    Bridge.column(KMinDistinct(Bridge.expression(hash), k).toAggregateExpression())

  /** Per-group approximate distinct count of a PRE-HASHED column (any
    * uniformly-mixed 64-bit hash; unsigned order). Output:
    * (grp, n_kept, est_distinct) — when the group has fewer than k distinct
    * hashes the sketch IS the distinct set and the estimate is exact. */
  def kmvDistinctHashed(df: DataFrame, group: Column, hash: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(group.as("grp"))
      .agg(kMins(hash, k).as("mins"))
      .select(col("grp"),
        size(col("mins")).cast("long").as("n_kept"),
        when(size(col("mins")) < k, size(col("mins")).cast("long"))
          .otherwise(st.kmvEst(element_at(col("mins"), k), k))
          .as("est_distinct"))
  }

  /** EXACT global heavy hitters without a full-vocabulary shuffle — the
    * two-pass sketch-then-verify shape (the LSH-recall + exact-verify
    * philosophy applied to frequency): (1) a Misra-Gries
    * TypedImperativeAggregate ([[graft.functions.MisraGries]]) collapses
    * the corpus map-side to ≤ sketchSize candidate strings per task state —
    * provably a SUPERSET of every item with frequency > n/(sketchSize+1);
    * (2) ONLY the candidates recount exactly (broadcast semi-filter before
    * the groupBy, so the count shuffle carries ≤ sketchSize keys), and the
    * ppm threshold filters on exact integers. The OUTPUT — exact counts of
    * truly-heavy items — is bit-deterministic even though MG residuals are
    * merge-order-dependent, which is why the gate can hold it to a plain
    * GROUP BY / HAVING oracle. `require` enforces the recall precondition
    * minPpm > 10^6/(sketchSize+1) — below it the sketch could MISS a
    * qualifying item and silently under-report. */
  def heavyHitters(df: DataFrame, value: Column, sketchSize: Int, minPpm: Long): DataFrame = {
    require(sketchSize >= 1, "sketchSize must be >= 1")
    require(minPpm >= 1 && minPpm <= 1000000L, "minPpm in [1, 1e6]")
    require((sketchSize + 1).toLong * minPpm > 1000000L,
      s"no recall guarantee: need minPpm > 1e6/(sketchSize+1) = ${1000000L / (sketchSize + 1) + 1}")
    require(!df.isStreaming,
      "heavyHitters is two-pass (an eager sketch action feeds the recount) — " +
        "batch only; for streams call it from foreachBatch over each snapshot")
    val v = df.select(value.cast("string").as("w")).where(col("w").isNotNull)
    // ONE corpus pass yields sketch + total; the 1-row result is
    // localCheckpoint'd because it has two consumers below (an unpersisted
    // frame would re-run the corpus aggregation per consumer — the
    // documented persist-the-small-frame rule). Total corpus scans: 2
    // (sketch+count, recount) — the minimum for sketch-then-verify.
    val sk = v.agg(Bridge.column(
        MisraGries(Bridge.expression(col("w")), sketchSize).toAggregateExpression())
        .as("c"), count(lit(1)).as("total"))
      .localCheckpoint(true)
    val cands = sk.select(explode(col("c")).as("w"))
    val total = sk.select(col("total"))
    v.join(broadcast(cands), Seq("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") * 1000000L >= col("total") * minPpm)
      .select(col("w"), col("n"))
  }

  /** PER-GROUP exact heavy hitters — [[heavyHitters]]'s guarantee applied
    * within each group key ("per-source dominant terms"): one ≤k-entry MG
    * state per group map-side, candidates ≤ groups·k rows. Same recall
    * precondition per group; output (grp, w, n) exact.
    *
    * `broadcastCandidates` (default true) broadcast-hints the candidate
    * set and per-group totals onto the recount — right while groups·k
    * stays broadcastable. At millions of groups pass false: the hint goes
    * away and AQE picks the join strategy from the actual sizes (the
    * docstring previously SAID to drop the hint but the API offered no
    * way — driver OOM risk at high group cardinality). */
  def heavyHittersByKey(df: DataFrame, group: Column, value: Column,
                        sketchSize: Int, minPpm: Long,
                        broadcastCandidates: Boolean = true): DataFrame = {
    require(sketchSize >= 1, "sketchSize must be >= 1")
    require(minPpm >= 1 && minPpm <= 1000000L, "minPpm in [1, 1e6]")
    require((sketchSize + 1).toLong * minPpm > 1000000L,
      s"no recall guarantee: need minPpm > 1e6/(sketchSize+1) = ${1000000L / (sketchSize + 1) + 1}")
    require(!df.isStreaming,
      "heavyHittersByKey is two-pass (an eager sketch action feeds the recount) — " +
        "batch only; for streams call it from foreachBatch over each snapshot")
    val v = df.select(group.cast("string").as("grp"), value.cast("string").as("w"))
      .where(col("w").isNotNull && col("grp").isNotNull)
    val sk = v.groupBy("grp")
      .agg(Bridge.column(
        MisraGries(Bridge.expression(col("w")), sketchSize).toAggregateExpression())
        .as("c"), count(lit(1)).as("total"))
      .localCheckpoint(true)
    val hint = (d: DataFrame) => if (broadcastCandidates) broadcast(d) else d
    val cands = sk.select(col("grp"), explode(col("c")).as("w"))
    v.join(hint(cands), Seq("grp", "w"))
      .groupBy("grp", "w").agg(count(lit(1)).as("n"))
      .join(hint(sk.select(col("grp"), col("total"))), Seq("grp"))
      .where(col("n") * 1000000L >= col("total") * minPpm)
      .select(col("grp"), col("w"), col("n"))
  }

  /** Per-group approximate distinct count of a STRING column: hash =
    * mix64(fp64(value)) — the rolling polynomial spreads the chars, the
    * splitmix64 finalizer uniformizes the high bits KMV's order statistic
    * reads. Both stages replay exactly in SQL (the q21/q30 kernels).
    * Collisions fold two strings into one hash on BOTH engines — the
    * estimate is over distinct hashes, identically. */
  def kmvDistinct(df: DataFrame, group: Column, value: Column, k: Int): DataFrame =
    kmvDistinctHashed(df, group, st.mix64(st.fp64(value, Int.MaxValue)), k)
}
