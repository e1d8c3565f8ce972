package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.{st, KMinDistinct}

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

  /** Per-group approximate distinct count of a STRING column: hash =
    * mix64(fp64(value)) — the rolling polynomial spreads the chars, the
    * splitmix64 finalizer uniformizes the high bits KMV's order statistic
    * reads. Both stages replay exactly in SQL (the q21/q30 kernels).
    * Collisions fold two strings into one hash on BOTH engines — the
    * estimate is over distinct hashes, identically. */
  def kmvDistinct(df: DataFrame, group: Column, value: Column, k: Int): DataFrame =
    kmvDistinctHashed(df, group, st.mix64(st.fp64(value, Int.MaxValue)), k)
}
