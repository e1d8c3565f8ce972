package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.st

/** Training-data mixing: deterministic per-key sampling and upsampling.
  * A data recipe assigns each source a weight w ∈ [0, ∞): w ≤ 1 is
  * Bernoulli subsampling, w > 1 emits ⌊w⌋ copies plus one more with
  * probability frac(w). The keep/extra-copy decision is a pure function of
  * the row id — uniform₆₃(id) = mix64(id) >>> 1 compared against the
  * PRECOMPUTED integer threshold ⌊frac(w)·2⁶³⌋ — so the sample is
  * partition-invariant, resumable, identical on re-runs, and exactly
  * replayable in integer SQL (q32). No RNG state, no float comparison at
  * runtime on either engine.
  */
object Mixing {

  /** Integer threshold for the fractional part of a weight: ⌊frac·2⁶³⌋.
    * (The literal rounds to the double 2⁶³ — 2⁶³−1 is not representable —
    * and the product stays < 2⁶³ because frac ≤ 1−2⁻⁵³, so toLong never
    * saturates. Both engines embed this exact value; do not recompute it
    * with different arithmetic.) */
  def fracThreshold(w: Double): Long = {
    val frac = w - math.floor(w)
    (frac * 9.223372036854775807e18).toLong
  }

  /** Rows of `df` emitted `copies(key, id)` times, with a 0-based `copy`
    * index column for downstream per-copy salting. Keys absent from
    * `weights` are DROPPED — a mixing recipe is an explicit contract.
    * Plan shape: one codegen'd map (CASE over the weight table + mix64) +
    * filter + generate — no shuffle, no driver round-trip. */
  def stratifiedSample(
      df: DataFrame, key: Column, id: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w.isFinite), "weights must be finite and >= 0")
    require(!df.columns.contains("copy") && !df.columns.contains("__copies"),
      "input must not carry a 'copy' or '__copies' column (the output reserves them)")
    // deterministic CASE order (sorted keys) so the plan is stable
    val sortedW = weights.toSeq.sortBy(_._1)
    val whole = sortedW.foldLeft(lit(0L)) { case (acc, (k, w)) =>
      when(key === k, lit(math.floor(w).toLong)).otherwise(acc)
    }
    val th = sortedW.foldLeft(lit(0L)) { case (acc, (k, w)) =>
      when(key === k, lit(fracThreshold(w))).otherwise(acc)
    }
    val u = shiftrightunsigned(st.mix64(id), 1) // uniform in [0, 2⁶³)
    df.withColumn("__copies", whole + when(u < th, 1L).otherwise(0L))
      .filter(col("__copies") >= 1L)
      // sequence(0, n-1) needs n >= 1 here: Spark infers a NEGATIVE step
      // for sequence(0, -1) and would emit phantom copies
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /** Deterministic per-key budget cap: keep rows in mix64-uniform order
    * (a stable pseudo-random order, pure function of id) until the running
    * total of `cost` would exceed the key's budget — the "N chars/tokens
    * per source" half of a data recipe. Keys absent from `budgets` are
    * dropped. One window over (key) — at scale this is a single shuffle on
    * the key, and the kept set is identical across partitionings/re-runs.
    */
  /** Row-level cost guard: a negative cost makes the running sum
    * non-monotone (the kept set stops being a prefix of the uniform order;
    * packBins could emit negative bins) — fail loudly instead. One branch
    * per row, codegen'd. */
  private def checkedCost(cost: Column): Column =
    when(cost < 0, raise_error(
      concat(lit("Mixing: cost must be >= 0, got "), cost.cast("string"))))
      .otherwise(cost)

  def budgetCap(
      df: DataFrame, key: Column, id: Column, cost: Column,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    require(!df.columns.contains("__run"),
      "input must not carry a '__run' column (used internally)")
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (k, b)) =>
      when(key === k, lit(b)).otherwise(acc)
    }
    val u = shiftrightunsigned(st.mix64(id), 1)
    val w = Window.partitionBy(key).orderBy(u.asc, id.asc)
    df.withColumn("__run", sum(checkedCost(cost)).over(w))
      .filter(col("__run") <= budget)
      .drop("__run")
  }

  /** Deterministic shard packing: assign each row to a fixed-capacity bin
    * per key — "pack each source into ~binSize-char training shards". Rows
    * take the stable mix64-uniform order; a row's bin is the bin its START
    * offset falls in (bin = ⌊(run − cost)/binSize⌋, so a row may overflow
    * its bin by less than its own cost — doc-level packing, no splits).
    * One window per key (single shuffle at scale; parallelism is per-key —
    * a single giant key serializes its own packing, shard large sources
    * with [[shardKey]] if that matters). All-integer arithmetic →
    * oracle-replayable (q35). */
  def packBins(
      df: DataFrame, key: Column, id: Column, cost: Column,
      binSize: Long): DataFrame = {
    require(binSize >= 1, "binSize must be >= 1")
    require(!df.columns.contains("bin") && !df.columns.contains("__run"),
      "input must not carry 'bin' or '__run' columns")
    val u = shiftrightunsigned(st.mix64(id), 1)
    val w = Window.partitionBy(key).orderBy(u.asc, id.asc)
    df.withColumn("__run", sum(checkedCost(cost)).over(w))
      .withColumn("bin", Ann.fdiv(col("__run") - cost, lit(binSize)))
      .drop("__run")
  }

  /** Deterministic global training order: `ord` = the row's exact rank in
    * the (mix64-uniform, id) order — the "shuffle the dataset for training"
    * primitive. The order is a pure function of the id SET (not the
    * layout), so it is partition-invariant, resumable, and replayable;
    * `epoch > 0` reshuffles deterministically (u = mix64(mix64(id) XOR
    * epoch) — XOR, not +: ANSI mode throws on long overflow).
    *
    * Scale shape: NO global sort, NO single-partition window. u is uniform
    * in [0, 2⁶³), so its top `shardBits` bits split the order into
    * 2^shardBits equal-width contiguous rank ranges; one tiny per-shard
    * count aggregate prefix-sums into shard offsets on the driver
    * (≤ 2^shardBits longs), and each shard ranks independently under a
    * per-shard window — 2^shardBits parallel sorts of ~n/2^shardBits rows.
    * Two passes over the input (count, rank) — persist `df` first if its
    * lineage is expensive; `ord` is identical for ANY shardBits
    * (spec-pinned). */
  def globalOrder(df: DataFrame, id: Column, shardBits: Int = 6,
      epoch: Long = 0L): DataFrame = {
    require(shardBits >= 0 && shardBits <= 16, "shardBits in [0, 16]")
    require(Seq("__u", "__shard", "__off", "ord").forall(c => !df.columns.contains(c)),
      "input must not carry '__u'/'__shard'/'__off'/'ord' columns")
    val spark = df.sparkSession
    val base = if (epoch == 0L) st.mix64(id) else st.mix64(st.mix64(id).bitwiseXOR(lit(epoch)))
    val u = shiftrightunsigned(base, 1)
    val sharded = df.withColumn("__u", u)
      .withColumn("__shard", shiftrightunsigned(col("__u"), 63 - shardBits))
    val counts = sharded.groupBy("__shard").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val offsets = counts.map { case (s, n) => val o = off; off += n; (s, o) }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__shard", "__off"))
    val w = Window.partitionBy("__shard").orderBy(col("__u").asc, id.asc)
    sharded.join(offDf, "__shard")
      .withColumn("ord", col("__off") + row_number().over(w).cast("long") - 1L)
      .drop("__u", "__shard", "__off")
  }

  /** Composite shard key for giant sources: one dominant key serializes its
    * own window partition in [[budgetCap]]/[[packBins]] (the per-key window
    * is a single task) — the documented skew class. `shard =
    * pmod(mix64(id), nShards)` is a pure function of id, so the composite
    * key is deterministic and partition-invariant; a window over it runs
    * nShards× parallel for that key. Each shard packs/caps independently:
    * the binSize overflow rule holds per shard, total bin waste is at most
    * one partial bin per shard (spec-pinned), and for budget caps pair with
    * [[shardBudgets]]. */
  def shardKey(key: Column, id: Column, nShards: Int): Column = {
    require(nShards >= 1, "nShards must be >= 1")
    concat_ws("#", key, pmod(st.mix64(id), lit(nShards.toLong)).cast("string"))
  }

  /** Per-shard budget map for [[budgetCap]] over [[shardKey]] keys: shard i
    * gets ⌊budget/nShards⌋ plus one extra unit for the first budget mod
    * nShards shards, so the summed cap equals the original budget EXACTLY —
    * a plain floor would zero out any key whose budget < nShards (silently
    * dropping every row of that key) and lose up to nShards−1 units
    * otherwise. The uniform id-shard makes per-shard spend near-equal, so
    * per-shard cap error stays within one unit in practice. */
  def shardBudgets(budgets: Map[String, Long], nShards: Int): Map[String, Long] = {
    require(nShards >= 1, "nShards must be >= 1")
    for { (k, b) <- budgets; i <- 0 until nShards } yield {
      require(b >= 0, s"budget for '$k' must be >= 0: $b")
      s"$k#$i" -> (b / nShards + (if (i < (b % nShards)) 1L else 0L))
    }
  }

  /** Deterministic holdout split: (train, heldout) by the same id-uniform —
    * a row lands in the holdout iff uniform₆₃(id) < ⌊testFrac·2⁶³⌋. The two
    * frames partition the input exactly and are stable across re-runs, so
    * train/eval contamination cannot drift between pipeline stages. */
  def holdoutSplit(df: DataFrame, id: Column, testFrac: Double): (DataFrame, DataFrame) = {
    require(testFrac >= 0 && testFrac < 1, "testFrac in [0, 1)")
    val th = fracThreshold(testFrac)
    val inTest = shiftrightunsigned(st.mix64(id), 1) < lit(th)
    (df.filter(!inTest), df.filter(inTest))
  }
}
