package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), with builtins only (zip_with / aggregate are codegen'd).
  *
  * Scale path: brute-force cosine is the exact baseline (a broadcast of the
  * query set + one map-side pass over the corpus — no shuffle); the
  * IVF-style variant prunes the corpus to the query's coarse cluster(s)
  * before scoring, and hyperplane-LSH bucketing powers near-dup joins.
  */
object Ann {

  /** Exact dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — single-pass kernel expression. */
  def cosine(a: Column, b: Column): Column = graft.functions.st.cosineSim(a, b)

  /** Integer-quantized dot product: q(x) = round(x·1000) as long, then exact
    * integer Σ q(a)·q(b). Associative & overflow-safe for |x| ≤ ~2000 dims —
    * bit-identical across engines and partitionings (the oracle-checkable
    * similarity; float sums are order-dependent, integer sums are not).
    */
  def quantizedDot(a: Column, b: Column, scale: Int = 1000): Column = {
    def q(c: Column): Column = transform(c, x => round(x.cast("double") * scale).cast("long"))
    aggregate(zip_with(q(a), q(b), (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  }

  /** Brute-force top-k by quantized dot product (deterministic; ties broken
    * by id). Query vectors broadcast; corpus scanned once, no shuffle except
    * the final per-query top-k. */
  def bruteTopK(
      corpus: DataFrame, id: Column, emb: Column,
      queries: DataFrame, qId: Column, qEmb: Column,
      k: Int): DataFrame = {
    val c = corpus.select(id.as("id"), emb.as("emb"))
    val q = queries.select(qId.as("q_id"), qEmb.as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("id"))
    c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("q_id"))
      .withColumn("score", quantizedDot(col("emb"), col("q_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "id", "score", "rank")
  }

  /** Deterministic random-hyperplane signature: bit i = sign(v · h_i), where
    * h_ij is derived from mix64(i·100003+j) — seeded, no RNG state. Single-
    * pass kernel expression (the per-plane builtin formulation rebuilt the
    * hyperplane array per row per plane). */
  def hyperplaneSig(emb: Column, planes: Int): Column =
    graft.functions.st.hyperplaneSig(emb, planes)

  /** IVF-style ANN: corpus pre-assigned to `nBuckets` coarse buckets by
    * hyperplane-sig prefix; each query scores only its own bucket. Recall
    * grows with `probes` (multi-probe = flip low bits). Exact within bucket.
    */
  def ivfTopK(
      corpus: DataFrame, id: Column, emb: Column,
      queries: DataFrame, qId: Column, qEmb: Column,
      k: Int, planes: Int = 4, probes: Int = 5): DataFrame = {
    val c = corpus.select(id.as("id"), emb.as("emb"), hyperplaneSig(emb, planes).as("bucket"))
    // multi-probe = the exact bucket plus single-bit flips (hamming-1 shell)
    val masks = (0L +: (0 until math.min(probes - 1, planes)).map(b => 1L << b)).distinct
    val probeArr = array(masks.map(lit): _*)
    val q = queries.select(qId.as("q_id"), qEmb.as("q_emb"),
        explode(transform(probeArr, p => hyperplaneSig(qEmb, planes).bitwiseXOR(p))).as("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("id"))
    c.join(broadcast(q), "bucket")
      .filter(col("id") =!= col("q_id"))
      .withColumn("score", quantizedDot(col("emb"), col("q_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "id", "score", "rank")
  }
}
