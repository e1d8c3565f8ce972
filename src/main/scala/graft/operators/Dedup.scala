package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard verification. All deterministic (seeded hash
  * families via splitmix64; no RNG at runtime) and shuffle-lean:
  * band-bucketing turns all-pairs similarity into equi-joins.
  */
object Dedup {

  /** Exact dedup on a content column: keeps the first row (min of `keep`)
    * per distinct content hash. Map-side partial aggregation; one shuffle. */
  def exact(df: DataFrame, content: Column, keep: Column): DataFrame = {
    df.withColumn("__h", md5(content.cast("binary")))
      .groupBy(col("__h"))
      .agg(min(keep).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("__h")
  }

  /** Character shingles of length n → array column (lowercased). */
  def shingles(text: Column, n: Int): Column = {
    // sliding n-grams via sequence + substring: codegen'd builtins only
    val t = lower(text)
    filter(
      transform(
        sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
        i => t.substr(i, lit(n))),
      s => length(s) === n)
  }

  /** MinHash signature (`perms` values) over character shingles — one pass
    * via the MinHashSig kernel expression (the declarative per-permutation
    * formulation re-inlines the shingle subtree `perms` times under
    * CollapseProject and is ~100× slower at scale). */
  def minhash(text: Column, shingleLen: Int, perms: Int): Column =
    graft.functions.st.minhashSig(text, shingleLen, perms)

  /** MinHash LSH candidate pairs: signatures banded `bands`×`rowsPerBand`;
    * equal band-hash ⇒ candidate. Returns (id_a, id_b, n_bands_matched)
    * with id_a < id_b. One shuffle on band hash; no all-pairs compare.
    */
  def minhashCandidates(
      df: DataFrame, id: Column, text: Column,
      shingleLen: Int = 4, bands: Int = 8, rowsPerBand: Int = 4,
      minBands: Int = 2, minSigFrac: Double = 0.35): DataFrame = {
    // the signature frame feeds the self-join twice plus the two estimate
    // joins — cache it or the per-doc MinHash runs 4x
    val sig = df.select(id.as("id"), minhash(text, shingleLen, bands * rowsPerBand).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sig.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64(concat_ws(",", (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
      }: _*)).as(Seq("band", "bh")))
    // bucket-and-pair instead of a self-join: one shuffle on (band, bh),
    // ids collected per bucket (sorted for determinism), pairs exploded
    // in-bucket. Same output as the equi self-join, half the shuffles, and
    // the quadratic blowup of a hot band-hash stays inside one task where
    // it is visible/cappable rather than amplified through a join.
    val buckets = banded.groupBy("band", "bh")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairs = buckets
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_bands_matched"))
      // pass 1: require >= minBands matching bands (cuts the false-positive
      // tail an order of magnitude on overlapping corpora)
      .filter(col("n_bands_matched") >= minBands)
    // pass 2: cheap jaccard estimate from full signatures (32 comparisons)
    // before the expensive exact shingle-set verification
    val perms = bands * rowsPerBand
    pairs
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("sig_frac",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v))
          .cast("double") / perms.toDouble)
      .filter(col("sig_frac") >= minSigFrac)
      .select("id_a", "id_b", "n_bands_matched", "sig_frac")
  }

  /** Exact n-gram Jaccard for candidate pairs (verification pass after LSH):
    * |A∩B| / |A∪B| over distinct hashed shingle sets — sorted long arrays +
    * merge intersection kernel (string-array intersect/union was the q21
    * bottleneck: ~100× slower). */
  def jaccardVerify(
      candidates: DataFrame, // (id_a, id_b, ...)
      docs: DataFrame, id: Column, text: Column,
      shingleLen: Int = 4, minJaccard: Double = 0.7): DataFrame = {
    import graft.functions.st
    val sh = docs.select(id.as("__id"), st.shingleHashes(text, shingleLen).as("__sh"))
    candidates
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .withColumn("jaccard", st.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .drop("sh_a", "sh_b")
  }

  /** 64-bit SimHash over whitespace tokens — single-pass kernel expression
    * (a 64-aggregate builtin formulation re-scans the token array per bit). */
  def simhash(text: Column): Column = graft.functions.st.simhash64(text)

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: 4 bands of 16 bits; equal band ⇒ candidate;
    * verified by hamming ≤ maxHamming. */
  def simhashPairs(df: DataFrame, id: Column, text: Column, maxHamming: Int = 8): DataFrame = {
    val sigs = df.select(id.as("id"), simhash(text).as("sig"))
    val banded = sigs.select(col("id"), col("sig"), posexplode(
      array((0 until 4).map(b => shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(first(hamming(col("sig_a"), col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-duplicates via deterministic random-hyperplane LSH
    * bucketing + in-bucket exact cosine ≥ threshold. */
  def embeddingNearDup(
      df: DataFrame, id: Column, emb: Column,
      planes: Int = 16, minCosine: Double = 0.95): DataFrame = {
    val sigExpr = Ann.hyperplaneSig(emb, planes)
    val sigs = df.select(id.as("id"), emb.as("emb"), sigExpr.as("bucket"))
    val a = sigs.select(col("bucket"), col("id").as("id_a"), col("emb").as("emb_a"))
    val b = sigs.select(col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Ann.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }
}
