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

  /** MinHash signature (`perms` values) over a shingle array. Hash family:
    * h_i(x) = mix64(xxhash64(x) + i·GOLDEN). Returns array<long>. */
  def minhash(shingleArr: Column, perms: Int): Column =
    array((0 until perms).map { i =>
      array_min(transform(shingleArr, s =>
        graft.functions.st.mix64(xxhash64(s, lit(i)))))
    }: _*)

  /** MinHash LSH candidate pairs: signatures banded `bands`×`rowsPerBand`;
    * equal band-hash ⇒ candidate. Returns (id_a, id_b, n_bands_matched)
    * with id_a < id_b. One shuffle on band hash; no all-pairs compare.
    */
  def minhashCandidates(
      df: DataFrame, id: Column, text: Column,
      shingleLen: Int = 4, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val sig = df.select(id.as("id"), minhash(shingles(text, shingleLen), bands * rowsPerBand).as("sig"))
    val banded = sig.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64(concat_ws(",", (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
      }: _*)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_bands_matched"))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs (verification pass
    * after LSH): |A∩B| / |A∪B| over distinct shingles. */
  def jaccardVerify(
      candidates: DataFrame, // (id_a, id_b, ...)
      docs: DataFrame, id: Column, text: Column,
      shingleLen: Int = 4, minJaccard: Double = 0.7): DataFrame = {
    val sh = docs.select(id.as("__id"), array_distinct(shingles(text, shingleLen)).as("__sh"))
    candidates
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .drop("sh_a", "sh_b", "inter", "uni")
  }

  /** 64-bit SimHash over whitespace tokens: sign-sum of per-token hashes,
    * built with bit arithmetic on longs (codegen'd; no UDF). */
  def simhash(text: Column): Column = {
    val tokens = split(lower(text), "\\s+")
    val hashes = transform(tokens, t => xxhash64(t))
    // for each bit b: if sum over tokens of (bit set ? 1 : -1) > 0 => set bit
    val bitCols = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftrightunsigned(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

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
