package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Kernels
import graft.functions.SparkTestSession

/** Pins [[TextOps.repetitionStats]] (Gopher-style duplicate-n-gram quality
  * signal) and [[TextOps.winnowFingerprints]] (Schleimer et al. winnowing)
  * against hand cases and an independent plain-Scala replay.
  */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic synthetic corpus: doc i = len(i) tokens from a 23-word
    * vocabulary (heavy natural repetition), with some docs too short to
    * fill a winnow window. */
  private def corpus(n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = 3 + (i * 17) % 40 // 3..42 tokens
      val words = (0 until len).map(j => s"w${(i * 7 + j * j * 13) % 23}")
      (i.toLong, words.mkString(" "))
    }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("repetitionStats hand case: counts, top gram, dup basis points") {
    val df = docsDf(Seq((1L, "a b a b c"), (2L, "x y"), (3L, "z")))
    val got = TextOps.repetitionStats(df, col("doc_id"), col("text"), n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // doc 1 bigrams: "a b","b a","a b","b c" → 4 total, 3 distinct, 1 dup, top 2
    assert(got(1L) == ((4L, 3L, 1L, 2L, 2500L)))
    // doc 2: one bigram, no dup
    assert(got(2L) == ((1L, 1L, 0L, 1L, 0L)))
    // doc 3: single token < n → no row at all
    assert(!got.contains(3L))
  }

  test("repetitionStats == plain-Scala sliding-count replay on a repetitious corpus") {
    val rows = corpus(60)
    val got = TextOps.repetitionStats(docsDf(rows), col("doc_id"), col("text"), n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val exp = rows.flatMap { case (id, text) =>
      val grams = text.split(" ").filter(_.nonEmpty).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toVector
      if (grams.isEmpty) None
      else {
        val counts = grams.groupBy(identity).map(_._2.size)
        val total = grams.size.toLong; val distinct = counts.size.toLong
        Some(id -> ((total, distinct, total - distinct, counts.max.toLong,
          (total - distinct) * 10000L / total)))
      }
    }.toMap
    assert(got == exp)
    assert(exp.values.exists(_._3 > 0), "corpus should contain duplicated bigrams")
  }

  /** Plain-Scala winnowing replay: k-gram fp64 hashes, min per w-window
    * (full windows only, plus the truncated pos-0 window for short docs),
    * distinct fingerprints with their first gram position. */
  private def bruteWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val grams = text.toLowerCase.split(" ").filter(_.nonEmpty).sliding(k)
      .filter(_.length == k).map(_.mkString(" ")).toVector
    val hs = grams.map(g => Kernels.fp64(g, 65536))
    if (hs.isEmpty) Set.empty
    else {
      val starts = 0 to math.max(hs.length - w, 0)
      starts.map(s => hs.slice(s, math.min(s + w, hs.length)).min).toSet
        .map((h: Long) => (h, hs.indexOf(h).toLong))
    }
  }

  test("winnowFingerprints == plain-Scala replay (incl. short-doc degenerate case)") {
    val rows = corpus(60)
    val got = TextOps.winnowFingerprints(docsDf(rows), col("doc_id"), col("text"),
        k = 3, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    CacheTracker.releaseAll()
    val exp = rows.map { case (id, text) => id -> bruteWinnow(text, 3, 4) }
      .filter(_._2.nonEmpty).toMap
    assert(got == exp)
    // the 3-token docs (one gram) must degenerate to exactly one fingerprint
    val short = rows.filter(_._2.split(" ").length < 6).map(_._1)
    assert(short.nonEmpty && short.forall(id => got(id).size == 1))
  }

  test("quantiles == sorted-list order statistics (exact, incl. tiny groups)") {
    val rows = (0 until 157).map { i =>
      (i.toLong, s"g${i % 7}", ((i * 9973) % 400).toLong)
    }
    val df = rows.toDF("id", "grp", "len")
    val ps = Seq(1, 1000, 5000, 9000, 10000)
    val got = TextOps.quantiles(df, col("grp"), col("len"), col("id"), ps)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exp = rows.groupBy(_._2).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3)
      ps.map(p => (g, p.toLong) -> sorted((p * sorted.length + 9999) / 10000 - 1))
    }
    assert(got == exp)
    // p10000 is the max, p1 the min of each group
    rows.groupBy(_._2).foreach { case (g, rs) =>
      assert(got((g, 10000L)) == rs.map(_._3).max)
      assert(got((g, 1L)) == rs.map(_._3).min)
    }
  }

  /** Sequential reference BPE: same contract as the distributed trainer. */
  private def refBpe(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector :+ "</w>") -> ws.size.toLong
      }
    (1 to k).map { _ =>
      val counts = words.toSeq.flatMap { case (syms, cnt) =>
        syms.zip(syms.tail).map(p => p -> cnt)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      words = words.toSeq.map { case (syms, cnt) =>
        val out = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
        out -> cnt
      }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      (a, b, n)
    }
  }

  test("bpeTrain == sequential reference BPE; bpeSegment applies the merges") {
    val texts = corpus(80).map(_._2) ++ Seq("aaaa aaaa aa", "the the the then")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val k = 5
    val got = TextOps.bpeTrain(df, col("text"), merges = k)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == refBpe(texts, k))

    // encoder: re-merging each word with the trained list reproduces the
    // reference segmentation, incl. the overlapping-pair word "aaaa"
    val merges = got.map(p => (p._1, p._2)).toSeq
    val seg = df.select(col("doc_id"), TextOps.bpeSegment(col("text"), merges).as("s"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[String]](1).map(_.toVector).toVector)
      .toMap
    val refSeg = (w: String) =>
      merges.foldLeft(w.map(_.toString).toVector :+ "</w>") { case (syms, (a, b)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.toLowerCase.split(" ").filter(_.nonEmpty)
      assert(seg(i.toLong) == words.map(refSeg).toVector, s"doc $i")
    }
    // token count matches the segmentation sizes
    val cnt = df.select(TextOps.bpeTokenCount(col("text"), merges)).collect().map(_.getLong(0)).sum
    assert(cnt == seg.values.map(_.map(_.size).sum).sum)
  }

  test("chunkTokens: boundary conventions (short doc, exact fit, overlap, empty)") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),   // 10 tokens
      (2L, "x y z"),                 // shorter than a chunk
      (3L, "p q r s"),               // exactly one chunk at c=4
      (4L, "   "),                   // whitespace only → no chunks
      (5L, "lone")                   // single token
    ).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(df, col("doc_id"), col("text"), chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    // doc 1: starts 0,3,6,9 (step 3); last chunk is the single token "j"
    assert(got == Set(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 4L, "g h i j"),
      (1L, 3L, 9L, 1L, "j"),
      (2L, 0L, 0L, 3L, "x y z"),
      (3L, 0L, 0L, 4L, "p q r s"),
      (3L, 1L, 3L, 1L, "s"),
      (5L, 0L, 0L, 1L, "lone")))
    // zero overlap partitions the tokens exactly
    val flat = TextOps.chunkTokens(df.where(col("doc_id") === 1), col("doc_id"), col("text"),
        chunkSize = 3, overlap = 0)
      .orderBy("start").collect().map(_.getString(4)).mkString(" ")
    assert(flat == "a b c d e f g h i j")
  }

  test("redactPii/piiScan: placeholder substitution, counts, ordering") {
    val df = Seq(
      (1L, "mail u17@ex3.com x 123-45-6789 ip 10.200.3.255 and u2@a.b.co end 999-99-9999."),
      (2L, "no pii here at all"),
      (3L, "edge 1.2.3.4 777-77-7777 a@b.cc")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScan(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the exact string validated against DuckDB's RE2 during development
    assert(got(1L) == (("mail <EMAIL> x <SSN> ip <IP> and <EMAIL> end <SSN>.", 2L, 2L, 1L)))
    assert(got(2L) == (("no pii here at all", 0L, 0L, 0L)))
    assert(got(3L) == (("edge <IP> <SSN> <EMAIL>", 1L, 1L, 1L)))
  }

  test("unigramSurprisal == plain-Scala floor-log2 replay") {
    val texts = corpus(60).map(_._2) :+ "rareword w0 w0" // one singleton token
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = texts.flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
    val total = toks.size.toLong
    val cnt = toks.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    def sur(w: String): Long = 63L - java.lang.Long.numberOfLeadingZeros(total / cnt(w))
    val want = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.toLowerCase.split(" ").filter(_.nonEmpty)
      val s = ws.map(sur).sum
      (i.toLong, ws.length.toLong, s, s * 10000L / ws.length)
    }.toSet
    val got = TextOps.unigramSurprisal(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // the singleton token carries the corpus-max surprisal
    val rare = got.find(_._1 == 60L).get
    assert(rare._3 >= sur("rareword") && sur("rareword") == 63L - java.lang.Long.numberOfLeadingZeros(total))
  }

  test("winnowing guarantee: docs sharing a >= k+w-1 token run share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens = k+w-1
    val rows = Seq(
      (1L, s"one two $shared three four five six seven"),
      (2L, s"nine ten eleven twelve $shared thirteen"))
    val fps = TextOps.winnowFingerprints(docsDf(rows), col("doc_id"), col("text"),
        k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    CacheTracker.releaseAll()
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }
}
