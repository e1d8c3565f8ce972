package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Kernels
import graft.functions.SparkTestSession
import graft.sources.ImageTable

/** Pixel-level perceptual hash (ImageOps.phash64) + image near-dup via the
  * bounded Hamming engine (Dedup.hammingPairs64).
  *
  * Invariance thresholds are pinned against the deterministic synthetic
  * corpus: measured distances are re-encode = 0 bits, JPEG ≤ 1, half-size
  * resize ≤ 2 (asserted with margin). The retrieval test uses a textured
  * deterministic corpus built here — the library's gradient corpus is
  * PERCEPTUALLY self-similar by construction (smooth gradients share DCT
  * sign structure, cross-image Hamming ~2), which is exactly what a
  * perceptual hash should report, but useless for separating planted
  * near-dups from background.
  */
class ImagePhashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Deterministic textured pattern: 8×8 grid of flat cells, intensity from
    * mix64 bits — high-frequency content with ~random DCT sign structure. */
  private def textured(id: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = (y * 8 / h) * 8 + (x * 8 / w)
        val v = (Kernels.mix64(id * 64 + cell) >>> 32).toInt & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  test("phash64 invariance on the synthetic corpus: re-encode exact, jpeg/resize within budget") {
    val rows = ImageTable.synthesize(spark, 60).collect().sortBy(_.image_id)
    rows.foreach { r =>
      val img = ImageTable.decode(r.bytes)
      val h0 = ImageOps.phash64(img)
      assert(ham(h0, ImageOps.phash64(ImageTable.decode(ImageTable.encode(img, "png")))) == 0,
        s"${r.image_id}: lossless re-encode changed the hash")
      assert(ham(h0, ImageOps.phash64(ImageTable.decode(ImageTable.encode(img, "jpeg")))) <= 2,
        s"${r.image_id}: jpeg re-encode moved > 2 bits")
      val nw = math.max(4, img.getWidth / 2); val nh = math.max(4, img.getHeight / 2)
      assert(ham(h0, ImageOps.phash64(ImageTable.decode(ImageTable.resize(r.bytes, "png", nw, nh)))) <= 4,
        s"${r.image_id}: half-size resize moved > 4 bits")
    }
  }

  test("imageNearDup retrieves exactly the planted variants on a textured corpus") {
    val nBase = 40
    // group g: base (textured 64×64) + jpeg re-encode + half-size resize
    val rows = (0 until nBase).flatMap { g =>
      val img = textured(g.toLong, 64, 64)
      val png = ImageTable.encode(img, "png")
      Seq(
        (f"base$g%03d", png),
        (f"jpeg$g%03d", ImageTable.encode(img, "jpeg")),
        (f"half$g%03d", ImageTable.resize(png, "png", 32, 32)))
    }
    val images = rows.toDF("image_id", "bytes")
    val got = ImageOps.imageNearDup(images, maxHamming = 10)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    // brute-force ground truth at the same threshold
    val hs = rows.map { case (id, bytes) => (id, ImageOps.phash64(ImageTable.decode(bytes))) }
    val brute = (for {
      i <- hs.indices; j <- hs.indices if i < j
      if ham(hs(i)._2, hs(j)._2) <= 10
    } yield {
      val (a, b) = (hs(i)._1, hs(j)._1)
      if (a < b) (a, b) else (b, a)
    }).toSet
    assert(got == brute, s"engine=${got.size} brute=${brute.size}")
    // the planted structure: every in-group pair found, no cross-group pairs
    (0 until nBase).foreach { g =>
      assert(got.contains((f"base$g%03d", f"jpeg$g%03d")))
      assert(got.contains((f"base$g%03d", f"half$g%03d")))
      assert(got.contains((f"half$g%03d", f"jpeg$g%03d")))
    }
    assert(got.forall { case (a, b) => a.drop(4) == b.drop(4) }, "cross-group false positives")
    assert(got.size == 3 * nBase)
  }

  test("undecodable image rows are skipped, not fatal") {
    val good = ImageTable.encode(textured(1L, 16, 16), "png")
    val rows = Seq(
      ("ok", good),
      ("garbage", Array[Byte](1, 2, 3, 4, 5)),
      ("truncated", good.take(20)),
      ("empty", Array.empty[Byte]))
    val images = rows.toDF("image_id", "bytes")
    val hashed = ImageOps.phashes(images).select("image_id").as[String].collect().toSet
    assert(hashed == Set("ok"))
    val feats = ImageOps.extractFeatures(images.withColumn("fmt", lit("png")))
      .select("image_id").as[String].collect().toSet
    assert(feats == Set("ok"))
  }

  test("fuzz: hammingPairs64 == brute force on seeded random corpora, maxHamming 1..5") {
    // mixed corpus per round: uniform background + several planted clusters
    // with flip counts straddling the threshold
    for (round <- 0 until 3; maxH <- Seq(1, 3, 5)) {
      val seed = round * 1000L + maxH
      val bg = (0 until 120).map(i => (i.toLong, Kernels.mix64(seed * 7919 + i)))
      val clusters = (0 until 4).flatMap { c =>
        val center = Kernels.mix64(seed * 104729 + c)
        (0 until 6).map { m =>
          var s = center
          val flips = (Kernels.mix64(seed + c * 31 + m) & 7L).toInt // 0..7 bit flips
          var f = 0
          while (f < flips) {
            s ^= 1L << ((Kernels.mix64(seed + c * 131 + m * 17 + f) >>> 58).toInt)
            f += 1
          }
          (1000L + c * 10 + m, s)
        }
      }
      val sigs = bg ++ clusters
      val got = Dedup.hammingPairs64(sigs.toDF("id", "sig"), col("id"), col("sig"),
          maxHamming = maxH)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
      CacheTracker.releaseAll()
      val brute = (for {
        i <- sigs.indices; j <- sigs.indices if i < j
        d = ham(sigs(i)._2, sigs(j)._2) if d <= maxH
      } yield {
        val (a, b) = if (sigs(i)._1 < sigs(j)._1) (sigs(i)._1, sigs(j)._1)
          else (sigs(j)._1, sigs(i)._1)
        (a, b, d.toLong)
      }).toSet
      assert(got == brute, s"seed=$seed maxH=$maxH: engine=${got.size} brute=${brute.size}")
    }
  }

  test("hammingPairs64 == brute force, including through the chunked-bucket path") {
    // planted corpus: 50 uniform sigs + one 12-member cluster within d<=2 of
    // a center; chunkSize=4 forces the cluster's buckets through chunkPairRows
    val center = Kernels.mix64(999L)
    val sigs = (0 until 50).map(i => (i.toLong, Kernels.mix64(i.toLong))) ++
      (0 until 12).map { i =>
        val flip = (1L << (i % 5)) | (if (i % 3 == 0) 1L << 40 else 0L)
        (100L + i, center ^ flip)
      }
    val df = sigs.toDF("id", "sig")
    for (chunk <- Seq(4, 512)) {
      val got = Dedup.hammingPairs64(df, col("id"), col("sig"),
          maxHamming = 3, chunkSize = chunk)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        i <- sigs.indices; j <- sigs.indices if i < j
        d = ham(sigs(i)._2, sigs(j)._2) if d <= 3
      } yield {
        val (a, b) = if (sigs(i)._1 < sigs(j)._1) (sigs(i)._1, sigs(j)._1)
          else (sigs(j)._1, sigs(i)._1)
        (a, b, d.toLong)
      }).toSet
      assert(got == brute, s"chunkSize=$chunk: engine=${got.size} brute=${brute.size}")
      assert(brute.size >= 60, "cluster should produce a dense pair set")
    }
  }

  test("drop path keeps a pair whose FIRST agreeing block's bucket was dropped") {
    // pair (1,2): identical sigs — they agree on ALL four pigeonhole blocks.
    // 200 flood ids share the pair's block-0 value (low 16 bits) but carry
    // unique values in blocks 1-3, so block 0's bucket has 202 members and
    // is dropped at maxBucket=100 while every flood bucket elsewhere is a
    // singleton. The first-agreeing-block fast dedup would assign the pair
    // to the dropped block 0 and lose it — the engine must detect drops and
    // take the groupBy dedup, emitting the pair exactly once via block 1.
    val s = 0x0123456789ABCDEFL
    // blocks 1-3 each get a unique per-id value (and none collides with the
    // pair's values), so every flood bucket outside block 0 is a singleton
    val flood = (0 until 200).map { i =>
      (100L + i, (s & 0xFFFFL) | ((0x1000L + i) << 16) |
        ((i.toLong + 1) << 32) | ((i.toLong + 7) << 48))
    }
    val sigs = Seq((1L, s), (2L, s)) ++ flood
    val out = Dedup.hammingPairs64(sigs.toDF("id", "sig"), col("id"), col("sig"),
        maxHamming = 3, maxBucket = 100)
      .select("id_a", "id_b", "hamming", "n_dropped_buckets")
      .as[(Long, Long, Long, Long)].collect()
    CacheTracker.releaseAll()
    assert(out.count(p => p._1 == 1L && p._2 == 2L) == 1,
      s"pair (1,2) must survive the dropped first block exactly once: ${out.toSeq}")
    assert(out.forall(_._4 == 1L), s"exactly block 0's bucket dropped: ${out.toSeq}")
  }
}
