package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ImageTable

/** Batched multimodal operators over the binary image column — the Scala
  * analog of `mapInPandas` plumbing (SURVEY §2.8 F17 / builder mandate):
  * partition-at-a-time iterator processing so per-batch state (decoder
  * instances, scratch buffers) is reused across rows instead of per-row UDF
  * setup. Decode/resize are REAL (ImageIO, JDK-builtin); video
  * frame-sampling remains the documented stub.
  */
object ImageOps {

  final case class ImageFeatures(
      image_id: String, w: Int, h: Int, fmt: String,
      mean_r: Double, mean_g: Double, mean_b: Double,
      brightness: Double, aspect: Double)

  /** Decode with the malformed-input policy of the codecs: undecodable
    * bytes yield null and the row is SKIPPED by the batch operators — a
    * 100-TB corpus always contains corrupt rows and one must not kill the
    * job. Input-driven failures are: unrecognized format (ImageIO's null),
    * truncated/corrupt stream (IIOException ⊂ IOException), and the JDK
    * JPEG reader's known RuntimeExceptions on broken/CMYK ICC profiles
    * (CMMException, IllegalArgumentException — JDK-8041125 family).
    * Internal bugs (NPE etc.) stay loud. */
  private def tryDecode(dec: ImageTable.ReusableDecoder,
      bytes: Array[Byte]): java.awt.image.BufferedImage =
    try dec.decode(bytes) catch {
      case _: java.io.IOException => null
      case _: java.awt.color.CMMException => null
      case _: IllegalArgumentException => null
    }

  /** Decode + feature-extract, one partition at a time (batch shape:
    * Iterator[Row] → Iterator[ImageFeatures]; decoder state amortized).
    * Undecodable rows are skipped. */
  def extractFeatures(images: DataFrame): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        val dec = new ImageTable.ReusableDecoder
        it.flatMap { case (id, bytes, fmt) =>
          val img = tryDecode(dec, bytes)
          if (img == null) None else Some {
          val w = img.getWidth; val h = img.getHeight
          var r = 0L; var g = 0L; var b = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          val mr = r / n; val mg = g / n; val mb = b / n
          ImageFeatures(id, w, h, fmt, mr, mg, mb,
            0.299 * mr + 0.587 * mg + 0.114 * mb, w.toDouble / h)
          }
        }
      }
  }

  /** 64-bit DCT perceptual hash of a decoded image (the classic pHash
    * construction): luminance sampled to a 32×32 grid, 2-D DCT-II, keep the
    * low-frequency 8×8 block, threshold each coefficient against the mean
    * of the 63 non-DC coefficients. Robust to re-encoding and resizing
    * (pinned in ImagePhashSpec: lossless round-trip is hash-identical,
    * JPEG / half-size variants land within a small Hamming distance while
    * unrelated images are ~32 bits apart), so near-duplicate detection is
    * a Hamming-ball query — fed to [[graft.operators.Dedup.hammingPairs64]]
    * below. Deterministic: fixed sampling grid, no RNG.
    */
  // cos((2x+1)·u·π/2N) for the 32-point DCT at the 8 kept frequencies —
  // precomputed: the trig calls otherwise dominate the whole hash (~4× the
  // decode cost; with the table the DCT is ~10k multiply-adds)
  private val DctN = 32
  private val DctK = 8
  private val dctCos: Array[Double] = {
    val t = new Array[Double](DctN * DctK)
    var x = 0
    while (x < DctN) {
      var u = 0
      while (u < DctK) {
        t(x * DctK + u) = math.cos((2 * x + 1) * u * math.Pi / (2.0 * DctN))
        u += 1
      }
      x += 1
    }
    t
  }

  def phash64(img: java.awt.image.BufferedImage): Long = {
    val N = DctN
    val w = img.getWidth; val h = img.getHeight
    // nearest-neighbor sample onto the fixed N×N grid (works for both the
    // 8-px and 64-px corpus sizes; deterministic integer source indexing)
    val lum = new Array[Double](N * N)
    var dy = 0
    while (dy < N) {
      val sy = math.min(h - 1, dy * h / N)
      var dx = 0
      while (dx < N) {
        val sx = math.min(w - 1, dx * w / N)
        val p = img.getRGB(sx, sy)
        lum(dy * N + dx) =
          0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
        dx += 1
      }
      dy += 1
    }
    // separable 2-D DCT-II, low 8×8 block only: first transform rows (8
    // output frequencies per row), then columns — O(N²·8·2) ≈ 16k mults
    val K = DctK
    val rowT = new Array[Double](N * K) // rowT(y*K + u) = Σ_x lum(y,x)·cos((2x+1)uπ/2N)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < K) {
        var s = 0.0; var x = 0
        while (x < N) {
          s += lum(y * N + x) * dctCos(x * K + u)
          x += 1
        }
        rowT(y * K + u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](K * K)
    var v = 0
    while (v < K) {
      var u = 0
      while (u < K) {
        var s = 0.0; var yy = 0
        while (yy < N) {
          s += rowT(yy * K + u) * dctCos(yy * K + v)
          yy += 1
        }
        coef(v * K + u) = s
        u += 1
      }
      v += 1
    }
    var mean = 0.0
    var i = 1
    while (i < K * K) { mean += coef(i); i += 1 }
    mean /= (K * K - 1)
    // classic pHash: the DC coefficient (i=0) is excluded — it is almost
    // always above the AC mean, so including it burns a near-constant bit.
    // Bit 0 stays 0; the hash carries 63 discriminating bits.
    var hash = 0L
    i = 1
    while (i < K * K) {
      if (coef(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Decode + perceptual-hash, one partition at a time → (image_id, phash).
    * Undecodable rows are skipped. */
  def phashes(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions { it =>
        val dec = new ImageTable.ReusableDecoder
        it.flatMap { case (id, bytes) =>
          val img = tryDecode(dec, bytes)
          if (img == null) None else Some((id, phash64(img)))
        }
      }.toDF("image_id", "phash")
  }

  /** Image near-duplicate pairs: pixel-level perceptual hash + the bounded
    * pigeonhole Hamming engine. One decode pass, then everything is the
    * text-SimHash machinery (count-first bucket caps, chunked in-bucket pair
    * generation) — the 100-TB guardrails come for free. Returns
    * (id_a, id_b, hamming, n_dropped_buckets), id_a < id_b.
    */
  def imageNearDup(images: DataFrame, maxHamming: Int = 10,
      maxBucket: Int = 65536): DataFrame = {
    import org.apache.spark.sql.functions.col
    Dedup.hammingPairs64(phashes(images), col("image_id"), col("phash"), maxHamming, maxBucket)
  }

  /** Batched thumbnailing (real resize; per-partition iterator shape). */
  def thumbnails(images: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        val dec = new ImageTable.ReusableDecoder
        it.flatMap { case (id, bytes, fmt) =>
          val img = tryDecode(dec, bytes)
          if (img == null) None
          else Some((id, ImageTable.resizeImg(img, fmt, tw, th), fmt))
        }
      }.toDF("image_id", "thumb", "fmt")
  }
}
