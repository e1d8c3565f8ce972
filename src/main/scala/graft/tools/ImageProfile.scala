package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.ImageOps
import graft.sources.ImageTable

/** Image-pipeline throughput: decode + perceptual-hash over the binary
  * column, single-thread and through Spark mapPartitions batching.
  * Backs the BENCH/BASELINE.md image-axis numbers.
  *
  * runMain graft.tools.ImageProfile [n] [cpus]
  */
object ImageProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val cpus = if (args.length > 1) args(1).toInt else 32
    val sparkOnly = args.length > 2 && args(2) == "spark"

    // single-thread: decode + phash64 over pre-synthesized bytes
    val rows = if (sparkOnly) Array.empty[graft.sources.ImageTable.ImageRow]
      else (0 until n).map(i => ImageTable.rowFor(i.toLong)).toArray
    def time1(name: String, reps: Int)(f: => Long): Unit = {
      var r = f // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => r = f)
      val s = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[img] $name: $s%.3f s (${n / s}%.0f imgs/s) [$r]")
    }
    if (!sparkOnly) {
      time1("decode only", 3) {
        var s = 0L; rows.foreach(r => s += ImageTable.decode(r.bytes).getWidth); s
      }
      time1("decode + phash64", 3) {
        var s = 0L; rows.foreach(r => s += ImageOps.phash64(ImageTable.decode(r.bytes))); s
      }
      time1("decode + feature-extract (mean RGB)", 3) {
        var s = 0L
        rows.foreach { r =>
          val img = ImageTable.decode(r.bytes)
          var acc = 0L; var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { acc += img.getRGB(x, y) & 0xFF; x += 1 }
            y += 1
          }
          s += acc
        }
        s
      }
    }

    // Spark path: synthesize → phashes (mapPartitions batch shape)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val images = ImageTable.synthesize(spark, n.toLong, parts = cpus * 2).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    images.count() // materialize outside timing
    import org.apache.spark.sql.functions.{sum, col, lit}
    // mask before summing: full-range 64-bit hashes overflow ANSI sum
    def sumMasked() = ImageOps.phashes(images)
      .agg(sum(col("phash").bitwiseAND(lit(0xFFFFL)))).head().getLong(0)
    var r0 = sumMasked() // warmup
    val t0 = System.nanoTime()
    val reps = 3
    (1 to reps).foreach(_ => r0 = sumMasked())
    val s = (System.nanoTime() - t0) / 1e9 / reps
    println(f"[img] spark local[$cpus] decode+phash: $s%.3f s (${n / s}%.0f imgs/s) [$r0]")
    spark.stop()
  }
}
