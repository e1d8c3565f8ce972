package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off q27 phase probe: times each snapshot commit of the resumable
  * pipeline. runMain graft.tools.SnapProbe [sfDir] [cpus]
  */
object SnapProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.{EntryQueries => EQ}
    import graft.operators.SpatialOps
    import graft.functions.st
    import graft.sources.{ImageTable, SnapshotTable}
    EQ.ensureRegistered(spark)
    def time[T](name: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[snapprobe] $name: ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    val polys = EQ.districtPolygons(spark)
    val images = ImageTable.metaDf(spark, 0, 5000)
      .withColumn("lon", SpatialOps.phashLon(col("phash")))
      .withColumn("lat", SpatialOps.phashLat(col("phash")))
    val joined = SpatialOps.pipJoin(
      images.select("image_id", "phash", "lon", "lat"),
      col("lon"), col("lat"), polys, "geom", res = 7)
      .withColumn("tile", st.cellId(col("lon"), col("lat"), 7))
      .select("tile", "image_id", "district", "phash")
    time("joined.count")(joined.count())
    val tmp0 = java.nio.file.Files.createTempDirectory("snapprobe0").toString
    time("raw partitionBy write FIRST")(joined
      .withColumn("__zblock", shiftrightunsigned(col("tile").bitwiseAND(lit(0x03FFFFFFFFFFFFFFL)), 11))
      .repartition(8, col("__zblock"))
      .sortWithinPartitions("__zblock", "tile", "image_id", "district")
      .write.mode("overwrite").partitionBy("__zblock").parquet(tmp0 + "/d"))
    val tmp1 = java.nio.file.Files.createTempDirectory("snapprobe1").toString
    time("commit zOrder")(SnapshotTable.commitBatch(joined, tmp1, "b0", "tile",
      Seq("image_id", "district"), numPartitions = 8, zOrderRes = 7))
    val tmp1b = java.nio.file.Files.createTempDirectory("snapprobe1b").toString
    time("commit zOrder again")(SnapshotTable.commitBatch(joined, tmp1b, "b0", "tile",
      Seq("image_id", "district"), numPartitions = 8, zOrderRes = 7))
    val tmp2 = java.nio.file.Files.createTempDirectory("snapprobe2").toString
    time("commit hash")(SnapshotTable.commitBatch(joined, tmp2, "b0", "tile",
      Seq("image_id", "district"), numPartitions = 8))
    val tmp3 = java.nio.file.Files.createTempDirectory("snapprobe3").toString
    time("raw partitionBy write")(joined
      .withColumn("__zblock", shiftrightunsigned(col("tile").bitwiseAND(lit(0x03FFFFFFFFFFFFFFL)), 11))
      .repartition(8, col("__zblock"))
      .sortWithinPartitions("__zblock", "tile", "image_id", "district")
      .write.mode("overwrite").partitionBy("__zblock").parquet(tmp3 + "/d"))
    val tmp4 = java.nio.file.Files.createTempDirectory("snapprobe4").toString
    time("raw plain write")(joined
      .repartition(8, col("tile"))
      .sortWithinPartitions("tile", "image_id", "district")
      .write.mode("overwrite").parquet(tmp4 + "/d"))
    spark.stop()
  }
}
