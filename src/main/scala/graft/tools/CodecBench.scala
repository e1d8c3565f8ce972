package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{codecs, st}

/** Codec throughput vs the reference's single-node conversion rate
  * (scripts/ref_oracle.js op=bench_kml measures the actual reference under
  * node on the same generated documents).
  * runMain graft.tools.CodecBench <cpus> <n>
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    codecs.registerAll(spark)

    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val docs = spark.range(0, n, 1, 128)
        .withColumn("lon", ((col("id") * 7919L) % 360000L).cast("double") / 1000.0 - 180.0)
        .withColumn("lat", ((col("id") * 104729L) % 170000L).cast("double") / 1000.0 - 85.0)
        .withColumn("kml", concat(
          lit("<kml><Document><Placemark><name>p"), col("id"),
          lit("</name><Point><coordinates>"), col("lon").cast("string"),
          lit(","), col("lat").cast("string"),
          lit("</coordinates></Point></Placemark></Document></kml>")))
      val out = docs
        .select(length(codecs.kmlToGeojson(col("kml"))).as("len"))
        .agg(sum("len")).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, out)
    }
    run()
    val results = (1 to 3).map(_ => run())
    val (secs, chars) = results.minBy(_._1)
    println(f"""{"bench":"codec_kml","cpus":$cpus,"n":$n,"seconds":$secs%.3f,"docs_per_sec":${n / secs}%.0f,"chars":$chars}""")
    spark.stop()
  }
}
