package graft.sources

import java.nio.file.{Files, Paths, Path}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Json, JValue, JObj, JArr, JStr, JNum}

/** Minimal Iceberg-style snapshot/manifest table layout on Parquet
  * (SURVEY.md §7.1 — no Iceberg jar ships offline; swapping in real Iceberg
  * later is a sink change only):
  *
  * {{{
  *   table/
  *     data/b<batchId>/part-*.parquet      (z-order bucketed, sorted)
  *     snapshots/v<k>.json                 (full manifest at version k)
  *     snapshots/LATEST                    (current version number)
  * }}}
  *
  * Each snapshot records, per committed batch: the data files, row count,
  * an order-independent content fingerprint (XOR of per-row xxhash64 over
  * all columns — identical at any parallelism), and per-bucket lineage
  * metrics (rows + fingerprint per z-order bucket). This gives:
  *
  *  - exact resume: a re-run skips batches already in the manifest and
  *    produces a byte-identical table (checkpoint/resume mandate)
  *  - per-partition lineage + metrics for the scaling/byte-match gates
  *  - snapshot isolation: readers list files from a manifest version, never
  *    the directory (orphan files from killed writers are invisible)
  */
object SnapshotTable {

  final case class BucketStat(bucket: Long, rows: Long, fingerprint: Long)
  final case class Batch(batchId: String, files: Vector[String], rows: Long,
      fingerprint: Long, buckets: Vector[BucketStat])
  final case class Snapshot(version: Int, batches: Vector[Batch]) {
    def batchIds: Set[String] = batches.map(_.batchId).toSet
  }

  // ---------------- manifest io ----------------

  private def snapDir(table: String): Path = Paths.get(table, "snapshots")

  def currentVersion(table: String): Int = {
    val latest = snapDir(table).resolve("LATEST")
    if (Files.exists(latest)) Files.readString(latest).trim.toInt else 0
  }

  def currentSnapshot(table: String): Snapshot = {
    val v = currentVersion(table)
    if (v == 0) Snapshot(0, Vector.empty)
    else parseSnapshot(Files.readString(snapDir(table).resolve(s"v$v.json")))
  }

  private def renderSnapshot(s: Snapshot): String =
    JObj.of(
      "version" -> JNum(s.version),
      "batches" -> JArr(s.batches.map { b =>
        JObj.of(
          "batchId" -> JStr(b.batchId),
          "files" -> JArr(b.files.map(JStr(_))),
          "rows" -> JNum(b.rows),
          "fingerprint" -> JStr(java.lang.Long.toHexString(b.fingerprint)),
          "buckets" -> JArr(b.buckets.map { st =>
            JObj.of("bucket" -> JNum(st.bucket), "rows" -> JNum(st.rows),
              "fingerprint" -> JStr(java.lang.Long.toHexString(st.fingerprint)))
          }))
      })).render

  private def parseSnapshot(s: String): Snapshot = {
    val o = Json.parse(s).asInstanceOf[JObj]
    def num(v: JValue): Double = v.asInstanceOf[JNum].v
    def str(v: JValue): String = v.asInstanceOf[JStr].v
    val batches = o("batches").asInstanceOf[JArr].items.map { bv =>
      val b = bv.asInstanceOf[JObj]
      Batch(
        str(b("batchId")),
        b("files").asInstanceOf[JArr].items.map(str),
        num(b("rows")).toLong,
        java.lang.Long.parseUnsignedLong(str(b("fingerprint")), 16),
        b("buckets").asInstanceOf[JArr].items.map { sv =>
          val st = sv.asInstanceOf[JObj]
          BucketStat(num(st("bucket")).toLong, num(st("rows")).toLong,
            java.lang.Long.parseUnsignedLong(str(st("fingerprint")), 16))
        })
    }
    Snapshot(num(o("version")).toInt, batches)
  }

  // ---------------- write path ----------------

  /** Order-independent row fingerprint: xxhash64 over all columns. */
  private def rowHash(df: DataFrame) = xxhash64(df.columns.map(col): _*)

  /** Commit one batch: skip if `batchId` is already in the manifest (exact
    * resume). Data is z-order-range partitioned on `bucketCol` into
    * `numPartitions` files and sorted within partitions by
    * (`bucketCol`, `sortCols`) — byte-stable at any parallelism.
    * Returns true if the batch was written, false if skipped.
    */
  def commitBatch(df: DataFrame, table: String, batchId: String,
      bucketCol: String, sortCols: Seq[String], numPartitions: Int = 16): Boolean = {
    val snap = currentSnapshot(table)
    if (snap.batchIds.contains(batchId)) return false

    val batchDir = Paths.get(table, "data", s"b$batchId")
    // clean leftovers from a killed writer (invisible to readers anyway)
    if (Files.exists(batchDir)) deleteRec(batchDir)

    // hash repartition on the bucket, NOT repartitionByRange: range
    // boundaries are sampled from the input and vary with its partitioning,
    // which would break file-level byte-stability across parallelism. Hash
    // placement is a pure function of the bucket value; each z-order bucket
    // stays whole within one file.
    val sorted = df
      .repartition(numPartitions, col(bucketCol))
      .sortWithinPartitions((bucketCol +: sortCols).map(col): _*)
    sorted.write.mode("overwrite").parquet(batchDir.toString)

    // lineage metrics from what was actually written
    val spark = df.sparkSession
    val written = spark.read.parquet(batchDir.toString)
    val stats = written
      .groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("rows"),
        // XOR-fold of row hashes: associative+commutative → deterministic
        expr(s"bit_xor(${fpExpr(written)})").as("fp"))
    val bucketStats = stats.collect().map { r =>
      BucketStat(r.getLong(0), r.getLong(1), r.getLong(2))
    }.sortBy(_.bucket).toVector

    val files = Files.list(batchDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.endsWith(".parquet"))
      .toVector.sorted
    val totalRows = bucketStats.map(_.rows).sum
    val totalFp = bucketStats.map(_.fingerprint).foldLeft(0L)(_ ^ _)

    val next = Snapshot(snap.version + 1,
      snap.batches :+ Batch(batchId, files, totalRows, totalFp, bucketStats))
    Files.createDirectories(snapDir(table))
    Files.writeString(snapDir(table).resolve(s"v${next.version}.json"), renderSnapshot(next))
    Files.writeString(snapDir(table).resolve("LATEST"), next.version.toString)
    true
  }

  private def fpExpr(df: DataFrame): String =
    s"xxhash64(${df.columns.mkString(", ")})"

  // ---------------- read path ----------------

  /** Read the table at its current snapshot (only manifest-listed files). */
  def read(spark: SparkSession, table: String): DataFrame = {
    val snap = currentSnapshot(table)
    val paths = snap.batches.flatMap(b =>
      b.files.map(f => Paths.get(table, "data", s"b${b.batchId}", f).toString))
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }

  /** Lineage metrics of the current snapshot as a DataFrame. */
  def lineage(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    currentSnapshot(table).batches.flatMap { b =>
      b.buckets.map(st => (b.batchId, st.bucket, st.rows, st.fingerprint))
    }.toDF("batch_id", "bucket", "rows", "fingerprint")
  }

  /** Whole-table fingerprint (order-independent). */
  def tableFingerprint(table: String): (Long, Long) = {
    val snap = currentSnapshot(table)
    (snap.batches.map(_.rows).sum, snap.batches.map(_.fingerprint).foldLeft(0L)(_ ^ _))
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(deleteRec)
    Files.deleteIfExists(p)
  }
}
