package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: the continuous-ingest analog of
  * [[graft.operators.Dedup.hammingPairs64]]. Every row's 64-bit signature is
  * split into the same pigeonhole blocks (maxHamming+1 contiguous blocks, so
  * any pair within the distance bound agrees exactly on ≥1 block); state is
  * keyed by (block, blockValue) and holds the bucket's recent (id, sig)
  * entries. A new arrival is compared against its bucket's entries and emits
  * a pair per near-duplicate found.
  *
  * Scale guardrails, mirroring the batch engine:
  *  - state per bucket is bounded TWICE: entries older than the watermark
  *    are evicted (and idle buckets removed entirely via event-time
  *    timeout), and a `maxPerBucket` FIFO cap bounds the hot-bucket case —
  *    a boilerplate signature flood costs memory ∝ cap, not ∝ stream;
  *  - a pair agreeing on several blocks would emit once per block; instead
  *    it is emitted only by the FIRST agreeing block (computable from the
  *    two signatures alone), so the output carries each unordered pair
  *    exactly once with no second stateful dedup operator.
  *
  * Emission time: a pair is produced when its SECOND member arrives
  * (carrying that row's event time). Recall within the watermark horizon
  * equals the batch operator's (100% by pigeonhole construction) unless the
  * FIFO cap evicted a partner early — the cap trades recall for bounded
  * state exactly like the batch `maxBucket` drop.
  */
object StreamingDedup {

  final case class SigEvent(band: Int, bv: Long, id: Long, sig: Long, ts: Timestamp)
  final case class BucketState(entries: List[(Long, Long, Long)]) // (id, sig, tsMillis), newest first
  final case class NearDupPair(id_a: Long, id_b: Long, hamming: Long, ts: Timestamp)

  /** (offset, width) of each pigeonhole block — same layout as the batch
    * engine (first 64 % blocks blocks get the extra bit). */
  private def blockLayout(maxHamming: Int): Array[(Int, Int)] = {
    val n = maxHamming + 1
    val widths = Array.tabulate(n)(b => 64 / n + (if (b < 64 % n) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    Array.tabulate(n)(b => (offsets(b), widths(b)))
  }

  private def blockValue(sig: Long, off: Int, width: Int): Long =
    (sig >>> off) & (if (width == 64) -1L else (1L << width) - 1L)

  /** First block index on which the two signatures agree, or -1. */
  private def firstAgreeingBlock(a: Long, b: Long, layout: Array[(Int, Int)]): Int = {
    var i = 0
    while (i < layout.length) {
      val (off, w) = layout(i)
      if (blockValue(a, off, w) == blockValue(b, off, w)) return i
      i += 1
    }
    -1
  }

  /** df must carry `id` (long), `sig64` (long) and `eventTime` (timestamp)
    * columns; `watermark` is the lateness horizon (also the dedup window —
    * partners further apart than it may be missed). Returns a streaming
    * frame of (id_a, id_b, hamming, ts), id_a < id_b, each pair once. */
  def hammingPairsStream(
      df: DataFrame, id: Column, sig64: Column, eventTime: Column,
      watermark: String, maxHamming: Int = 3,
      maxPerBucket: Int = 1024): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val layout = blockLayout(maxHamming)
    // the pairing WINDOW is enforced on event-time distance at compare time:
    // Spark's watermark lags one micro-batch (it advances after a batch
    // completes), so state eviction alone would let a partner just past the
    // horizon still pair. Watermark eviction remains the state bound.
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    val horizonMs = iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L
    val spark = df.sparkSession
    import spark.implicits._

    // the watermark must be applied LAST: a typed .map (or any op that
    // rebuilds the schema) silently discards the event-time tag and
    // flatMapGroupsWithState then rejects the event-time timeout
    val events = df
      .select(id.cast("long").as("id"), sig64.cast("long").as("sig"),
        eventTime.cast("timestamp").as("ts"))
      .select(col("id"), col("sig"), col("ts"), posexplode(
        array(layout.map { case (off, w) =>
          shiftrightunsigned(col("sig"), off)
            .bitwiseAND(lit(if (w == 64) -1L else (1L << w) - 1L))
        }: _*)).as(Seq("band", "bv")))
      .withWatermark("ts", watermark)
      .as[SigEvent]

    def update(key: (Int, Long), rows: Iterator[SigEvent],
        state: GroupState[BucketState]): Iterator[NearDupPair] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else 0L
      var entries = state.getOption.map(_.entries).getOrElse(Nil)
        .filter(_._3 >= wm)
      val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
      // iterator order within a micro-batch is not deterministic — sort so
      // intra-batch pair emission times are stable
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.id))
      sorted.foreach { e =>
        entries.foreach { case (id0, sig0, ts0) =>
          if (id0 != e.id && math.abs(e.ts.getTime - ts0) <= horizonMs) {
            val d = java.lang.Long.bitCount(e.sig ^ sig0)
            if (d <= maxHamming && firstAgreeingBlock(e.sig, sig0, layout) == e.band) {
              val (a, b) = if (id0 < e.id) (id0, e.id) else (e.id, id0)
              out += NearDupPair(a, b, d.toLong, e.ts)
            }
          }
        }
        entries = (e.id, e.sig, e.ts.getTime) :: entries
        if (entries.length > maxPerBucket) entries = entries.take(maxPerBucket)
      }
      state.update(BucketState(entries))
      val maxTs = entries.headOption.map(_._3).getOrElse(0L)
      state.setTimeoutTimestamp(math.max(maxTs, wm + 1L))
      out.iterator
    }

    events
      .groupByKey(e => (e.band, e.bv))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }
}
