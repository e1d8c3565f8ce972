package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class TimeOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic synthetic events: modular-arithmetic users/seconds so
    * exact timestamp ties across frames are guaranteed (same seed → same
    * secs for the same id). */
  private def events(n: Int, users: Int, seed: Long): DataFrame =
    spark.range(n).select(
      col("id"),
      pmod(col("id") * 2654435761L + seed, lit(users.toLong)).as("user"),
      pmod(col("id") * 104729L + seed * 7919L, lit(500000L)).as("secs"),
      (pmod(col("id") * 31L + seed, lit(1000L)).cast("double") / 10.0).as("v"))
      .withColumn("ts", col("secs").cast("timestamp"))

  private def asofTriples(df: DataFrame): Set[(Long, Option[Any], Option[Any])] =
    df.collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

  test("asofJoin == brute inequality join + latest pick (ties, no-match, dup ts)") {
    val left = events(1500, 13, 1).select(col("id").as("lid"), col("user"), col("ts"))
    // same seed → right rows rid < 800 share (user, ts) with left lid=rid:
    // exact-timestamp ties must match inclusively
    val right = events(800, 13, 1).select(col("id").as("rid"), col("user"), col("ts"), col("v"))

    val got = TimeOps.asofJoin(left, right, Seq("user"), "ts", "ts",
      tieBreak = "rid", payload = Seq("rid", "v")).select("lid", "rid", "v")

    val brute = left.join(
        right.withColumnRenamed("user", "ruser").withColumnRenamed("ts", "rts"),
        col("user") === col("ruser") && col("rts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(Window.partitionBy("lid")
        .orderBy(col("rts").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1).select("lid", "rid", "v")

    assert(asofTriples(got) == asofTriples(brute))
    assert(asofTriples(got).exists(_._2.isEmpty), "expected some no-match rows")
    assert(asofTriples(got).count(_._2.nonEmpty) > 1000, "expected mostly matches")
  }

  test("asofJoin horizon nulls matches older than leftTs - horizon") {
    val left = events(800, 7, 2).select(col("id").as("lid"), col("user"), col("ts"))
    val right = events(400, 7, 2).select(col("id").as("rid"), col("user"), col("ts"), col("v"))

    val got = TimeOps.asofJoin(left, right, Seq("user"), "ts", "ts",
      tieBreak = "rid", payload = Seq("rid", "v"),
      horizon = Some("1 hour")).select("lid", "rid", "v")

    // the latest match is the max rts, so "null if older than horizon" ==
    // "latest among matches within the horizon" — brute uses the latter
    val brute = left.join(
        right.withColumnRenamed("user", "ruser").withColumnRenamed("ts", "rts"),
        col("user") === col("ruser") && col("rts") <= col("ts") &&
          col("rts") >= col("ts") - expr("INTERVAL 1 HOUR"), "left")
      .withColumn("rn", row_number().over(Window.partitionBy("lid")
        .orderBy(col("rts").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1).select("lid", "rid", "v")

    assert(asofTriples(got) == asofTriples(brute))
    assert(asofTriples(got).exists(_._2.isEmpty))
    assert(asofTriples(got).exists(_._2.nonEmpty))
  }

  test("sessionize == gaps-and-islands replay") {
    val e = events(2000, 7, 3).select(col("id"), col("user"), col("ts"), col("v"))
    val got = TimeOps.sessionize(e, Seq("user"), "ts", "30 minutes", "v")

    val w = Window.partitionBy("user").orderBy(col("ts"), col("id"))
    val exp = e
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("ts") > col("prev") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user", "sid")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("v").cast(DecimalType(20, 6))).cast("double").as("total_value"))
      .select("user", "session_start", "session_end", "n_events", "total_value")

    val gotSet = got.collect().map(_.toSeq).toSet
    val expSet = exp.collect().map(_.toSeq).toSet
    assert(gotSet == expSet)
    assert(gotSet.size > e.select("user").distinct().count(), "expected multiple sessions per user")
  }

  test("sessionize boundary: gap exactly == threshold MERGES; strictly greater splits") {
    val tiny = Seq((1L, 0L, 1.0), (2L, 1800L, 2.0), (3L, 3601L, 4.0))
      .toDF("id", "secs", "v")
      .withColumn("user", lit(0L))
      .withColumn("ts", col("secs").cast("timestamp"))
    val got = TimeOps.sessionize(tiny, Seq("user"), "ts", "30 minutes", "v")
      .select(col("n_events"), col("total_value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // 0→1800: gap == 30 min → touching windows MERGE (Spark session_window
    // semantics, what the DuckDB oracle must replay with a STRICT >);
    // 1800→3601: 1801s > 30 min → new session
    assert(got == Set((2L, 3.0), (1L, 4.0)))
  }

  test("intervalJoin == brute theta join (multi-bucket spans, zero-length, salt)") {
    val pts = events(1500, 1, 5).select(col("id").as("pid"), col("ts"))
    val iv = events(120, 1, 9).select(col("id").as("iid"), col("ts").as("p_start"))
      // lengths 0..149 minutes — includes empty intervals and multi-hour spans
      .withColumn("p_end", expr("p_start + make_dt_interval(0, 0, CAST(iid % 150 AS INT), 0)"))

    val got = TimeOps.intervalJoin(pts, "ts", iv, "p_start", "p_end", "hour")
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val brute = pts.crossJoin(iv)
      .filter(col("ts") >= col("p_start") && col("ts") < col("p_end"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(brute.nonEmpty)

    val salted = TimeOps.intervalJoin(pts, "ts", iv, "p_start", "p_end", "hour", salt = 4)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(salted == got)
  }

  test("hoppingAgg == brute window-start enumeration; each event in win/slide windows") {
    val e = events(2000, 5, 11).select(col("id"), col("user"), col("ts"), col("v"))
    val got = TimeOps.hoppingAgg(e, "ts", "6 hours", "2 hours", Seq("user"), "v")

    val slideUs = 7200L * 1000000L; val winUs = 21600L * 1000000L
    val brute = e.withColumn("ep", expr("unix_micros(ts)"))
      .withColumn("j", explode(lit((0 until 3).toArray)))
      .withColumn("ws", expr(s"(ep div $slideUs) * $slideUs - j * $slideUs"))
      .filter(col("ws") > col("ep") - winUs)
      .groupBy("ws", "user")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v").cast(DecimalType(20, 6))).cast("double").as("total_value"))
      .select(expr("timestamp_micros(ws)").as("window_start"),
        expr(s"timestamp_micros(ws + $winUs)").as("window_end"),
        col("user"), col("n_events"), col("total_value"))

    val gotSet = got.collect().map(_.toSeq).toSet
    assert(gotSet == brute.collect().map(_.toSeq).toSet)
    // every event replicated exactly win/slide = 3 times
    assert(got.agg(sum("n_events")).head.getLong(0) == 3 * e.count())
  }

  test("intervalJoin boundaries: start inclusive, end exclusive, bucket-edge interior point") {
    val pts = Seq(1000L, 3600L, 4600L).map(s => s * 1000000L).toDF("us")
      .withColumn("ts", expr("timestamp_micros(us)"))
      .withColumn("pid", col("us"))
    val iv = Seq((1L, 1000L * 1000000L, 4600L * 1000000L)).toDF("iid", "s_us", "e_us")
      .withColumn("p_start", expr("timestamp_micros(s_us)"))
      .withColumn("p_end", expr("timestamp_micros(e_us)"))
    val got = TimeOps.intervalJoin(pts, "ts", iv, "p_start", "p_end", "hour")
      .select("pid").as[Long].collect().toSet
    // 1000s == start → in; 3600s = interior bucket boundary → in; 4600s == end → out
    assert(got == Set(1000L * 1000000L, 3600L * 1000000L))
  }
}
