package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted inside operators (knnJoin's top-k
  * accumulator, minhashCandidates' signature frame). Operators can't know
  * when the caller's final action has run, so they can't unpersist safely
  * themselves; in a long-lived session repeated calls would otherwise
  * accumulate cached blocks (disk blocks are not LRU-evicted). Callers — our
  * Bench/Verify harnesses, tests, and any interactive session — call
  * [[releaseAll]] after consuming a query's result.
  */
object CacheTracker {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def register(df: DataFrame): DataFrame = { frames.add(df); df }

  /** Unpersist every tracked frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = {
    var df = frames.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: IllegalStateException => () }
      df = frames.poll()
    }
  }
}
