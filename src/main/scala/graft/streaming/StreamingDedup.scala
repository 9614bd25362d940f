package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}

import graft.analysis.TextAnalysis

/** Per-fingerprint streaming state: the first-seen document. (Top-level —
  * the state encoder's generated code needs a public constructor.) */
final case class SeenState(firstUrl: String)

/** Streaming ingestion dedup — the event-time re-expression of the
  * reference's "second scan + dup_db membership check" emission pass
  * (reference/dupliganger/dedup.py:742-803): instead of a batch anti-join
  * against a prebuilt loser set, the loser set IS streaming state keyed by
  * content fingerprint, bounded by a watermark.
  *
  * Two operators:
  *  - [[dedupStream]]: keep only the first arrival per fingerprint within
  *    the watermark — built-in `dropDuplicatesWithinWatermark` (state
  *    bounded, scales with distinct keys in the watermark window).
  *  - [[flagStream]]: keep every row but mark late copies
  *    `is_duplicate` — custom state via `flatMapGroupsWithState`
  *    (the FLAG|=0x400 analog, reference dedup.py:783-789, as a column),
  *    with event-time timeout so state is dropped once the watermark
  *    passes (10^12-scale discipline: state size is windowed, never
  *    corpus-sized).
  */
object StreamingDedup {

  /** Normalized content fingerprint used as the dedup key. */
  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(F.col(textCol)))

  /** First arrival per fingerprint wins; later copies within the
    * watermark are dropped. `tsCol` must be an event-time column. */
  def dedupStream(docs: DataFrame, tsCol: String, watermark: String): DataFrame =
    withFingerprint(docs)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  final case class FlaggedDoc(url: String, fp: String, ts: java.sql.Timestamp,
                              is_duplicate: Boolean)

  /** Every row passes through; copies of an already-seen fingerprint are
    * flagged. State per fingerprint expires at the watermark. */
  def flagStream(docs: DataFrame, tsCol: String, watermark: String): Dataset[FlaggedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // project first, watermark last: a projection that re-casts the
    // event-time column would strip the watermark tag the stateful
    // operator needs
    val keyed = withFingerprint(docs)
      .select(F.col("url"), F.col("fp"), F.col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[(String, String, java.sql.Timestamp)]
      .groupByKey(_._2)
    keyed.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (fp: String, rows: Iterator[(String, String, java.sql.Timestamp)],
       state: GroupState[SeenState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          // deterministic processing order inside the batch
          val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._1))
          val out = sorted.iterator.map { case (url, _, ts) =>
            val dup = state.exists
            if (!dup) state.update(SeenState(url))
            FlaggedDoc(url, fp, ts, dup)
          }
          val result = out.toVector
          state.getCurrentWatermarkMs() // watermark available ⇒ set timeout
          state.setTimeoutTimestamp(
            sorted.map(_._3.getTime).max, watermark)
          result.iterator
        }
    }
  }
}
