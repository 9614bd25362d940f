package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry for caches the engine creates inside operators, so long-lived
  * sessions can release them: internal `persist()` calls (LSH pair frames,
  * substring candidates, prepared n-gram tables, pipeline stages) would
  * otherwise accumulate MEMORY_AND_DISK entries with no handle. Operators
  * route persists through [[track]]; callers release everything the engine
  * pinned in a session with [[release]] (or `DedupResult.cleanup()`).
  *
  * Scope is per-SparkSession, not per-run: release drops every
  * graft-tracked cache in the session, which is the intended "I'm done
  * with this engine's results" point — concurrent runs in one session
  * should call it only after all results are materialized.
  */
object Caches {

  // Strong references are required while a session lives (the frame is
  // the unpersist handle), but a DataFrame strongly references its
  // SparkSession, so entries must not rely on weak keys for cleanup —
  // instead a context-stop listener drops a session's entry when the
  // session dies (its cached blocks die with its block manager), so
  // sessions stopped without release() cannot leak registry entries.
  private val tracked =
    new java.util.HashMap[SparkSession, mutable.Buffer[DataFrame]]

  /** Persist `df` and remember it for [[release]]. */
  def track(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      df.persist(level)
      val s = df.sparkSession
      if (!tracked.containsKey(s)) {
        tracked.put(s, mutable.Buffer.empty)
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            Caches.synchronized { tracked.remove(s) }
        })
      }
      tracked.get(s) += df
      df
    }

  /** Unpersist every frame tracked in this session (non-blocking). */
  def release(spark: SparkSession): Unit = synchronized {
    Option(tracked.remove(spark)).foreach(_.foreach(_.unpersist(false)))
  }

  /** Lazily localCheckpoint `df`: persists like [[track]] AND truncates
    * lineage, so every downstream action analyzes a leaf relation instead
    * of re-optimizing the whole upstream tree. Driver-side planning is
    * single-threaded and independent of core count — in a multi-action
    * pipeline it is the dominant serial cost (measured: the 1,000-doc
    * flagship run fell 12 s → 7 s when its stage boundaries truncated),
    * so this is what keeps the scaling curve honest, not a micro-opt.
    * Blocks are NOT released by [[release]] — a truncated frame cannot
    * recompute, and `DedupResult.cleanup()` promises results stay usable
    * — they are reclaimed by Spark's ContextCleaner once the frame is
    * unreachable, or with the session. Availability trade (same as the
    * CC loop's checkpoints): losing an executor forfeits its blocks and
    * the run must restart — `ResumableDedupPipeline`'s parquet stages
    * are the durable alternative for flaky clusters. */
  def truncate(df: DataFrame): DataFrame = df.localCheckpoint(false)

  // Truncation hides the producing plan behind an RDD scan, so plan-audit
  // tooling (PlanAuditSpec, PlanDump) could no longer see what the engine
  // actually compiled. A tagged truncate records the pre-checkpoint
  // physical plan — planning already happened eagerly inside
  // localCheckpoint, so the capture costs a toString, nothing more.
  private val plans = new java.util.concurrent.ConcurrentHashMap[String, String]

  /** [[truncate]] + record the pre-checkpoint physical plan under `tag`
    * for [[capturedPlan]]. */
  def truncateTagged(df: DataFrame, tag: String): DataFrame = {
    val out = df.localCheckpoint(false)
    plans.put(tag, df.queryExecution.executedPlan.toString)
    out
  }

  /** The physical plan last recorded by [[truncateTagged]] for `tag`. */
  def capturedPlan(tag: String): Option[String] = Option(plans.get(tag))
}
