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

  private val tracked =
    new java.util.WeakHashMap[SparkSession, mutable.Buffer[DataFrame]]

  /** Persist `df` and remember it for [[release]]. */
  def track(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      df.persist(level)
      tracked.computeIfAbsent(df.sparkSession, _ => mutable.Buffer.empty) += df
      df
    }

  /** Unpersist every frame tracked in this session (non-blocking). */
  def release(spark: SparkSession): Unit = synchronized {
    Option(tracked.remove(spark)).foreach(_.foreach(_.unpersist(false)))
  }
}
