package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.dedup.DedupResult

/** Multi-way routed sink — the reference writes 4-5 output files in one
  * pass, routing each record by its dedup fate
  * (reference/dupliganger/dedup.py:677-803; per-barcode dynamic fan-out
  * barcode_split_quality_filter_umi_anno.py:222-308). At scale that is
  * one pass adding a `route` column and `write.partitionBy("route")`
  * (SURVEY.md §2.1 S5/S6) — one shuffle-free write, N directories, not N
  * passes over the input.
  */
object DedupOutputs {

  val Routes = Seq("kept", "duplicate", "reject")

  /** One-pass routed write: <dir>/route=kept|duplicate|reject plus the
    * clusters listing and metrics tables. Returns the routed frame. */
  def writeRouted(result: DedupResult, dir: String): DataFrame = {
    val cols = Seq("url", "text", "lang", "route", "reject_reason")
    val kept = result.deduped
      .withColumn("route", F.lit("kept"))
      .withColumn("reject_reason", F.lit(null).cast("string"))
    val dups = result.duplicates
      .withColumn("route", F.lit("duplicate"))
      .withColumn("reject_reason", F.lit(null).cast("string"))
    val rej = result.rejects.withColumn("route", F.lit("reject"))
    val routed = kept.selectExpr(cols: _*)
      .unionByName(dups.selectExpr(cols: _*))
      .unionByName(rej.selectExpr(cols: _*))
    routed.write.mode("overwrite").partitionBy("route").parquet(s"$dir/pages_routed")
    result.clusters.write.mode("overwrite").parquet(s"$dir/clusters")
    result.metrics.write.mode("overwrite").parquet(s"$dir/metrics")
    routed
  }

  def readRoute(spark: SparkSession, dir: String, route: String): DataFrame =
    spark.read.parquet(s"$dir/pages_routed").where(F.col("route") === route)
}
