package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Dump formatted physical plans for the audit-relevant queries into
  * PLANS.md — the reviewable record of pushdown / pruning / broadcast /
  * partial-agg behavior (asserted mechanically in PlanAuditSpec).
  * Usage: sbt 'runMain graft.examples.PlanDump [sfDir]'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val audited = Seq(
      "q1_agg" -> "filter pushdown to parquet (PushedFilters) + column pruning (ReadSchema: 5 of 11 cols)",
      "q_join_agg" -> "small dimension broadcast (BroadcastHashJoin) + partial/final HashAggregate",
      "q_anti_join" -> "left_anti join — the reference's final-emission semantics (dedup.py:779-797)",
      "q_exact_dedup_groups" -> "map-side partial aggregation before the hash shuffle",
      "q_minhash_lsh_dedup" -> "band explode → window count (one shuffle) → capped pair gen → verify joins → CC",
      "q_token_stats" -> "pure projection: single scan, zero Exchange",
      "q_embedding_top1" -> "blocked exact kNN: no LocalTableScan (no driver collect); block cells cross-joined",
      "q_ann_lsh_top1" -> "integer RHP buckets: count-filter cap, equi-join on (rep, bucket), window top-k",
      "q_ann_ivf_top1" -> "IVF: codebook scan (small LIMIT subplan), cell equi-join, window top-k",
      "q_embedding_dedup" -> "RHP-bucketed candidates + exact cosine verify, distinct pairs",
      "q_winnow_fingerprints" -> "explode gram positions → windowed min over position order (one shuffle)",
      "q_window_quality" -> "posexplode tokens → running-sum window → min agg; window and groupBy share the doc_id hash partitioning (one Exchange)",
      "q_winnow_production" -> "production WinnowedFingerprints expression: zero-Exchange projection+explode over the pruned (doc_id, text) scan",
      "q_simhash_production" -> "production ShingleHashes→SimHash64 expression chain: zero-Exchange projection over the pruned scan",
      "q_simhash_dup_pairs" -> "per-row Md5NgramSimHash signature (no gram explode, no per-bit aggregates — the round-4 60-sum groupBy shape is gone) → cached narrow (doc_id, sim) → pigeonhole chunk equi-joins")

    val md = new StringBuilder("# PLANS — formatted physical plans (audited)\n\n")
    md.append("Mechanical assertions over these properties live in " +
      "`src/test/scala/graft/PlanAuditSpec.scala`.\n")
    audited.foreach { case (name, why) =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      md.append(s"\n## $name\n\n*audit: $why*\n\n```\n$p```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), md.toString)
    println(s"PLANS.md written (${audited.size} plans)")
    spark.stop()
  }
}
