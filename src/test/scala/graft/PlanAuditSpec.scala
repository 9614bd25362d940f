package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the plan properties the 100 TB design depends on
  * must hold in the compiled plan, not just in intent. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("q1_agg: filter pushed to parquet scan, columns pruned") {
    val p = plan(q("q1_agg"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // projection needs only 5 of 11 lineitem columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      readSchema)
  }

  test("q_join_agg: small dimension joined via broadcast, partial aggregation present") {
    val p = plan(q("q_join_agg"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q_anti_join / q_semi_join compile to join, not subquery re-scan") {
    assert(plan(q("q_anti_join")).contains("LeftAnti"), "anti")
    assert(plan(q("q_semi_join")).contains("LeftSemi"), "semi")
  }

  test("exact dedup: map-side partial aggregation before the shuffle") {
    val p = plan(q("q_exact_dedup_groups"))
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate:\n$p")
    assert(p.contains("hashpartitioning"), p)
  }

  test("signature stage stays in whole-stage codegen (custom exprs are leaves)") {
    import org.apache.spark.sql.{functions => F}
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(F.col("doc_id"),
        graft.functions.minhash(graft.functions.shingles(F.col("text"), 3), 32).as("mh"))
      .where(F.col("mh").isNotNull)
    // the asterisk prefix marks operators fused into whole-stage codegen
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*("), executed)
  }

  test("token stats: single scan, no shuffle (pure projection)") {
    val p = plan(q("q_token_stats"))
    assert(!p.contains("Exchange"), p)
  }

  test("window quality: zero-Exchange per-row projection; text+doc_id pruned scan") {
    val p = plan(q("q_window_quality"))
    // round 6: the sliding-window score is computed per row
    // (WindowedMinQuality expression) — no token explode, no window
    // shuffle, no re-aggregation. Any Exchange here is a regression to
    // the exploded layout.
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("winnow fingerprints: zero-Exchange per-row projection") {
    val p = plan(q("q_winnow_fingerprints"))
    // round 6: per-row Md5WinnowedFingerprints + explode — the
    // position-explode + windowed-min + distinct exchanges are gone
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("embedding queries: no driver-side collect in any oracle'd plan") {
    // a collect-based layout would appear as a LocalTableScan/broadcast of
    // the whole vector table built on the driver; the blocked/bucketed
    // layouts must keep the candidate side cluster-side: either directly
    // in the parquet scan, or (round 6: operator caches are lazy
    // localCheckpoints, not columnar persists) behind a distributed
    // checkpoint leaf — "Scan ExistingRDD" is executor-resident blocks
    // fed by the scan, NOT driver rows (those print LocalTableScan /
    // LocalRelation)
    for (name <- Seq("q_embedding_top1", "q_embedding_dedup", "q_ann_lsh_top1")) {
      val p = plan(q(name))
      assert(!p.contains("LocalTableScan"), s"$name:\n$p")
      assert(p.contains("Scan parquet") || p.contains("BatchScan")
        || p.contains("Scan ExistingRDD"), s"$name:\n$p")
    }
  }

  test("flagship emission join builds its hash table from the narrow side") {
    val res = graft.dedup.DedupPipeline.run(
      graft.io.SyntheticCorpus.pages(spark, 500),
      graft.dedup.DedupConfig(allowedLangs = Some(Set("en"))))
    // the emission frame is lineage-truncated (its own plan is an RDD
    // scan); the pipeline records the pre-checkpoint physical plan
    val p = Caches.capturedPlan("flagship-emission").get
    assert(p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      s"emission join degraded to sort-merge over wide rows:\n$p")
    res.cleanup()
  }

  test("production signature queries are zero-Exchange projections") {
    // the production-expression oracles add no shuffle: winnow/simhash are
    // per-row Catalyst expressions over the pruned scan
    for (name <- Seq("q_winnow_production", "q_simhash_production")) {
      val p = plan(q(name))
      assert(!p.contains("Exchange"), s"$name:\n$p")
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), s"$name:\n$p")
    }
  }
}
