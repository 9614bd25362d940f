package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.io.StageStore

/** The flagship pipeline with per-stage commit + resume — the engine's
  * answer to the reference's durability discipline (LMDB write txns every
  * 100k records, dedup.py:594-612; atomic tmp-rename outputs,
  * common.py:601-733), at Spark-stage granularity.
  *
  * Four committed stages: `signatures`, `edges`, `assign`, `flags` — the
  * expensive shuffles. A killed job re-run with the same store reloads
  * every committed stage byte-identically (builders are not evaluated)
  * and recomputes only what never committed; emission is derived from the
  * source scan + the `flags` stage, so outputs stay projections of input
  * rows. Lineage (per-partition row counts + checksums) and metrics land
  * in `_lineage` / `_metrics` tables in the store.
  */
object ResumableDedupPipeline {

  def run(pages: DataFrame, cfg: DedupConfig, store: StageStore): DedupResult = {
    val spark = pages.sparkSession
    import spark.implicits._

    val (sigsAllRaw, gateRejects) = DedupPipeline.signatures(pages, cfg)
    val sigsAll = store.runStaged("signatures") {
      sigsAllRaw.select("doc_id", "text", "minhash", "simhash")
    }
    val sigs = sigsAll.where($"minhash".isNotNull)

    val edges = store.runStaged("edges")(DedupPipeline.dupEdges(sigs, cfg))
    val assign = store.runStaged("assign")(ConnectedComponents.run(edges))
    val flags = store.runStaged("flags")(DedupPipeline.winnerFlags(sigs, assign, cfg))

    // emission — derived, not staged (cheap joins of source rows + flags)
    val admittedWide = sigsAllRaw.drop("minhash", "simhash")
    val noContent = admittedWide.join(
      sigsAll.where($"minhash".isNull).select("doc_id"), Seq("doc_id"), "left_semi")
      .withColumn("reject_reason", F.lit("no_content"))
    val rejects = gateRejects.unionByName(noContent, allowMissingColumns = true)
    val flagged = admittedWide.join(flags, "doc_id")
    val deduped = flagged.where($"is_canonical")
      .drop("is_canonical", "is_duplicate", "cluster_id")
    val duplicates = flagged.where($"is_duplicate")
      .drop("is_canonical", "is_duplicate")
    val clusters = flagged.select($"url", $"doc_id", $"cluster_id", $"is_canonical")
    val nearMisses = spark.emptyDataset[(Long, Long)].toDF("a", "b")

    val flagStats = flags.agg(
      F.count(F.lit(1)),
      F.coalesce(F.sum(F.when($"is_duplicate", 1L).otherwise(0L)), F.lit(0L))).head()
    val metrics = Seq(
      "docs_flagged" -> flagStats.getLong(0),
      "duplicates_removed" -> flagStats.getLong(1),
      "edges" -> edges.count()
    ).toDF("metric", "value").orderBy("metric")
    store.writeMetrics(metrics)

    DedupResult(flagged, deduped, duplicates, clusters, nearMisses, rejects, metrics)
  }
}
