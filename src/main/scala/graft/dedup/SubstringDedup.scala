package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import graft.functions._

/** Exact-substring duplicate pass — the north_star's "suffix-array pass",
  * re-expressed for distribution as winnowed-fingerprint containment
  * (Schleimer et al., SIGMOD'03) + literal verification.
  *
  * A per-group suffix array (the literal reading) needs all group text in
  * one task — a memory wall at web scale. Winnowing gives the same
  * guarantee distributively: any shared substring of length ≥ w + win − 1
  * shares a selected fingerprint, so "text(A) occurs inside text(B)"
  * implies containment(A→B) = |fp(A)∩fp(B)| / |fp(A)| ≈ 1. We generate
  * candidate directed pairs by a fingerprint equi-join (posting lists
  * capped like LSH buckets), score containment by a count aggregation,
  * and then verify candidates EXACTLY with `contains(text_b, text_a)` —
  * so the emitted edges carry no approximation (what the suffix array
  * would have certified, restored at the pair level where the join is
  * cheap).
  *
  * Scale: posting-list cap before any pairing (partial-agg count, same
  * discipline as Lsh); containment scoring is a groupBy on (small, large)
  * pair keys; the exact `contains` runs only on surviving candidates —
  * the only place full text crosses a shuffle, bounded by candidate count.
  */
object SubstringDedup {

  /** Directed verified edges (a "contained-in" b, emitted as undirected
    * (a, b) for clustering) among docs: columns a, b, containment. */
  def substringEdges(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val eligible = docs
      .where(F.length(F.col("text")) >= cfg.minSubstringChars)
      .select(F.col("doc_id"),
        winnowedFingerprints(F.col("text"), cfg.winnowW, cfg.winnowWin, cfg.seed).as("fp"),
        F.length(F.col("text")).as("len"))
      .withColumn("nfp", F.size(F.col("fp")))
      .where(F.col("nfp") > 0)

    // one shuffle on fingerprint: window count tags posting-list size
    // (no list materialized before the cap), capped groupBy reuses the
    // partitioning to build bounded member arrays, pairs explode from them
    val postings = eligible.select(F.col("doc_id"), F.col("len"), F.col("nfp"),
      F.explode(F.col("fp")).as("f"))
    val counted = postings.withColumn("pn",
      F.count(F.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")))
      .where(F.col("pn").between(2, cfg.maxFingerprintPostings))
    val buckets = counted.groupBy("f")
      .agg(F.collect_list(F.struct(F.col("doc_id"), F.col("len"), F.col("nfp"))).as("ms"))

    // directed candidates: shorter doc (a) potentially inside longer (b);
    // shared-fingerprint count / |fp(a)| = containment estimate
    val cand = buckets
      .select(F.explode(F.col("ms")).as("x"), F.col("ms"))
      .select(F.col("x"), F.explode(F.col("ms")).as("y"))
      .where(F.col("x.len") < F.col("y.len") ||
        (F.col("x.len") === F.col("y.len") && F.col("x.doc_id") < F.col("y.doc_id")))
      .groupBy(F.col("x.doc_id").as("a"), F.col("y.doc_id").as("b"))
      .agg(F.count(F.lit(1)).as("shared"), F.first(F.col("x.nfp")).as("nfp_a"))
      .withColumn("containment", F.col("shared").cast("double") / F.col("nfp_a"))
      .where(F.col("containment") >= cfg.containmentThreshold)
      .select("a", "b", "containment")

    // exact verification: literal substring occurrence (ASCII-case-folded,
    // matching the fingerprint fold)
    val ta = docs.select(F.col("doc_id").as("a"), F.lower(F.col("text")).as("text_a"))
    val tb = docs.select(F.col("doc_id").as("b"), F.lower(F.col("text")).as("text_b"))
    cand.join(ta, "a").join(tb, "b")
      .where(F.col("text_b").contains(F.col("text_a")))
      .select("a", "b", "containment")
  }
}
