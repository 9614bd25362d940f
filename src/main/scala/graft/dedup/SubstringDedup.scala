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
    * (a, b) for clustering) among docs: columns a, b, containment.
    *
    * Exact-duplicate reduction: the pass runs over ONE representative per
    * distinct text (min doc_id). Identical texts have identical MinHash
    * signatures, land in identical LSH bands and are always verified at
    * est-Jaccard 1.0, so the LSH pass links every exact sibling to the
    * representative and connected components merges the substring edges
    * transitively. On dup-heavy corpora this removes the densest
    * fingerprint buckets outright (every exact pair shares ALL
    * fingerprints). Callers composing substringEdges WITHOUT the LSH pass
    * must expand edges over exact-text groups themselves. */
  def substringEdges(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    // Representative selection shuffles IDS ONLY (16 B/row): min doc_id
    // per text-hash, joined back to the scan. The direct
    // groupBy(text).first(text) form would push every text byte through
    // the exchange and hold it in aggregation state; here the wide column
    // stays in the scan and AQE turns the join into a broadcast when the
    // rep-id table is small enough.
    val repIds = graft.Caches.track(docs
      .select(F.col("doc_id"), F.xxhash64(F.col("text")).as("th"))
      .groupBy("th").agg(F.min(F.col("doc_id")).as("doc_id"))
      .select("doc_id")) // ids only; consumed by both reps uses below
    val reps = docs.join(repIds, Seq("doc_id"), "left_semi")
    // lineage-truncating checkpoint, not a columnar persist (round 6):
    // the frame is consumed twice (the posting-size counts and the
    // eligibility join's probe side), but its payload is fp ARRAYS —
    // columnar cache encoding of array<long> columns measured ~2.5× the
    // winnow recompute itself at 100k docs; the checkpoint writes
    // UnsafeRows (memcpy) once and both consumers scan it
    val eligible = graft.Caches.truncate(reps
      .where(F.length(F.col("text")) >= cfg.minSubstringChars)
      .select(F.col("doc_id"),
        winnowedFingerprints(F.col("text"), cfg.winnowW, cfg.winnowWin, cfg.seed).as("fp"),
        F.length(F.col("text")).as("len"))
      .withColumn("nfp", F.size(F.col("fp")))
      .where(F.col("nfp") > 0))
    val buckets = cappedPostingBuckets(eligible, cfg)

    // directed candidates: shorter doc (a) potentially inside longer (b);
    // shared-fingerprint count / |fp(a)| = containment estimate
    val candRaw = buckets
      .select(F.explode(F.col("ms")).as("x"), F.col("ms"))
      .select(F.col("x"), F.explode(F.col("ms")).as("y"))
      .where(F.col("x.len") < F.col("y.len") ||
        (F.col("x.len") === F.col("y.len") && F.col("x.doc_id") < F.col("y.doc_id")))
      .groupBy(F.col("x.doc_id").as("a"), F.col("y.doc_id").as("b"))
      .agg(F.count(F.lit(1)).as("shared"), F.first(F.col("x.nfp")).as("nfp_a"))
      .withColumn("containment", F.col("shared").cast("double") / F.col("nfp_a"))
      .where(F.col("containment") >= cfg.containmentThreshold)
      .select("a", "b", "containment")
    val cand = candRaw

    // exact verification: literal substring occurrence, folded with the
    // SAME ASCII-only A-Z→a-z fold the fingerprints sampled (F.lower is
    // full Unicode and can change string length — e.g. 'İ' — so the
    // verified predicate would not be the sampled one on non-ASCII text).
    //
    // Stacked single-join form (round 6; guide §2.4 — same melt as
    // Lsh.verifyPairs): each candidate pair explodes into one row per
    // endpoint keyed by doc_id, ONE shuffle-hash join attaches the folded
    // text (the inner join IS the member reduction — non-candidate texts
    // drop at the join; sort-merge would sort kilobytes of text per row
    // for a hash-equality lookup), and an (a, b) aggregation pivots the
    // two endpoints back onto one row. The round-5 chain — member-id
    // union, left_semi reduction, two id-keyed text joins — cost 7
    // exchanges and pushed the text payload through three shuffles; this
    // costs 3 exchanges and ships each candidate text once. The
    // npresent = 2 filter reproduces the double-inner-join semantics
    // (reps is unique per doc_id by construction); the candidate frame is
    // consumed once, so round 5's cand cache is gone too.
    val asciiFold = (c: org.apache.spark.sql.Column) =>
      F.translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    val stacked = cand.select(F.col("a"), F.col("b"), F.col("containment"),
      F.explode(F.array(F.col("a"), F.col("b"))).as("doc_id"))
    val folded = reps.select(F.col("doc_id"), asciiFold(F.col("text")).as("t"))
    // build side = stacked (2 narrow rows per surviving candidate), not
    // the folded texts — the round-6.0 form built the hash table from
    // kilobyte text rows and streamed the tiny pair frame (see the same
    // swap in Lsh.verifyPairs)
    stacked.hint("shuffle_hash").join(folded, Seq("doc_id"))
      .groupBy("a", "b").agg(
        F.max(F.col("containment")).as("containment"),
        F.count(F.lit(1)).as("npresent"),
        F.first(F.when(F.col("doc_id") === F.col("a"), F.col("t")),
          ignoreNulls = true).as("text_a"),
        F.first(F.when(F.col("doc_id") === F.col("b"), F.col("t")),
          ignoreNulls = true).as("text_b"))
      .where(F.col("npresent") === 2)
      .where(F.col("text_b").contains(F.col("text_a")))
      .select("a", "b", "containment")
  }

  /** Capped posting-list buckets (f → bounded member array), hot
    * fingerprints tamed by the SAME strategy triple as the LSH band
    * buckets (`cfg.hotBucketStrategy`, parity-tested in
    * SubstringDedupSpec) — a site-wide boilerplate block ≥
    * winnowW+winnowWin−1 chars shared by 10^8 pages is exactly the
    * mega-key this pass meets at web scale:
    *
    *  - "window": one shuffle on f; the window count co-locates ALL
    *    postings of one fingerprint in a task BEFORE the cap filter —
    *    cheapest, safe only while no fingerprint is truly hot.
    *  - "salted": posting sizes aggregated per (f, salt) first, rolled
    *    up, and eligibility (2 ≤ pn ≤ cap) joined back BEFORE the only
    *    shuffle that co-locates a fingerprint — no task ever holds an
    *    uncapped posting list.
    *  - "auto" (default): probe the ACTUAL max posting-list size from a
    *    map-side-combined counts pass (eager — `eligible` is cached by
    *    the caller), window while ≤ 4× the cap, salted beyond. */
  private def cappedPostingBuckets(eligible: DataFrame, cfg: DedupConfig): DataFrame = {
    val postings = eligible.select(F.col("doc_id"), F.col("len"), F.col("nfp"),
      F.explode(F.col("fp")).as("f"))
    def collectMembers(capped: DataFrame): DataFrame =
      capped.groupBy("f")
        .agg(F.collect_list(F.struct(F.col("doc_id"), F.col("len"), F.col("nfp"))).as("ms"))
    def windowForm: DataFrame =
      collectMembers(postings.withColumn("pn",
        F.count(F.lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("f")))
        .where(F.col("pn").between(2, cfg.maxFingerprintPostings))
        .drop("pn"))
    def saltedForm: DataFrame = {
      val sizes = postings
        .withColumn("salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(cfg.saltBuckets)))
        .groupBy("f", "salt").count()
        .groupBy("f").agg(F.sum("count").as("pn"))
      val ok = sizes.where(F.col("pn").between(2, cfg.maxFingerprintPostings))
        .select("f")
      collectMembers(postings.join(ok.hint("shuffle_hash"), Seq("f")))
    }
    cfg.hotBucketStrategy match {
      case "window" => windowForm
      case "salted" => saltedForm
      case _ => // auto (round 6): counts → eligibility join, the universal form
        // Replaces the eager max-posting probe (a full explode+aggregate
        // pass, driver-blocking, whose only output was the window-vs-
        // salted choice) + the chosen strategy's own pass. Posting sizes
        // aggregate map-side-combine-safely at any skew; the 2..cap
        // filter drops hot fingerprints (and the singleton majority)
        // BEFORE any shuffle co-locates them; AQE broadcasts the
        // eligible set when it is small (the common case — only
        // fingerprints shared by 2..cap docs survive), so the wide
        // posting rows skip the full exchange + window sort the window
        // form paid. Output-identical to both forced strategies
        // (SubstringDedupSpec parity, calm + hot corpora).
        val counts = postings.groupBy("f").count()
        val ok = counts.where(F.col("count")
          .between(2, cfg.maxFingerprintPostings)).select("f")
        collectMembers(postings.join(ok, Seq("f")))
    }
  }
}
