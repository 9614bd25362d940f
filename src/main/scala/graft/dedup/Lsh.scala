package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import graft.functions._

/** MinHash-LSH banding: signature → band buckets → candidate pairs →
  * verified near-duplicate edges.
  *
  * Re-expression of the reference's bucket algebra: band bucketing plays
  * `loc_db[location_key].append(id)` (reference/dupliganger/db.py:400-439),
  * and threshold verification plays the 1-error-tolerant whitelist match
  * inside each bucket (reference/dupliganger/dedup.py:230-269). Differences
  * forced by web text: a doc lands in `bands` buckets (not 1), so edges
  * must be de-duplicated across bands and merged by connected components
  * downstream; and mega-buckets (boilerplate pages) are a first-class skew
  * hazard, not an error path.
  *
  * Scale design (10^12 docs):
  *  - bucket sizes are counted BEFORE any member list is materialized —
  *    the count aggregation is partial-agg (map-side combine) friendly, so
  *    a boilerplate bucket with 10^8 members costs a counter per task, not
  *    a collect_list OOM. Oversized buckets never reach pair generation;
  *    their dropped volume is reported (`lsh_overflow_*` metrics).
  *  - pair generation is a bucket-key equi-join (a self-join of the
  *    bucket-exploded table), shuffled on (band, bucket); AQE handles
  *    residual skew below the cap.
  *  - verification re-joins the two signature columns by doc id instead of
  *    carrying signatures through the bucket shuffle `bands` times.
  */
object Lsh {

  /** Array of `bands` bucket keys for a minhash signature column:
    * bucket_i = xxhash64(i, minhash[i*r .. i*r+r)). Built-in higher-order
    * functions only — stays in codegen. */
  def bandBuckets(minhashCol: Column, bands: Int, rowsPerBand: Int): Column =
    F.transform(
      F.sequence(F.lit(0), F.lit(bands - 1)),
      b => F.xxhash64(b, F.slice(minhashCol, b * rowsPerBand + 1, F.lit(rowsPerBand))))

  /** (doc_id, band, bucket) — one row per band per doc. */
  def explodeBuckets(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val withBands = sigs
      .where(F.col("minhash").isNotNull)
      .select(F.col("doc_id"),
        F.posexplode(bandBuckets(F.col("minhash"), cfg.bands, cfg.rowsPerBand))
          .as(Seq("band", "bucket")))
    withBands
  }

  /** Candidate pairs (a < b by doc_id) from band buckets, hot buckets
    * capped. Returns (pairs, overflowStats). */
  def candidatePairs(sigs: DataFrame, cfg: DedupConfig): (DataFrame, DataFrame) = {
    val exploded = explodeBuckets(sigs, cfg)
    val sizes = exploded.groupBy("band", "bucket").count()
    val eligible = sizes.where(F.col("count").between(2, cfg.maxBucketSize))
      .select("band", "bucket")
    val overflow = sizes.where(F.col("count") > cfg.maxBucketSize)
      .agg(F.coalesce(F.count(F.lit(1)), F.lit(0L)).as("overflow_buckets"),
        F.coalesce(F.sum("count"), F.lit(0L)).as("overflow_rows"))
    // keep only members of small-enough, non-singleton buckets (the
    // singleton short-circuit: reference/dupliganger/dedup.py:543-562)
    val members = exploded.join(eligible, Seq("band", "bucket"))
    val pairs = members.as("x")
      .join(members.as("y"), Seq("band", "bucket"))
      .where(F.col("x.doc_id") < F.col("y.doc_id"))
      .select(F.col("x.doc_id").as("a"), F.col("y.doc_id").as("b"))
      .distinct()
    (pairs, overflow)
  }

  /** Attach signatures to pairs and score them. Output columns:
    * a, b, est_jaccard, sim_hamming, verified. */
  def verifyPairs(pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val sa = sigs.select(F.col("doc_id").as("a"),
      F.col("minhash").as("ma"), F.col("simhash").as("sa"))
    val sb = sigs.select(F.col("doc_id").as("b"),
      F.col("minhash").as("mb"), F.col("simhash").as("sb"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("est_jaccard", estJaccard(F.col("ma"), F.col("mb")))
      .withColumn("sim_hamming", hammingDistance(F.col("sa"), F.col("sb")))
      .withColumn("verified", F.col("est_jaccard") >= cfg.tau)
      .select("a", "b", "est_jaccard", "sim_hamming", "verified")
  }
}
