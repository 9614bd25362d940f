package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import graft.functions.HashUtil

/** Embedding similarity search: exact brute-force cosine top-k (the
  * correctness baseline) and a random-hyperplane-LSH bucketed variant
  * (the scale path). Embeddings are `array<float>` columns; all math is
  * done in double via built-in higher-order functions (`zip_with` +
  * `aggregate`), staying inside codegen — no UDFs.
  */
object Similarity {

  /** Dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(a, b, _ * _), F.lit(0.0), _ + _)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Normalize input: vec_id, emb (array<double>), nrm. */
  def prepared(embeddings: DataFrame, idCol: String = "vec_id",
               embCol: String = "embedding"): DataFrame = {
    val emb = F.transform(F.col(embCol), _.cast("double"))
    embeddings.select(F.col(idCol), emb.as("emb"))
      .withColumn("nrm", norm(F.col("emb")))
      .where(F.col("nrm") > 0)
  }

  /** Exact brute-force top-k nearest neighbors by cosine.
    * O(n²) compare — the correctness oracle and the small-n baseline. At
    * scale, swap in [[lshTopK]] (same output columns) or an IVF variant.
    * Output: vec_id, rank (1..k), nn_id. Ties broken by nn_id ascending —
    * fully deterministic. */
  def bruteForceTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(F.col("vec_id"), F.col("emb").as("ea"), F.col("nrm").as("na"))
    val b = e.select(F.col("vec_id").as("nn_id"), F.col("emb").as("eb"), F.col("nrm").as("nb"))
    val scored = a.join(b, F.col("vec_id") =!= F.col("nn_id"))
      .withColumn("cos", cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")))
    val w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc, F.col("nn_id"))
    scored.withColumn("rank", F.row_number().over(w))
      .where(F.col("rank") <= k)
      .select(F.col("vec_id"), F.col("rank").cast("long").as("rank"), F.col("nn_id"))
  }

  /** Signed projection onto pseudo-random hyperplane `p` (Rademacher ±1
    * entries derived from mix64(seed, p, dim) — data-independent and
    * reproducible anywhere). */
  private def hyperplaneBit(emb: Column, p: Int, seed: Long): Column = {
    // sum_i emb[i] * sign_i  with  sign_i = ±1 from a hash of (seed, p, i)
    val signed = F.zip_with(
      emb,
      F.transform(F.sequence(F.lit(0), F.size(emb) - 1),
        i => F.when(
          F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) === 0, 1.0).otherwise(-1.0)),
      _ * _)
    F.when(F.aggregate(signed, F.lit(0.0), _ + _) >= 0, F.lit(1L)).otherwise(F.lit(0L))
  }

  /** Random-hyperplane LSH bucket id (numPlanes sign bits packed). */
  def rhpBucket(emb: Column, numPlanes: Int, seed: Long = HashUtil.DefaultSeed): Column =
    (0 until numPlanes).map(p => hyperplaneBit(emb, p, seed) * (1L << p))
      .reduce(_ + _)

  /** Approximate top-k: candidates restricted to the same RHP bucket —
    * the 10^12-scale pattern (bucket sizes ~ n / 2^planes; the pair join
    * shuffles on bucket id). Same output columns as bruteForceTopK; probes
    * only one bucket, so recall < 1 by design (multi-probe = union over
    * seed variants). */
  def lshTopK(embeddings: DataFrame, k: Int, numPlanes: Int = 8,
              seed: Long = HashUtil.DefaultSeed): DataFrame = {
    val e = prepared(embeddings)
      .withColumn("bucket", rhpBucket(F.col("emb"), numPlanes, seed))
    val a = e.select(F.col("bucket"), F.col("vec_id"), F.col("emb").as("ea"), F.col("nrm").as("na"))
    val b = e.select(F.col("bucket"), F.col("vec_id").as("nn_id"), F.col("emb").as("eb"), F.col("nrm").as("nb"))
    val scored = a.join(b, Seq("bucket"))
      .where(F.col("vec_id") =!= F.col("nn_id"))
      .withColumn("cos", cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")))
    val w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc, F.col("nn_id"))
    scored.withColumn("rank", F.row_number().over(w))
      .where(F.col("rank") <= k)
      .select(F.col("vec_id"), F.col("rank").cast("long").as("rank"), F.col("nn_id"))
  }

  /** Near-duplicate vector pairs: cosine ≥ threshold, a < b. Brute-force
    * form; at scale route through rhpBucket blocking first. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(F.col("vec_id").as("vec_a"), F.col("emb").as("ea"), F.col("nrm").as("na"))
    val b = e.select(F.col("vec_id").as("vec_b"), F.col("emb").as("eb"), F.col("nrm").as("nb"))
    a.join(b, F.col("vec_a") < F.col("vec_b"))
      .where(cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")) >= threshold)
      .select("vec_a", "vec_b")
  }
}
