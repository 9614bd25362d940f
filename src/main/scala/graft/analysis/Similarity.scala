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
    * Output: vec_id, rank (1..k), nn_id. Ties broken by cos desc, nn_id
    * ascending — fully deterministic.
    *
    * Physical strategy: the candidate side is broadcast as one dense
    * primitive matrix and each partition of the query side scans it with
    * tight double loops inside `mapPartitions` — the standard
    * block-broadcast exact-kNN layout (no shuffle at all; the per-pair
    * Catalyst `zip_with` form allocates an array per comparison and runs
    * ~20× slower). Scale envelope: candidate side must fit an executor
    * (~n·dim·8 bytes); beyond that, block the candidate side and merge
    * per-block top-k (same code per block), or switch to [[lshTopK]]. */
  def bruteForceTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = prepared(embeddings)
      .select(F.col("vec_id"),
        F.transform(F.col("emb"), x => x / F.col("nrm")).as("unit"))
      .as[(Long, Array[Double])]
    val all = e.collectAsList() // candidate side; see scale envelope above
    val ids = new Array[Long](all.size)
    val mat = new Array[Array[Double]](all.size)
    var i = 0
    while (i < all.size) { ids(i) = all.get(i)._1; mat(i) = all.get(i)._2; i += 1 }
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcMat = spark.sparkContext.broadcast(mat)

    e.mapPartitions { it =>
      val cids = bcIds.value; val cmat = bcMat.value
      val n = cids.length
      it.flatMap { case (qid, q) =>
        // running top-k (selection by insertion — k is small)
        val topCos = Array.fill(k)(Double.NegativeInfinity)
        val topId = new Array[Long](k)
        var j = 0
        while (j < n) {
          if (cids(j) != qid) {
            val row = cmat(j)
            var d = 0.0
            var t = 0
            while (t < row.length) { d += q(t) * row(t); t += 1 }
            // insert if better than the current k-th (tie: smaller id wins)
            if (d > topCos(k - 1) ||
              (d == topCos(k - 1) && cids(j) < topId(k - 1))) {
              var pos = k - 1
              while (pos > 0 && (d > topCos(pos - 1) ||
                (d == topCos(pos - 1) && cids(j) < topId(pos - 1)))) {
                topCos(pos) = topCos(pos - 1); topId(pos) = topId(pos - 1); pos -= 1
              }
              topCos(pos) = d; topId(pos) = cids(j)
            }
          }
          j += 1
        }
        (0 until math.min(k, n - 1)).iterator.map(r => (qid, (r + 1).toLong, topId(r)))
      }
    }.toDF("vec_id", "rank", "nn_id")
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

  /** Near-duplicate vector pairs: cosine ≥ threshold, vec_a < vec_b.
    * Same block-broadcast layout as [[bruteForceTopK]] (each partition
    * scans the broadcast unit-vector matrix; only j > i compared); at
    * corpus sizes past the broadcast envelope, block the candidate side
    * or route through rhpBucket blocking first. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = prepared(embeddings)
      .select(F.col("vec_id"),
        F.transform(F.col("emb"), x => x / F.col("nrm")).as("unit"))
      .as[(Long, Array[Double])]
    val all = e.collectAsList()
    val ids = new Array[Long](all.size)
    val mat = new Array[Array[Double]](all.size)
    var i = 0
    while (i < all.size) { ids(i) = all.get(i)._1; mat(i) = all.get(i)._2; i += 1 }
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcMat = spark.sparkContext.broadcast(mat)

    e.mapPartitions { it =>
      val cids = bcIds.value; val cmat = bcMat.value
      val n = cids.length
      it.flatMap { case (qid, q) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var j = 0
        while (j < n) {
          if (cids(j) > qid) {
            val row = cmat(j)
            var d = 0.0
            var t = 0
            while (t < row.length) { d += q(t) * row(t); t += 1 }
            if (d >= threshold) out += ((qid, cids(j)))
          }
          j += 1
        }
        out.iterator
      }
    }.toDF("vec_a", "vec_b")
  }
}
