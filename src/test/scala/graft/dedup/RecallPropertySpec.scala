package graft.dedup

import graft.SparkSpec
import graft.functions.{HashUtil, ShingleHashes}
import org.apache.spark.sql.{functions => F}
/** Property tests per SURVEY.md §5(d): MinHash estimate concentration,
  * pipeline recall vs an exact O(n²) Jaccard oracle, permutation/seed
  * invariances. Deterministic parameter sweeps (no scalatestplus bridge
  * ships in the offline cache; seeded sweeps reproduce exactly anyway). */
class RecallPropertySpec extends SparkSpec {

  private val vocab = Array.tabulate(300)(i => s"w$i")

  private def doc(seed: Long, n: Int): Array[String] = {
    var s = seed
    Array.tabulate(n) { _ =>
      s = HashUtil.mix64(s + 0x9E3779B97F4A7C15L)
      vocab((math.abs(s) % vocab.length).toInt)
    }
  }

  test("property: minhash Jaccard estimate concentrates around true Jaccard") {
    val cases = for {
      n <- Seq(120, 250, 400)
      overlap <- Seq(0, 40, 80, 100)
    } yield (n, overlap, 31L * n + overlap)
    cases.foreach { case (n, overlap, s1) =>
      val base = doc(s1, n)
      val other = base.take(n * overlap / 100) ++ doc(s1 + 7777, n - n * overlap / 100)
      val sa = ShingleHashes.compute(base.mkString(" "), 3, HashUtil.DefaultSeed)
      val sb = ShingleHashes.compute(other.mkString(" "), 3, HashUtil.DefaultSeed)
      val trueJ = sa.toSet.intersect(sb.toSet).size.toDouble / sa.toSet.union(sb.toSet).size
      val spark2 = spark; import spark2.implicits._
      val est = Seq((sa, sb)).toDF("a", "b")
        .select(graft.functions.estJaccard(
          graft.functions.minhash(F.col("a"), 128),
          graft.functions.minhash(F.col("b"), 128)).as("j"))
        .head().getDouble(0)
      // 128 hashes: se = sqrt(J(1-J)/128) <= 0.045; allow 4.5 sigma
      assert(math.abs(est - trueJ) <= 0.2, s"est=$est true=$trueJ n=$n overlap=$overlap")
    }
  }

  test("pipeline recall vs exact O(n²) Jaccard oracle at n=1200 (>= 0.99 target)") {
    val spark2 = spark
    import spark2.implicits._
    val n = 1200L
    val cfg = DedupConfig(allowedLangs = Some(Set("en")))
    val pages = graft.io.SyntheticCorpus.pages(spark, n)

    // exact oracle: all pairs with true shingle-set Jaccard >= tau
    val docsArr = pages.where(F.length(F.trim(F.col("text"))) >= 1 && F.col("lang") === "en")
      .select("url", "text").collect()
      .map(r => r.getString(0) -> ShingleHashes.compute(r.getString(1), cfg.shingleK, cfg.seed).toSet)
      .filter(_._2.nonEmpty)
    val truePairs = (for {
      i <- docsArr.indices.iterator; j <- (i + 1) until docsArr.length
      inter = docsArr(i)._2.intersect(docsArr(j)._2).size
      if inter > 0
      uni = docsArr(i)._2.size + docsArr(j)._2.size - inter
      if inter.toDouble / uni >= cfg.tau
    } yield Set(docsArr(i)._1, docsArr(j)._1)).toSet
    assert(truePairs.nonEmpty)

    val clusters = DedupPipeline.run(pages, cfg).clusters.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val found = truePairs.count { p =>
      val Seq(a, b) = p.toSeq
      clusters.get(a).isDefined && clusters.get(a) == clusters.get(b)
    }
    val recall = found.toDouble / truePairs.size
    assert(recall >= 0.99, s"recall=$recall over ${truePairs.size} true pairs")
  }

  test("property: cluster assignment invariant to row order and partition count") {
    val spark2 = spark
    import spark2.implicits._
    val pages = graft.io.SyntheticCorpus.pages(spark, 400)
    val cfg = DedupConfig(allowedLangs = Some(Set("en")), substringPass = false)
    def runOn(df: org.apache.spark.sql.DataFrame) =
      DedupPipeline.run(df, cfg).clusters.collect()
        .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).sorted.toSeq
    val base = runOn(pages)
    assert(runOn(pages.orderBy(F.rand(123))) === base)
    assert(runOn(pages.repartition(3)) === base)
  }
}
