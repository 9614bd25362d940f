package graft.examples

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

import graft.dedup.{ConnectedComponents, DedupConfig, Lsh}
import graft.functions._

/** Phase-attribution probe for q_minhash_lsh_dedup at sf scale.
  * Usage: runMain graft.examples.MinhashPhases [sfDir] */
object MinhashPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MH-PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val cfg = DedupConfig(shingleK = 3, tau = 0.5)
      val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val all = d.unionByName(
        d.where(F.col("doc_id") % 10 === 0)
          .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text")))
      val sigs = graft.Caches.track(all.select(F.col("doc_id"),
        minhash(shingles(F.col("text"), cfg.shingleK, cfg.seed), cfg.numHashes, cfg.seed).as("minhash"),
        simhash(shingles(F.col("text"), cfg.shingleK, cfg.seed), cfg.seed).as("simhash")))
      t("sigs-materialize")(sigs.write.mode("overwrite").format("noop").save())
      val (pairs, _) = t("candidatePairs-plan+probe")(Lsh.candidatePairs(sigs, cfg))
      val p = t("pairs-materialize")({ val x = pairs.localCheckpoint(false); x.count(); x })
      val scored = t("verify")({ val x = Lsh.verifyPairs(p, sigs, cfg).localCheckpoint(false); x.count(); x })
      val edges = scored.where(F.col("verified")).select("a", "b")
      val assign = t("cc")(ConnectedComponents.run(edges))
      t("final-join")(all.join(assign.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(F.col("doc_id"),
          F.coalesce(F.col("component"), F.col("doc_id")).as("cluster_id"))
        .write.mode("overwrite").format("noop").save())
      graft.Caches.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
