package graft.examples

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

/** Stage-attribution probe for q_ngram_jaccard_pairs: times each piece of
  * NgramJaccard.indexed in isolation (noop-materialized) to locate the
  * wall. Usage: runMain graft.examples.NgramProbe [sfDir] */
object NgramProbe {
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
      println(f"NGRAM-PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val d0 = docs.select(F.col("doc_id"), F.col("source").as("blk"),
        graft.analysis.NgramJaccard.ngrams(F.col("text"), 3).as("g"))
        .withColumn("ng", F.size(F.col("g")).cast("long"))
      t("ngrams-only")(noop(d0))
      val d = d0.persist()
      t("cache-materialize")(noop(d))
      val postings = d.select(F.col("blk"), F.col("doc_id"), F.explode(F.col("g")).as("t"))
      t("postings-explode")(noop(postings))
      val grams = postings.groupBy("blk", "t")
        .agg(F.collect_list(F.col("doc_id")).as("ids"))
        .where(F.size(F.col("ids")) >= 2)
      t("gram-groupBy")(noop(grams))
      val shared = grams
        .select(F.explode(F.col("ids")).as("a"), F.col("ids"))
        .select(F.col("a"), F.explode(F.col("ids")).as("b"))
        .where(F.col("a") < F.col("b"))
        .groupBy(F.col("a").as("doc_a"), F.col("b").as("doc_b"))
        .agg(F.count(F.lit(1)).as("inter_size"))
      t("shared-pairs")(noop(shared))
      val sizes = d.select("blk", "doc_id", "ng")
      val allPairs = sizes.as("x").join(sizes.as("y"),
        F.col("x.blk") === F.col("y.blk") && F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").as("doc_a"), F.col("y.doc_id").as("doc_b"),
          F.col("x.ng").as("na"), F.col("y.ng").as("nb"))
      t("all-pairs")(noop(allPairs))
      val full = allPairs.join(shared, Seq("doc_a", "doc_b"), "left")
        .withColumn("inter_size", F.coalesce(F.col("inter_size"), F.lit(0L)))
        .select(F.col("doc_a"), F.col("doc_b"), F.col("inter_size"),
          (F.col("na") + F.col("nb") - F.col("inter_size")).as("union_size"))
      t("full-left-join")(noop(full))
      t("entry-query")(noop(graft.SparkEntry.queries("q_ngram_jaccard_pairs")(spark, dir)))
      graft.Caches.release(spark)
      d.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
