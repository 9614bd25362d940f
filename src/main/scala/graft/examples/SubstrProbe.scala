package graft.examples
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.dedup._
import graft.functions._
import graft.io.SyntheticCorpus
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt; val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores,8).toString)
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.local.dir","/dev/shm/spark-local")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig(allowedLangs=Some(Set("en")))
    val docs = DedupPipeline.signatures(SyntheticCorpus.pages(spark, n), cfg)._1
      .where(F.col("minhash").isNotNull).select("doc_id","text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def tick(l: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val c=f
      println(f"SUB $l%-12s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$c")
    }
    val eligible = docs.where(F.length(F.col("text")) >= cfg.minSubstringChars)
      .select(F.col("doc_id"), winnowedFingerprints(F.col("text"), cfg.winnowW, cfg.winnowWin, cfg.seed).as("fp"),
        F.length(F.col("text")).as("len"))
      .withColumn("nfp", F.size(F.col("fp"))).where(F.col("nfp") > 0)
    tick("winnow")(eligible.count())
    val postings = eligible.select(F.col("doc_id"), F.col("len"), F.col("nfp"), F.explode(F.col("fp")).as("f"))
    tick("explode")(postings.count())
    val counted = postings.withColumn("pn", F.count(F.lit(1)).over(Window.partitionBy("f")))
      .where(F.col("pn").between(2, cfg.maxFingerprintPostings))
    tick("window")(counted.count())
    val buckets = counted.groupBy("f").agg(F.collect_list(F.struct(F.col("doc_id"), F.col("len"), F.col("nfp"))).as("ms"))
    tick("buckets")(buckets.count())
    val cand0 = buckets.select(F.explode(F.col("ms")).as("x"), F.col("ms"))
      .select(F.col("x"), F.explode(F.col("ms")).as("y"))
      .where(F.col("x.len") < F.col("y.len") || (F.col("x.len") === F.col("y.len") && F.col("x.doc_id") < F.col("y.doc_id")))
    tick("pairexplode")(cand0.count())
    val cand = cand0.groupBy(F.col("x.doc_id").as("a"), F.col("y.doc_id").as("b"))
      .agg(F.count(F.lit(1)).as("shared"), F.first(F.col("x.nfp")).as("nfp_a"))
      .withColumn("containment", F.col("shared").cast("double") / F.col("nfp_a"))
      .where(F.col("containment") >= cfg.containmentThreshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tick("cand")(cand.count())
    val candDocs = cand.select(F.col("a").as("doc_id")).union(cand.select(F.col("b").as("doc_id"))).distinct()
    val needed = docs.join(candDocs, Seq("doc_id"), "left_semi")
      .select(F.col("doc_id"), F.lower(F.col("text")).as("t"))
    val verified = cand.join(needed.select(F.col("doc_id").as("a"), F.col("t").as("text_a")).hint("shuffle_hash"), "a")
      .join(needed.select(F.col("doc_id").as("b"), F.col("t").as("text_b")).hint("shuffle_hash"), "b")
      .where(F.col("text_b").contains(F.col("text_a")))
    tick("verify")(verified.count())
    spark.stop()
  }
}
