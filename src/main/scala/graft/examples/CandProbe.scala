package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import graft.dedup.{DedupConfig, DedupPipeline, Lsh}
import graft.io.SyntheticCorpus

/** Isolated timing + plan of Lsh.candidatePairs / verifyPairs over the
  * synthetic corpus — A/B instrument for the auto-strategy shape. */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val cores = if (args.length > 1) args(1).toInt else 1
    val what = if (args.length > 2) args(2) else "auto"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cfg = DedupConfig(allowedLangs = Some(Set("en")),
      hotBucketStrategy = what)
    val pages = SyntheticCorpus.pages(spark, n)
    val (sigsAll0, _) = DedupPipeline.signatures(pages, cfg)
    val sigs = graft.Caches.truncate(
      sigsAll0.where($"minhash".isNotNull)
        .select("doc_id", "minhash", "simhash"))
    sigs.count()
    val reps = sys.env.getOrElse("CAND_REPS", "2").toInt
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val (pairs, _) = Lsh.candidatePairs(sigs, cfg)
      val np = pairs.count()
      val t1 = System.nanoTime()
      println(f"CAND rep=$rep strategy=$what pairs=$np wall=${(t1 - t0) / 1e9}%.2f s")
      if (rep == 1 && sys.env.getOrElse("CAND_EXPLAIN", "0") == "1")
        println(pairs.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
