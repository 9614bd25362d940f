package graft.examples

import org.apache.spark.sql.SparkSession
import graft.dedup.{DedupConfig, DedupPipeline}
import graft.io.SyntheticCorpus

/** A/B wall-clock probe of pipeline configuration axes at one core count.
  * Usage: runMain graft.examples.AbProbe <cores> <nDocs> <axis>
  * where axis ∈ {strategy, remap}. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt; val n = args(1).toLong; val axis = args(2)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(cfg: DedupConfig, m: Long): Unit = {
      val r = DedupPipeline.run(SyntheticCorpus.pages(spark, m), cfg)
      r.flagged.count()
      r.cleanup()
    }
    val base = DedupConfig(allowedLangs = Some(Set("en")))
    val variants: Seq[(String, DedupConfig)] = axis match {
      case "strategy" => Seq(
        "auto" -> base.copy(hotBucketStrategy = "auto"),
        "salted" -> base.copy(hotBucketStrategy = "salted"),
        "window" -> base.copy(hotBucketStrategy = "window"))
      case "remap" => Seq(
        "remap2" -> base.copy(idRemapRounds = 2),
        "remap1" -> base.copy(idRemapRounds = 1))
      case other => sys.error(s"unknown axis $other")
    }
    once(base, 5000) // warmup
    spark.catalog.clearCache()
    // alternate to keep a noisy episode from biasing one variant
    for (round <- 1 to 2; (label, cfg) <- variants) {
      val t0 = System.nanoTime()
      once(cfg, n)
      println(f"AB $label round=$round sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
