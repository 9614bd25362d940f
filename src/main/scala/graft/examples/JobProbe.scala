package graft.examples
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.dedup.{DedupConfig, DedupPipeline}
import graft.io.SyntheticCorpus

/** Prints every Spark job's wall time during one flagship pipeline run —
  * for attributing e2e time that the per-stage probes don't cover. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt; val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties.getProperty("callSite.short"))
          .getOrElse(j.stageInfos.lastOption.map(_.name).getOrElse("?"))
        starts.put(j.jobId, (System.nanoTime(),
          s"${j.stageInfos.size}st $site".take(70)))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, d) = starts.get(j.jobId)
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $d")
      }
    })
    // warmup
    val w = DedupPipeline.run(SyntheticCorpus.pages(spark, 5000),
      DedupConfig(allowedLangs = Some(Set("en"))))
    w.flagged.count(); w.cleanup()
    spark.catalog.clearCache()
    println("JOB --- warmup done ---")
    val t0 = System.nanoTime()
    val r = DedupPipeline.run(SyntheticCorpus.pages(spark, n),
      DedupConfig(allowedLangs = Some(Set("en"))))
    r.flagged.count()
    println(f"JOB TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
