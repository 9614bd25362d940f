package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.dedup.{DedupConfig, DedupPipeline}
import graft.io.SyntheticCorpus

/** One-shot wall time of the flagship pipeline at each requested core
  * count (fresh session per level, Bench's memory-per-core fraction):
  * `runMain graft.examples.ScaleProbe <nDocs> <cores1> [cores2 ...]` */
object ScaleProbe {
  private def fraction(cores: Int): Double =
    math.max(0.1, math.min(0.6, 0.6 * cores / 8.0))

  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val levels = args.drop(1).map(_.toInt).toSeq
    val localDir = "/dev/shm/spark-local"
    Files.createDirectories(Paths.get(localDir))
    var warmed = false
    for (cores <- levels) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
        .config("spark.sql.adaptive.enabled",
          sys.env.getOrElse("SCALE_PROBE_AQE", "true"))
        .config("spark.memory.fraction",
          sys.env.getOrElse("SCALE_PROBE_FRAC", fraction(cores).toString))
        .config("spark.local.dir", localDir)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      if (sys.env.contains("SCALE_PROBE_JOBS")) {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            // Option guard: a dropped onJobStart (listener-bus overflow)
            // would otherwise unbox null into the Long arithmetic
            Option(starts.remove(j.jobId)).foreach { t0 =>
              println(f"  JOB ${j.jobId}%3d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
            }
        })
      }
      def run(m: Long): Unit = {
        val r = DedupPipeline.run(SyntheticCorpus.pages(spark, m),
          DedupConfig(allowedLangs = Some(Set("en"))))
        r.flagged.count(); r.cleanup()
      }
      if (!warmed) { run(math.max(1000L, n / 20)); warmed = true }
      spark.catalog.clearCache()
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      val gc0 = gcMs
      val t0 = System.nanoTime()
      run(n)
      println(f"SCALE cores=$cores docs=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"gc=${(gcMs - gc0) / 1000.0}%.2f s")
      spark.stop()
    }
  }
}
