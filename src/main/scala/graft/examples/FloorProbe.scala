package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.dedup.{DedupConfig, DedupPipeline}
import graft.io.SyntheticCorpus

/** Job-timeline probe for the flagship pipeline's SERIAL FLOOR — the
  * core-count-independent seconds per run (driver planning, scheduler
  * round-trips, per-round CC latency) that bound scaling efficiency at
  * small corpora: eff = (F+W)/(4F+W), so F must stay ≤ W/11 for ≥0.8.
  *
  * Prints, for one timed pipeline run after a warmup run: every job's
  * submit offset, duration and description; the wall; the sum of job
  * durations; and the dead time (wall − union of job intervals) — the
  * pure driver-side floor no executor ever sees.
  *
  * `runMain graft.examples.FloorProbe <nDocs> <cores>`
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    val cores = if (args.length > 1) args(1).toInt else 4
    val localDir = "/dev/shm/spark-local"
    Files.createDirectories(Paths.get(localDir))
    // FLOOR_PROBE_CLUSTER=1: run the identical timeline instrument on a
    // real local-cluster of <cores> single-core executor JVMs (the bench's
    // scaling-mode topology) so the cluster-mode floor decomposes into the
    // same per-job spans as the thread-mode one.
    val clusterMode = sys.env.getOrElse("FLOOR_PROBE_CLUSTER", "0") == "1"
    val builder = SparkSession.builder()
      .config("spark.sql.shuffle.partitions",
        if (clusterMode) "8" else math.max(cores, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.fraction", "0.6")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
    if (clusterMode) {
      val memMb = 8192
      val classesDir = sys.env.getOrElse("CLUSTER_PROBE_CLASSES",
        "/root/repo/target/scala-2.13/classes")
      builder.master(s"local-cluster[$cores,1,$memMb]")
        .config("spark.locality.wait",
          sys.env.getOrElse("CLUSTER_PROBE_LOCALITY_WAIT", "3s"))
        .config("spark.executor.memory", s"${memMb}m")
        .config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.extraJavaOptions",
          "--add-opens=java.base/java.lang=ALL-UNNAMED " +
            "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED " +
            "--add-opens=java.base/java.nio=ALL-UNNAMED " +
            "--add-opens=java.base/java.util=ALL-UNNAMED " +
            "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED " +
            "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED " +
            s"-Xms${memMb}m")
    } else builder.master(s"local[$cores]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobSpan(id: Int, desc: String, t0: Long, var t1: Long)
    val spans = new java.util.concurrent.ConcurrentHashMap[Int, JobSpan]
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (recording.get) {
          val desc = j.stageInfos.lastOption.map(_.name)
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description"))))
            .getOrElse("?")
          spans.put(j.jobId, JobSpan(j.jobId, desc.take(90), System.nanoTime(), -1L))
        }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(spans.get(j.jobId)).foreach(_.t1 = System.nanoTime())
    })

    def run(m: Long): Unit = {
      val r = DedupPipeline.run(SyntheticCorpus.pages(spark, m),
        DedupConfig(allowedLangs = Some(Set("en"))))
      r.flagged.count(); r.cleanup()
    }
    run(math.max(1000L, n / 5)) // warmup: JIT + codegen caches
    spark.catalog.clearCache()

    recording.set(true)
    val t0 = System.nanoTime()
    run(n)
    val wall = (System.nanoTime() - t0) / 1e9
    recording.set(false)

    import scala.jdk.CollectionConverters._
    val done = spans.values.asScala.filter(_.t1 > 0).toSeq.sortBy(_.t0)
    println(f"%nFLOOR cores=$cores docs=$n wall=$wall%.2f s jobs=${done.size}")
    var prevEnd = t0
    for (s <- done) {
      val gap = (s.t0 - prevEnd) / 1e9
      val off = (s.t0 - t0) / 1e9
      val dur = (s.t1 - s.t0) / 1e9
      println(f"  +$off%6.2f dur=$dur%6.2f gap=$gap%6.2f  [${s.id}%3d] ${s.desc}")
      prevEnd = math.max(prevEnd, s.t1)
    }
    // dead time: wall minus the union of job intervals (overlapping
    // concurrent jobs counted once) = time with NO job in flight
    val sorted = done.map(s => (s.t0, s.t1)).sortBy(_._1)
    var covered = 0L
    var cursor = t0
    for ((a, b) <- sorted) {
      val lo = math.max(a, cursor)
      if (b > lo) { covered += b - lo; cursor = b }
    }
    val jobSum = done.map(s => s.t1 - s.t0).sum / 1e9
    println(f"FLOOR job-sum=$jobSum%.2f s covered=${covered / 1e9}%.2f s dead=${wall - covered / 1e9}%.2f s")
    spark.stop()
  }
}
