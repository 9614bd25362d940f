package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.dedup.{DedupConfig, DedupPipeline}
import graft.io.SyntheticCorpus

/** Like [[ScaleProbe]], but each level is a REAL multi-executor local
  * cluster (`local-cluster[n,1,mem]`): n executor JVMs with their own
  * heaps, GC, and netty shuffle — the literal shape of the north_rule's
  * "N and 4N executors" criterion, rather than N threads sharing one
  * heap. `runMain graft.examples.ClusterScaleProbe <nDocs> <exec1>
  * [exec2 ...]` — each level gets a fresh cluster; executor classes come
  * from spark.executor.extraClassPath (sbt target dir).
  */
object ClusterScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 25000L
    val levels = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4)
    val memMb = sys.env.getOrElse("CLUSTER_PROBE_EXEC_MB", "8192").toInt
    // A/B knob: size each executor JVM's internal thread pools (GC, JIT,
    // netty — all derived from availableProcessors) to its 1-core
    // allocation instead of the 32-core host, the way a cgroup-limited
    // real cluster container would. "0" = host-sized (status quo).
    val apc = sys.env.getOrElse("CLUSTER_PROBE_APC", "0").toInt
    val apcOpts =
      if (apc > 0) s" -XX:ActiveProcessorCount=$apc -XX:+UseG1GC" else ""
    // A/B knob: spark.locality.wait. Delay scheduling only ever DELAYS the
    // multi-executor level (cached tracked frames + reduce-side map-output
    // locality give tasks preferred executors; a free slot elsewhere waits
    // up to this long per locality tier) — the single-executor level is
    // trivially all-local. "" = Spark default (3s).
    val localityWait = sys.env.getOrElse("CLUSTER_PROBE_LOCALITY_WAIT", "")
    // A/B knob: arbitrary extra session confs, "k=v;k=v" — for floor
    // experiments (shuffle partitions, AQE coalescing, scheduler) without
    // a recompile per hypothesis.
    val extraConf = sys.env.getOrElse("CLUSTER_PROBE_CONF", "")
      .split(';').filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq
    // A/B knob: executor -Xms (MB). Full-heap -Xms means allocation-time
    // page zeroing of the whole heap lands in the runs; a small -Xms only
    // commits what the runs actually use.
    val xmsMb = sys.env.getOrElse("CLUSTER_PROBE_XMS_MB", memMb.toString).toInt
    val classesDir = sys.env.getOrElse("CLUSTER_PROBE_CLASSES",
      "/root/repo/target/scala-2.13/classes")
    val localDir = "/dev/shm/spark-local"
    Files.createDirectories(Paths.get(localDir))
    var warmed = false
    for (execs <- levels) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val builder0 = SparkSession.builder()
      if (localityWait.nonEmpty) builder0.config("spark.locality.wait", localityWait)
      extraConf.foreach { case (k, v) => builder0.config(k, v) }
      val spark = builder0
        .master(s"local-cluster[$execs,1,$memMb]")
        .appName(s"graft-cluster-scale-$execs")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.memory.fraction", "0.6")
        .config("spark.local.dir", localDir)
        .config("spark.executor.memory", s"${memMb}m")
        .config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.extraJavaOptions",
          "--add-opens=java.base/java.lang=ALL-UNNAMED " +
            "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED " +
            "--add-opens=java.base/java.nio=ALL-UNNAMED " +
            "--add-opens=java.base/java.util=ALL-UNNAMED " +
            "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED " +
            "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED " +
            s"-Xms${xmsMb}m$apcOpts")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def run(m: Long): Unit = {
        val r = DedupPipeline.run(SyntheticCorpus.pages(spark, m),
          DedupConfig(allowedLangs = Some(Set("en"))))
        r.flagged.count(); r.cleanup()
      }
      // warmup every level: a fresh cluster's executors JIT from zero
      run(math.max(1000L, n / 10))
      spark.catalog.clearCache()
      // in-session repeats (CLUSTER_PROBE_REPS, default 1): the first
      // timed run at full size carries a first-run-at-size penalty
      // (executor heap growth, shuffle-file creation) that the bench's
      // own block schedule amortizes with B2 — min-of-reps mirrors it
      val reps = sys.env.getOrElse("CLUSTER_PROBE_REPS", "1").toInt
      for (rep <- 1 to reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        run(n)
        println(f"CLUSTER-SCALE execs=$execs docs=$n rep=$rep wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
        System.gc()
      }
      spark.stop()
    }
  }
}
