package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.dedup.{ConnectedComponents, DedupConfig, DedupPipeline, Lsh, SubstringDedup}
import graft.io.SyntheticCorpus

/** Phase-level decomposition of the flagship pipeline's job count and
  * wall — which phases carry the ~100 AQE stage-jobs that form the
  * serial floor. `runMain graft.examples.FloorPhases <nDocs> <cores>` */
object FloorPhases {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    val cores = if (args.length > 1) args(1).toInt else 4
    val localDir = "/dev/shm/spark-local"
    Files.createDirectories(Paths.get(localDir))
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.fraction", "0.6")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val detail = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val name = j.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}:${si.numTasks}")
          .mkString("+")
        starts.put(j.jobId, (System.nanoTime(), name.take(120)))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(starts.remove(j.jobId)).foreach { case (t0, name) =>
          detail.add(f"      [${j.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%6.3f s $name")
        }
      }
    })

    // warmup
    { val r = DedupPipeline.run(SyntheticCorpus.pages(spark, math.max(1000L, n / 5)),
        DedupConfig(allowedLangs = Some(Set("en"))))
      r.flagged.count(); r.cleanup() }
    spark.catalog.clearCache()

    val cfg = DedupConfig(allowedLangs = Some(Set("en")))
    val verbose = sys.env.contains("FLOOR_PHASES_VERBOSE")
    def phase[T](label: String)(f: => T): T = {
      val j0 = jobs.get; val t0 = System.nanoTime()
      detail.clear()
      val r = f
      println(f"PHASE $label%-22s jobs=${jobs.get - j0}%3d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      if (verbose) { detail.forEach(println(_)); detail.clear() }
      r
    }

    val pages = SyntheticCorpus.pages(spark, n)
    val (sigsAllRaw, _) = DedupPipeline.signatures(pages, cfg)
    val sigsAll = phase("signatures+truncate") {
      val s = graft.Caches.truncate(sigsAllRaw
        .select("doc_id", "text", "minhash", "simhash", "reject_reason"))
      s.count(); s
    }
    val sigs = sigsAll.where($"minhash".isNotNull)
    val sigCols = graft.Caches.track(sigs.select("doc_id", "minhash", "simhash"))
    val scored = phase("lsh+verify") {
      val (pairs, _) = Lsh.candidatePairs(sigCols, cfg)
      val s = graft.Caches.truncate(Lsh.verifyPairs(pairs, sigCols, cfg))
      s.count(); s
    }
    val substr = phase("substring") {
      val s = graft.Caches.truncate(
        SubstringDedup.substringEdges(sigs.select($"doc_id", $"text"), cfg))
      s.count(); s
    }
    val edges = scored.where($"verified").select($"a", $"b").union(substr.select($"a", $"b"))
    val assign = phase("connected_components") {
      val a = ConnectedComponents.run(edges); a.count(); a
    }
    val flags = phase("winner_flags") {
      val f0 = DedupPipeline.winnerFlags(sigs, assign, cfg); f0.count(); f0
    }
    phase("emission_join") {
      val wide = sigsAllRaw.where($"reject_reason".isNull)
        .drop("minhash", "simhash", "reject_reason")
      wide.join(flags.hint("shuffle_hash"), "doc_id").count()
    }
    phase("report_aggs") {
      val aggs = Seq(F.count(F.lit(1)),
        F.coalesce(F.sum(F.when($"verified", 1L).otherwise(0L)), F.lit(0L))) ++
        DedupPipeline.distanceHistogramAggs
      scored.agg(aggs.head, aggs.tail: _*).head()
      sigsAll.groupBy("reject_reason")
        .agg(F.count(F.lit(1)).as("n"), F.count($"minhash").as("nsig")).collect()
      substr.count()
    }
    println(f"TOTAL jobs=${jobs.get}")
    spark.stop()
  }
}
