package graft.examples
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.storage.StorageLevel
import graft.dedup._
import graft.io.SyntheticCorpus
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt; val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores,8).toString)
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR","/dev/shm/spark-local"))
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 1.0)
          println(f"  TASKSTAGE id=${si.stageId}%4d tasks=${si.numTasks}%5d wall=$wall%7.1fs cpu=${si.taskMetrics.executorRunTime/1e3}%8.1fs gc=${si.taskMetrics.jvmGCTime/1e3}%6.1fs ${si.name.take(40)}")
      }
    })
    val cfg = DedupConfig(allowedLangs=Some(Set("en")))
    def tick(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"STAGE $label%-16s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$c")
    }
    val pages = SyntheticCorpus.pages(spark, n)
    tick("gen+nothing")(pages.count())
    val (sigsAll0, _) = DedupPipeline.signatures(pages, cfg)
    val sigsAll = sigsAll0.persist(StorageLevel.MEMORY_AND_DISK)
    tick("signatures")(sigsAll.count())
    val sigs = sigsAll.where($"minhash".isNotNull)
    val sigCols = sigs.select("doc_id","minhash","simhash")
    val (pairs, _) = Lsh.candidatePairs(sigCols, cfg)
    val scored = Lsh.verifyPairs(pairs, sigCols, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    tick("lsh+verify")(scored.count())
    val substr = SubstringDedup.substringEdges(sigs.select($"doc_id",$"text"), cfg).persist(StorageLevel.MEMORY_AND_DISK)
    tick("substring")(substr.count())
    val edges = scored.where($"verified").select($"a",$"b").union(substr.select($"a",$"b"))
    var assign: org.apache.spark.sql.DataFrame = null
    tick("cc"){ assign = ConnectedComponents.run(edges); assign.count() }
    val withCluster = sigs.join(assign.select($"id".as("doc_id"),$"component"), Seq("doc_id"),"left")
      .withColumn("cluster_id", F.coalesce($"component",$"doc_id")).drop("component")
    val ranked = withCluster.withColumn("rank", F.xxhash64(F.lit(cfg.canonicalSeed),$"url"))
    val winners = ranked.groupBy($"cluster_id").agg(F.min_by($"doc_id",F.struct($"rank",$"doc_id")).as("winner_id"))
    val flagged = ranked.join(winners,"cluster_id").withColumn("is_canonical",$"doc_id"===$"winner_id")
    tick("winner+flag")(flagged.count())
    spark.stop()
  }
}
