package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession

/** Job/stage-count probe for the ConnectedComponents loop on the
  * q_cc_chain edge graph. Usage: runMain graft.examples.CcProbe [sfDir] */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val edges = d.select(F.col("doc_id").as("u"),
      F.lead("doc_id", 1).over(
        Window.partitionBy("source").orderBy("doc_id")).as("v"))
      .where(F.col("v").isNotNull)
    for (round <- 1 to 3) {
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val assign = graft.dedup.ConnectedComponents.run(edges)
      val n = assign.count()
      println(f"CC-PROBE round=$round wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"jobs=${jobs.get} stages=${stages.get} rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
