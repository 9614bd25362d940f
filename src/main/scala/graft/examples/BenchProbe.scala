package graft.examples
import org.apache.spark.sql.SparkSession
import graft.dedup.{DedupConfig, DedupPipeline}
import graft.io.SyntheticCorpus
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt; val n = args(1).toLong
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores,8).toString)
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(m: Long): Unit = {
      val r = DedupPipeline.run(SyntheticCorpus.pages(spark, m), DedupConfig(allowedLangs=Some(Set("en"))))
      r.flagged.count()
    }
    once(5000); spark.catalog.clearCache()
    val t0 = System.nanoTime(); once(n)
    println(f"PROBE cores=$cores n=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
    spark.stop()
  }
}
