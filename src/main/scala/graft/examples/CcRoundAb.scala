package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** A/B probe: one CC round in the round-5 shape (large-star window +
  * small-star window + distinct; 3 exchanges) vs the round-6 shape
  * (large-star window + small-star groupBy/collect_set; 2 exchanges),
  * timed over repeated rounds on the q_cc_chain edge graph.
  * Usage: runMain graft.examples.CcRoundAb [sfDir] [rounds] */
object CcRoundAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nRounds = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val edges0 = d.select(F.col("doc_id").as("u"),
      F.lead("doc_id", 1).over(
        Window.partitionBy("source").orderBy("doc_id")).as("v"))
      .where(F.col("v").isNotNull)
      .select(F.greatest($"u", $"v").as("u"), F.least($"u", $"v").as("v"))
      .distinct().localCheckpoint(true)

    def largeStar(edges: DataFrame): DataFrame = {
      val w = Window.partitionBy("u")
      val sym = edges.select($"u", $"v").union(edges.select($"v".as("u"), $"u".as("v")))
      sym.withColumn("m", F.least($"u", F.min($"v").over(w)))
        .where($"v" > $"u").select($"v".as("u"), $"m".as("v")).where($"u" =!= $"v")
    }
    def ssOld(edges: DataFrame): DataFrame = {
      val w = Window.partitionBy("u")
      val or = edges.select(F.greatest($"u", $"v").as("u"), F.least($"u", $"v").as("v"))
      or.withColumn("m", F.min($"v").over(w))
        .select(F.explode(F.array(
          F.struct($"v".as("u"), $"m".as("v")),
          F.struct($"u".as("u"), $"m".as("v")))).as("e"))
        .select($"e.u".as("u"), $"e.v".as("v"))
        .where($"u" =!= $"v").distinct()
    }
    def ssNew(edges: DataFrame): DataFrame = {
      val grouped = edges.select(F.greatest($"u", $"v").as("u"), F.least($"u", $"v").as("v"))
        .groupBy($"u").agg(F.collect_set($"v").as("vs"))
        .select($"u", $"vs", F.array_min($"vs").as("m"))
      grouped.select(F.explode(F.concat(F.array($"u"), $"vs")).as("x"), $"m")
        .where($"x" =!= $"m").select($"x".as("u"), $"m".as("v"))
    }
    def sigOld(e: DataFrame): Unit = {
      e.select(F.xxhash64($"u", $"v").as("h"))
        .agg(F.count(F.lit(1)), F.coalesce(F.expr("bit_xor(h)"), F.lit(0L))).head()
    }

    for (pass <- 1 to 2; form <- Seq("old", "new")) {
      var cur = edges0
      var prev: DataFrame = null
      val t0 = System.nanoTime()
      for (_ <- 1 to nRounds) {
        val next = (if (form == "old") ssOld(largeStar(cur)) else ssNew(largeStar(cur)))
          .localCheckpoint(false)
        sigOld(next)
        if (prev != null) prev.unpersist(false)
        prev = next
        cur = next
      }
      println(f"CC-AB pass=$pass form=$form $nRounds rounds: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (prev != null) prev.unpersist(false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
