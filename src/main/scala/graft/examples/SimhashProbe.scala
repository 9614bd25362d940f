package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.analysis.NgramJaccard
import graft.dedup.SimHashJoin

/** Stage-level timing of q_simhash_dup_pairs' two halves (votes/signature
  * aggregation vs pigeonhole join), to attribute session-cold overhead:
  * `runMain graft.examples.SimhashProbe /root/testdata/sf0.1`. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def sigsOf: DataFrame = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      val all = d.unionByName(
        d.where(F.col("doc_id") % 10 === 0)
          .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text")))
      val grams = all
        .select(F.col("doc_id"),
          F.explode(NgramJaccard.ngrams(F.col("text"), 3)).as("gram"))
        .select(F.col("doc_id"),
          F.conv(F.substring(F.md5(F.encode(F.col("gram"), "UTF-8")), 1, 15), 16, 10)
            .cast("long").as("hv"))
      val voteCols = (0 until 60).map(b =>
        F.sum(F.when(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"v$b"))
      val votes = grams.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      votes.select(F.col("doc_id"),
        (0 until 60).map(b => F.when(F.col(s"v$b") > 0, F.lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("sim"))
    }

    // variant B: ones-count arithmetic (sum of raw bits, no CASE), bit set
    // iff 2*ones > n — same values as the ±1 vote sums
    def sigsArith: DataFrame = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      val all = d.unionByName(
        d.where(F.col("doc_id") % 10 === 0)
          .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text")))
      val grams = all
        .select(F.col("doc_id"),
          F.explode(NgramJaccard.ngrams(F.col("text"), 3)).as("gram"))
        .select(F.col("doc_id"),
          F.conv(F.substring(F.md5(F.encode(F.col("gram"), "UTF-8")), 1, 15), 16, 10)
            .cast("long").as("hv"))
      val oneCols = (0 until 60).map(b =>
        F.sum(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1L))).as(s"o$b"))
      val votes = grams.groupBy("doc_id")
        .agg(oneCols.head, (oneCols.tail :+ F.count(F.lit(1)).as("n")): _*)
      votes.select(F.col("doc_id"),
        (0 until 60).map(b =>
          F.when(F.col(s"o$b") * 2 > F.col("n"), F.lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("sim"))
    }

    for (round <- 1 to 2) {
      val sigs = sigsOf.cache()
      timed(s"r$round-votes")(sigs.write.mode("overwrite").format("noop").save())
      timed(s"r$round-join") {
        SimHashJoin.nearPairs(sigs, maxHamming = 3, maxChunkPostings = Long.MaxValue)
          .write.mode("overwrite").format("noop").save()
      }
      sigs.unpersist()
      val sa = sigsArith.cache()
      timed(s"r$round-votes-arith")(sa.write.mode("overwrite").format("noop").save())
      sa.unpersist()
    }
    spark.stop()
  }
}
