package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.ExplainMode

import graft.dedup.{DedupConfig, DedupPipeline, Lsh, SubstringDedup}
import graft.io.SyntheticCorpus

/** Plan captures for operator internals that the query-level snapshots
  * cannot show: q_minhash_lsh_dedup and the flagship pipeline run their
  * LSH/verify/CC machinery eagerly (checkpointed) during query
  * CONSTRUCTION, so plans/r06/q_minhash_* only contains the final
  * assignment join. This dumps the formatted plans of the operators
  * themselves — candidate generation (counts → eligibility join) and the
  * stacked verify join (build side = the pair frame) — over the
  * synthetic corpus. Usage: runMain graft.examples.OperatorPlanSnap
  * <outDir> <suffix> [nDocs] */
object OperatorPlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val n = if (args.length > 2) args(2).toLong else 20000L
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val cfg = DedupConfig(allowedLangs = Some(Set("en")))
    val (sigsAll, _) = DedupPipeline.signatures(SyntheticCorpus.pages(spark, n), cfg)
    val sigs = graft.Caches.truncate(sigsAll.where(F.col("minhash").isNotNull)
      .select("doc_id", "text", "minhash", "simhash"))
    val sigCols = sigs.select("doc_id", "minhash", "simhash")
    def snap(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
        df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
    }
    val (pairs, overflow) = Lsh.candidatePairs(sigCols, cfg)
    snap("op_lsh_candidatePairs", pairs)
    snap("op_lsh_overflow", overflow)
    snap("op_lsh_verifyPairs", Lsh.verifyPairs(pairs, sigCols, cfg))
    snap("op_substring_edges",
      SubstringDedup.substringEdges(sigs.select("doc_id", "text"), cfg))
    spark.stop()
  }
}
