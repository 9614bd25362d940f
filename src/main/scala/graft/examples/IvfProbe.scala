package graft.examples

import org.apache.spark.sql.SparkSession

import graft.analysis.Similarity

/** Recall grid for the IVF codebook variants:
  * `runMain graft.examples.IvfProbe [sfDir]`. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val exact = Similarity.bruteForceTopK(emb, 1)
      .select("vec_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    for (init <- Seq("sample", "kmeanspp"); rounds <- Seq(3, 8);
         topA <- Seq(1, 2, 3); nProbe <- Seq(2)) {
      val approx = Similarity.ivfTopK(emb, 1, numCentroids = 16, nProbe = nProbe,
        lloydRounds = rounds, init = init, assignTopA = topA)
        .select("vec_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val rec = approx.count { case (v, nn) => exact.get(v).contains(nn) }.toDouble / exact.size
      println(f"IVF init=$init%-9s rounds=$rounds%-2d topA=$topA nProbe=$nProbe recall@1=$rec%.3f")
    }
    spark.stop()
  }
}
