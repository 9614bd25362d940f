package graft.analysis

import graft.SparkSpec

class NgramJaccardSpec extends SparkSpec {

  test("indexed and pairwise forms emit identical pair scores on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    val a = canon(NgramJaccard.pairwise(docs, "source", 3))
    val b = canon(NgramJaccard.indexed(docs, "source", 3))
    assert(a.nonEmpty)
    assert(a === b)
    // zero-overlap pairs are present in both (left-join path exercised)
    assert(a.exists(_._3 == 0L) === b.exists(_._3 == 0L))
  }
}
