package graft.io

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.{functions => F}

class ExternalProcessSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("pipeLines through tr matches the built-in upper() on every row") {
    val piped = ExternalProcess.pipeLines(
      docs.repartition(5), "text", "up", Seq("tr", "a-z", "A-Z"))
    val bad = piped.where(F.col("up") =!= F.upper(F.col("text")))
    assert(bad.count() === 0)
    assert(piped.count() === docs.count())
  }

  test("pipeLines raises when the filter is not line-preserving") {
    // grep drops non-matching lines → count mismatch must surface
    val e = intercept[SparkException] {
      ExternalProcess.pipeLines(
        docs.limit(50), "text", "g", Seq("grep", "zzz-not-present")).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("line") || msg.contains("exited"))
  }
}
