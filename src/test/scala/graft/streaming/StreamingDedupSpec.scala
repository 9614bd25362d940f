package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
class StreamingDedupSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("dedupStream: first arrival wins across micro-batches, watermark bounds state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val docs = input.toDF().toDF("url", "text", "ts")
    val q = StreamingDedup.dedupStream(docs, "ts", "10 minutes")
      .select("url")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    input.addData(("u1", "hello world doc one", ts(0)),
      ("u2", "totally different text", ts(1)),
      ("u3", "hello world doc one", ts(2))) // dup of u1, same batch
    q.processAllAvailable()
    input.addData(("u4", "Hello   WORLD doc one", ts(3))) // dup after normalization
    q.processAllAvailable()
    input.addData(("u5", "brand new content here", ts(4)))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_out").collect().map(_.getString(0)).toSet
    assert(kept === Set("u1", "u2", "u5"))
  }

  test("flagStream: copies flagged as duplicates, originals pass") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val docs = input.toDF().toDF("url", "text", "ts")
    val q = StreamingDedup.flagStream(docs, "ts", "10 minutes")
      .writeStream.format("memory").queryName("flag_out")
      .outputMode("append").start()

    input.addData(("a1", "the quick brown fox", ts(0)),
      ("a2", "the quick brown fox", ts(1)),
      ("a3", "jumps over the lazy dog", ts(1)))
    q.processAllAvailable()
    input.addData(("a4", "the quick brown fox", ts(2)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("flag_out").collect()
      .map(r => r.getAs[String]("url") -> r.getAs[Boolean]("is_duplicate")).toMap
    assert(rows === Map("a1" -> false, "a2" -> true, "a3" -> false, "a4" -> true))
  }
}
