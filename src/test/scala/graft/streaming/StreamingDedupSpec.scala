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

  test("nearDupPairsStream: near-dups found across micro-batches, unrelated pages are not") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.DedupConfig
    import graft.io.SyntheticCorpus

    // planted corpus rows streamed with synthetic event times: id 16 is a
    // near-dup (1-2 word edits) of id 11, id 14 an exact copy of id 13
    def page(id: Long, min: Int): (String, String, Timestamp) = {
      val p = SyntheticCorpus.pageAt(42L, id)
      (p.url, p.text, ts(min))
    }
    val cfg = DedupConfig(allowedLangs = None)
    val input = MemoryStream[(String, String, Timestamp)]
    val docs = input.toDF().toDF("url", "text", "ts")
    val q = StreamingDedup.nearDupPairsStream(docs, "ts", "30 minutes", cfg)
      .writeStream.format("memory").queryName("near_out")
      .outputMode("append").start()

    input.addData(page(11, 0), page(13, 1), page(0, 1), page(1, 2))
    q.processAllAvailable()
    // the dups arrive in LATER micro-batches → found via bucket state
    input.addData(page(16, 3), page(14, 4))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("near_out").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // doc ids are xxhash64(seed, url) — recompute for the planted pages
    val hash = Seq(11L, 13L, 16L, 14L).map { i =>
      i -> spark.sql(
        s"SELECT xxhash64(${cfg.seed}L, '${SyntheticCorpus.pageAt(42L, i).url}')")
        .head().getLong(0)
    }.toMap
    def pair(a: Long, b: Long) =
      (math.min(hash(a), hash(b)), math.max(hash(a), hash(b)))
    assert(ids.contains(pair(11, 16)), s"missing near pair in $ids")
    assert(ids.contains(pair(13, 14)), s"missing exact pair in $ids")
    assert(ids.size === 2, s"unexpected extra pairs: $ids")
    val js = spark.table("near_out").collect().map(_.getAs[Double]("est_jaccard"))
    assert(js.forall(_ >= cfg.tau))
  }

  test("nearDupPairsStreamKeyed: ids-only bucket state finds the same pairs as the signature-in-bucket variant") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.DedupConfig
    import graft.io.SyntheticCorpus

    def page(id: Long, min: Int): (String, String, Timestamp) = {
      val p = SyntheticCorpus.pageAt(42L, id)
      (p.url, p.text, ts(min))
    }
    val cfg = DedupConfig(allowedLangs = None)
    val input = MemoryStream[(String, String, Timestamp)]
    val docs = input.toDF().toDF("url", "text", "ts")
    // scoped escape hatch (see the operator's scaladoc): the analyzer
    // flags any stateful op after fMGWS; the operator upholds the
    // watermark contract, and the helper restores the conf after start.
    // distinctPairs chained on top = ONE emission per pair per window.
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(checkKey, "true")
    val q = StreamingDedup.withStatefulCheckDisabled(spark) {
      StreamingDedup.distinctPairs(
        StreamingDedup.nearDupPairsStreamKeyed(docs, "ts", "30 minutes", cfg))
        .writeStream.format("memory").queryName("near_keyed_out")
        .outputMode("append").start()
    }
    // the helper restored the session conf; only the started query is exempt
    assert(spark.conf.get(checkKey) === "true")

    input.addData(page(11, 10), page(13, 11), page(0, 11), page(1, 12))
    q.processAllAvailable()
    // dups arrive in LATER micro-batches → candidates via ids-only bucket
    // state, signatures recovered through the doc_id-keyed join state.
    // page 16 arrives OUT OF ORDER (event time min 5, OLDER than its
    // stored partner 11 at min 10, still inside the watermark): the
    // candidate must be stamped with the newest member time or the
    // verify interval join silently drops the pair.
    input.addData(page(16, 5), page(14, 12))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("near_keyed_out").collect()
    // cross-band dedup folded in: exactly one row per pair, not one per
    // shared band bucket
    assert(rows.length === 2, s"expected 2 deduped emissions, got ${rows.length}")
    val ids = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val hash = Seq(11L, 13L, 16L, 14L).map { i =>
      i -> spark.sql(
        s"SELECT xxhash64(${cfg.seed}L, '${SyntheticCorpus.pageAt(42L, i).url}')")
        .head().getLong(0)
    }.toMap
    def pair(a: Long, b: Long) =
      (math.min(hash(a), hash(b)), math.max(hash(a), hash(b)))
    assert(ids.contains(pair(11, 16)), s"missing near pair in $ids")
    assert(ids.contains(pair(13, 14)), s"missing exact pair in $ids")
    assert(ids.size === 2, s"unexpected extra pairs: $ids")
    val js = rows.map(_.getAs[Double]("est_jaccard"))
    assert(js.forall(_ >= cfg.tau))
  }
}
