package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Parity + hot-fingerprint behavior of the substring pass's posting
  * strategies (the winnow twin of LshSpec's band-bucket parity tests). */
class SubstringDedupSpec extends SparkSpec {

  // small winnow params so short fixtures clear the guarantee floor
  private def cfg(strategy: String, cap: Int = 1000) = DedupConfig(
    winnowW = 8, winnowWin = 4, minSubstringChars = 11,
    hotBucketStrategy = strategy, maxFingerprintPostings = cap,
    containmentThreshold = 0.8)

  /** A deterministic "calm" corpus: planted containment pairs (text of
    * doc 2i is embedded verbatim in doc 2i+1) + unrelated fillers. */
  private def calmDocs: DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    // per-pair UNIQUE gibberish: no 8-gram is shared across pairs, so a
    // small posting cap never drops the pair-linking fingerprints
    def gibberish(seed: Int, n: Int): String =
      new scala.util.Random(seed).alphanumeric.take(n).mkString
    val rows = (0 until 30).flatMap { i =>
      val inner = gibberish(i, 80)
      Seq((2L * i, inner),
        (2L * i + 1, s"${gibberish(1000 + i, 20)} $inner ${gibberish(2000 + i, 20)}"))
    } ++ (100 until 120).map(i => (i.toLong, gibberish(3000 + i, i)))
    rows.toDF("doc_id", "text")
  }

  /** Hot corpus: calm pairs PLUS a site-wide boilerplate block shared
    * verbatim by many docs — every boilerplate gram's posting list is far
    * beyond the cap (the mega-key regime the salted strategy exists for). */
  private def hotDocs(copies: Int): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val boiler = "this exact legal boilerplate footer appears on every single page of the site"
    val hot = (0 until copies).map(i =>
      (1000L + i, s"$boiler article $i body text goes here"))
    calmDocs.unionByName(hot.toDF("doc_id", "text"))
  }

  private def edges(docs: DataFrame, c: DedupConfig): Seq[(Long, Long)] = {
    val out = SubstringDedup.substringEdges(docs, c)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    graft.Caches.release(spark)
    out
  }

  test("window, salted and auto emit identical edges on a calm corpus") {
    val w = edges(calmDocs, cfg("window"))
    val s = edges(calmDocs, cfg("salted"))
    val a = edges(calmDocs, cfg("auto"))
    assert(w.nonEmpty) // the planted containments are found
    assert(w === s)
    assert(w === a)
  }

  test("window, salted and auto emit identical edges on a hot corpus") {
    // cap 3, boilerplate shared by 40 docs → hot posting lists are 40
    // postings > 4×cap, so auto provably selects salted; the calm planted
    // pairs must still come out — the salted branch is parity-checked
    // against a NONEMPTY edge set while the mega-fingerprints are capped
    val docs = hotDocs(copies = 40)
    val w = edges(docs, cfg("window", cap = 3))
    val s = edges(docs, cfg("salted", cap = 3))
    val a = edges(docs, cfg("auto", cap = 3))
    assert(w.nonEmpty)
    assert(w === s)
    assert(w === a)
    // no edge among the boilerplate-only docs (their shared grams overflow
    // the cap; their bodies are distinct)
    assert(!a.exists { case (x, y) => x >= 1000L && y >= 1000L })
  }

  test("exact copies of a container still link through the LSH pass contract") {
    // substringEdges runs over one representative per distinct text: an
    // exact duplicate of a container contributes no NEW substring edge
    val spark2 = spark
    import spark2.implicits._
    val docs = calmDocs.unionByName(
      calmDocs.where($"doc_id" === 1L)
        .select(($"doc_id" + 5000L).as("doc_id"), $"text"))
    val base = edges(calmDocs, cfg("auto"))
    val dup = edges(docs, cfg("auto"))
    assert(base === dup)
  }
}
