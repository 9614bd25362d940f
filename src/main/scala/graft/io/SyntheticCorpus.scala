package graft.io

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.functions.HashUtil.mix64

/** One synthetic Common-Crawl-style page + planted ground truth.
  * Schema prefix (url, warc_ts, html, text, lang) is exactly the
  * BASELINE.json `input_hint` table; `truth_*` columns are generator
  * provenance used only by tests/benchmarks. */
final case class SyntheticPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    truth_kind: String,
    truth_donor: Long)

/** Deterministic synthetic corpus generator — the engine's fixture
  * factory, mirroring the reference's planted test taxonomy
  * (reference/dupliganger/test/files/dedup/in/: `11_first_test` = uniques,
  * `12_one_dup_one_not` = one exact dup + one near-miss; see FIXTURES.md).
  *
  * Pure function of (seed, row id): no wall clock, no RNG state shared
  * across rows — so any scale regenerates identically on any cluster, and
  * tests/bench at two parallelism levels see byte-identical input.
  *
  * Layout: ids are generated in blocks of 20:
  *   id%20 ∈ 0..13  → unique page                     (70%)
  *   id%20 ∈ {14,15}→ exact duplicate of a unique     (10%)  donors 13,12
  *   id%20 ∈ {16,17}→ near duplicate (1-2 word edits) (10%)  donors 11,10
  *   id%20 = 18     → substring duplicate (embedded)  (5%)   donor 9
  *   id%20 = 19     → reject (empty text or lang)     (5%)
  * Expected clustering: five 2-doc clusters per block, everything else
  * singleton; truth pairs = (donor, dup).
  */
object SyntheticCorpus {

  private val ClassOffsets: Map[Int, Int] =
    Map(14 -> 1, 15 -> 3, 16 -> 5, 17 -> 7, 18 -> 9)
  // id%20==14 -> donor id-1 (class 13); 15 -> id-3 (12); 16 -> id-5 (11);
  // 17 -> id-7 (10); 18 -> id-9 (9)

  private val Epoch = 1704067200000L // 2024-01-01T00:00:00Z

  /** 512-word deterministic vocabulary (consonant-vowel syllables). */
  private val Vocab: Array[String] = {
    val cons = Array("b", "d", "f", "g", "k", "l", "m", "n")
    val vows = Array("a", "e", "i", "o")
    val out = for {
      a <- cons; x <- vows; b <- cons; y <- vows
    } yield a + x + b + y
    out // 8*4*8*4 = 1024; take distinct prefix
  }.distinct.take(512)

  private def rand(seed: Long, id: Long, slot: Long): Long =
    mix64(seed ^ mix64(id * 1000003L + slot))

  private def pick(seed: Long, id: Long, slot: Long, bound: Int): Int =
    (((rand(seed, id, slot) % bound) + bound) % bound).toInt

  /** Word sequence of the UNIQUE page with this id (donor material). */
  private def uniqueWords(seed: Long, id: Long): Array[String] = {
    val n = 150 + pick(seed, id, 0, 350)
    Array.tabulate(n)(w => Vocab(pick(seed, id, 100L + w, Vocab.length)))
  }

  def kindOf(id: Long): String = (id % 20) match {
    case 14 | 15 => "exact"
    case 16 | 17 => "near"
    case 18 => "substr"
    case 19 => "reject"
    case _ => "unique"
  }

  def donorOf(id: Long): Long =
    ClassOffsets.get((id % 20).toInt).map(off => id - off).getOrElse(-1L)

  def pageAt(seed: Long, id: Long): SyntheticPage = {
    val kind = kindOf(id)
    val donor = donorOf(id)
    val lang = if (kind == "reject" && rand(seed, id, 7) % 2 == 0) "xx" else "en"
    val text: String = kind match {
      case "unique" => uniqueWords(seed, id).mkString(" ")
      case "exact" => uniqueWords(seed, donor).mkString(" ")
      case "near" =>
        val ws = uniqueWords(seed, donor)
        val edits = if (ws.length < 250) 1 else 2
        var i = 0
        while (i < edits) {
          ws(pick(seed, id, 200L + i, ws.length)) = "zq" + pick(seed, id, 300L + i, 997)
          i += 1
        }
        ws.mkString(" ")
      case "substr" =>
        val inner = uniqueWords(seed, donor).mkString(" ")
        val padL = Array.tabulate(100 + pick(seed, id, 1, 100))(w =>
          Vocab(pick(seed, id, 400L + w, Vocab.length))).mkString(" ")
        val padR = Array.tabulate(100 + pick(seed, id, 2, 100))(w =>
          Vocab(pick(seed, id, 900L + w, Vocab.length))).mkString(" ")
        padL + " " + inner + " " + padR
      case "reject" =>
        if (lang == "xx") uniqueWords(seed, id).mkString(" ")
        else if (rand(seed, id, 8) % 2 == 0) "" else "   "
    }
    SyntheticPage(
      url = s"https://example.org/site${id % 97}/page$id",
      warc_ts = new Timestamp(Epoch + id * 1000L),
      html = ("<html><body>" + text + "</body></html>").getBytes("UTF-8"),
      text = text,
      lang = lang,
      truth_kind = kind,
      truth_donor = donor)
  }

  /** The pages table WITH truth columns (tests peel them off). */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[SyntheticPage] = {
    import spark.implicits._
    spark.range(n).map(id => pageAt(seed, id))
  }

  /** input_hint-shaped table only. */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    generate(spark, n, seed).toDF()
      .select("url", "warc_ts", "html", "text", "lang")

  /** Planted truth pairs (donor_id, dup_id, kind) for recall accounting.
    * Only pairs the pipeline is EXPECTED to find: exact, near, substr. */
  def truthPairs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n)
      .filter(id => id % 20 >= 14 && id % 20 <= 18)
      .map(id => (donorOf(id), id.toLong, kindOf(id)))
      .toDF("donor_id", "dup_id", "kind")
  }
}
