package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Text-analysis column builders for training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  * All pure built-in expressions (codegen'd, no UDFs) so filters composed
  * from them push down and stay in whole-stage codegen.
  *
  * Counterpart of the reference's per-record quality filters
  * (reference/dupliganger/barcode_split_quality_filter_umi_anno.py:362-403):
  * there sliding-window phred-quality and whitelist checks; here
  * length/token/stopword statistics over web text.
  */
object TextAnalysis {

  /** Whitespace-token array with empty tokens removed. */
  def tokens(text: Column): Column =
    F.filter(F.split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = F.size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    F.size(F.array_distinct(tokens(text))).cast("long")

  /** Lexical-diversity permille: floor(1000 * distinct / total). Double
    * division + floor — the oracle replays the identical IEEE sequence. */
  def diversityPermille(text: Column): Column = {
    val t = tokenCount(text)
    F.when(t > 0,
      F.floor(F.lit(1000) * distinctTokenCount(text) / t).cast("long"))
  }

  /** Whitespace spelled as an explicit class: Java's `\s` and RE2's `\s`
    * (DuckDB) disagree on vertical tab, so `\s` in an oracle-mirrored
    * expression would diverge between engines on \x0B. */
  private val Ws = " \\t\\n\\x0B\\f\\r"

  /** Punctuation density permille: floor(1000 · punct_chars / chars). */
  def punctPermille(text: Column): Column = {
    val n = F.length(text)
    F.when(n > 0,
      F.floor(F.lit(1000) * F.regexp_count(text, F.lit(s"[^A-Za-z0-9$Ws]")) / n)
        .cast("long"))
  }

  /** English stopword-token density permille — the classic quality-score
    * component (natural prose ≈ 300-600‰; keyword spam / boilerplate
    * lists ≈ 0). Token-exact (not substring hits). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for")

  def stopwordPermille(text: Column): Column = {
    val t = tokens(text)
    F.when(F.size(t) > 0,
      F.floor(F.lit(1000) *
        F.size(F.filter(t, w => w.isin(EnglishStopwords: _*))) / F.size(t))
        .cast("long"))
  }

  /** A BPE-ish token estimate: words + digits runs + punctuation marks
    * (regexp-based; the whitespace count underestimates sub-word splits). */
  def tokenEstimateBpe(text: Column): Column =
    F.regexp_count(text, F.lit(s"[A-Za-z]+|[0-9]+|[^A-Za-z0-9$Ws]")).cast("long")

  /** Count of occurrences of a literal word (word-boundary regex). */
  def wordHits(text: Column, word: String): Column =
    F.regexp_count(text, F.lit("\\b" + word + "\\b")).cast("long")

  /** Tiny n-gram-flavored language-ID heuristic: count stopword hits per
    * language, pick the argmax (ties → 'und'). Deterministic and
    * SQL-expressible, so the oracle can replay it. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "des"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, ws) =>
      lang -> ws.map(w => wordHits(text, w)).reduce(_ + _)
    }

  /** Canonical document fingerprint: md5 of case-folded,
    * whitespace-collapsed text. (The cheap exact-dedup signature; the
    * reference's location_key analog at its crudest.) */
  def fingerprint(text: Column): Column =
    F.md5(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")).cast("binary"))

  /** Sliding-window minimum quality — the LITERAL analog of the
    * reference's windowed quality filter (reference/dupliganger/
    * barcode_split_quality_filter_umi_anno.py:378-403: mean phred over a
    * sliding window, reject when the minimum window mean drops below a
    * floor). Here the per-token score is its alphabetic-character count,
    * the window statistic is the alpha-density permille of `win`
    * consecutive tokens, and the document score is the MINIMUM over all
    * window starts — a run of `win` garbage tokens tanks the score no
    * matter how clean the rest of the page is (the property doc-level
    * densities cannot see). Docs with fewer than `win` tokens score their
    * single all-token window; docs with no tokens are absent from the
    * output.
    *
    * All-integer arithmetic ((1000·Σalpha) div Σchars) — exactly
    * SQL-replayable, no float rounding. Shape (round 6, guide §1.2
    * "remove shuffles outright"): ONE codegen'd per-row pass
    * (graft.functions.WindowedMinQuality — running-sum slide, O(tokens)
    * per doc) over the pruned scan — a zero-Exchange projection. The
    * previous shape exploded every token, shuffled the corpus's token
    * rows on `idCol` for a running-sum window, and re-aggregated; the
    * sliding windows a doc's score needs never leave its own row, so
    * that exchange bought nothing at any scale (parity-tested in
    * TextWindowExpressionsSpec; same SQL oracle). */
  def windowedMinQualityPermille(docs: DataFrame, win: Int,
                                 idCol: String = "doc_id",
                                 textCol: String = "text"): DataFrame = {
    require(win >= 1, s"win must be >= 1, got $win")
    docs.select(F.col(idCol),
        graft.functions.windowedMinQuality(F.col(textCol), win)
          .as("min_window_quality_pm"))
      .where(F.col("min_window_quality_pm").isNotNull)
  }
}
