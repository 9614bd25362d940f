package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.{functions => F}

/** Column-level facade over the engine's custom Catalyst expressions —
  * the engine's "UDF surface" analog (SURVEY.md §2.7), except nothing here
  * is a Scala UDF: each is a native Expression, so null-safety, analysis
  * and column pruning behave like built-ins.
  */
package object functions {

  private def col(e: Expression): Column = GraftSqlShim.column(e)
  private def expr(c: Column): Expression = GraftSqlShim.expression(c)

  /** Distinct hashed k-word shingles of a text column. */
  def shingles(text: Column, k: Int, seed: Long = HashUtil.DefaultSeed): Column =
    col(ShingleHashes(expr(text), k, seed))

  /** MinHash signature (length numHashes) of a shingle-hash array column. */
  def minhash(shingleHashes: Column, numHashes: Int, seed: Long = HashUtil.DefaultSeed): Column =
    col(MinHashSignature(expr(shingleHashes), numHashes, seed))

  /** 64-bit SimHash fingerprint of a shingle-hash array column. */
  def simhash(shingleHashes: Column, seed: Long = HashUtil.DefaultSeed): Column =
    col(SimHash64(expr(shingleHashes), seed))

  /** LSH band bucket keys (length `bands`) of a minhash signature column —
    * bucket_b = xxhash64(b, sig[b·r .. b·r+r)), codegen'd. */
  def bandBuckets(minhash: Column, bands: Int, rowsPerBand: Int): Column =
    col(BandBuckets(expr(minhash), bands, rowsPerBand))

  /** SimHash over md5-hashed distinct word n-grams (low `bits` bits of a
    * long) — the SQL-replayable signature family (md5 replays in any
    * engine; the production [[simhash]] uses the FNV/mix64 chain). One
    * codegen'd pass per row: no gram explode, no per-bit aggregates. */
  def md5NgramSimhash(text: Column, n: Int, bits: Int = 60): Column =
    col(Md5NgramSimHash(expr(text), n, bits))

  /** Winnowed rolling-hash fingerprints for exact-substring detection. */
  def winnowedFingerprints(text: Column, w: Int, win: Int,
                           seed: Long = HashUtil.DefaultSeed): Column =
    col(WinnowedFingerprints(expr(text), w, win, seed))

  /** Winnowed md5-gram fingerprints — the SQL-replayable winnow layout,
    * computed per row (no gram explode, no window shuffle). */
  def md5WinnowedFingerprints(text: Column, w: Int, win: Int): Column =
    col(Md5WinnowedFingerprints(expr(text), w, win))

  /** Sliding-window minimum alpha-density permille, computed per row
    * (no token explode, no window shuffle). Null iff no tokens. */
  def windowedMinQuality(text: Column, win: Int): Column =
    col(WindowedMinQuality(expr(text), win))

  /** Distinct word n-grams (first-occurrence order), codegen'd single
    * pass. Null text propagates null. */
  def wordNgrams(text: Column, n: Int): Column =
    col(WordNgrams(expr(text), n))

  /** Σ a_i·b_i over float/double arrays (double) — codegen'd dot product. */
  def doubleDot(a: Column, b: Column): Column = col(DoubleDot(expr(a), expr(b)))

  /** Σ a_i·b_i over long arrays (long) — codegen'd integer dot product. */
  def longDot(a: Column, b: Column): Column = col(LongDot(expr(a), expr(b)))

  /** floor(x·10^6 + 0.5) per component — codegen'd micro-unit quantizer. */
  def quantizedVec(emb: Column): Column = col(QuantizedVec(expr(emb)))

  /** floor(x/nrm·10^6 + 0.5) per component — codegen'd quantized unit. */
  def quantizedUnitVec(emb: Column, nrm: Column): Column =
    col(QuantizedUnitVec(expr(emb), expr(nrm)))

  /** Packed random-hyperplane sign bucket — codegen'd RHP-LSH bucket id. */
  def rhpBucketOf(emb: Column, numPlanes: Int, rep: Int = 0): Column =
    col(RhpBucket(expr(emb), numPlanes, rep))

  /** MinHash-estimated Jaccard similarity between two signature columns:
    * fraction of equal components. Codegen'd primitive loop (the previous
    * `aggregate(zip_with(...))` higher-order form is CodegenFallback —
    * interpreted per pair; parity-tested in VectorExpressionsSpec). */
  def estJaccard(a: Column, b: Column): Column =
    col(MinhashEstJaccard(expr(a), expr(b)))

  /** SimHash Hamming distance between two long fingerprint columns. */
  def hammingDistance(a: Column, b: Column): Column =
    F.bit_count(a.bitwiseXOR(b)).cast("int")
}
