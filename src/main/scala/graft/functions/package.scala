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

  /** MinHash-estimated Jaccard similarity between two signature columns:
    * fraction of equal components. Pure built-in higher-order functions —
    * stays in whole-stage codegen. */
  def estJaccard(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => F.when(x === y, 1).otherwise(0)),
      F.lit(0),
      (acc, v) => acc + v
    ).cast("double") / F.size(a)

  /** SimHash Hamming distance between two long fingerprint columns. */
  def hammingDistance(a: Column, b: Column): Column =
    F.bit_count(a.bitwiseXOR(b)).cast("int")
}
