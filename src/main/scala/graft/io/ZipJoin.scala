package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Validated 1:1 zip join — the engine's take on the reference's paired-
  * file discipline: when two record streams are zipped by key, a record
  * name missing on either side is an ERROR, not a silent inner-join drop
  * (reference/dupliganger/remove_umi.py:245-248 raises on read-name
  * mismatch between R1/R2). Spark's equi-join silently drops unmatched
  * rows; [[strict]] restores the reference's fail-fast contract and
  * [[audit]] exposes the mismatches as a queryable table.
  */
object ZipJoin {

  /** Mismatch report for a keyed 1:1 zip of `left` and `right`:
    * one row per violating key with per-side multiplicities
    * (n_left/n_right; 0 = missing on that side, >1 = duplicate key).
    * Empty result ⇔ the zip is a perfect 1:1. One narrow count
    * aggregation per side + an outer join of the (small) count tables —
    * no wide column ever shuffles. */
  def audit(left: DataFrame, right: DataFrame, key: String): DataFrame = {
    val lc = left.groupBy(key).agg(F.count(F.lit(1)).as("n_left"))
    val rc = right.groupBy(key).agg(F.count(F.lit(1)).as("n_right"))
    lc.join(rc, Seq(key), "full_outer")
      .select(F.col(key),
        F.coalesce(F.col("n_left"), F.lit(0L)).as("n_left"),
        F.coalesce(F.col("n_right"), F.lit(0L)).as("n_right"))
      .where(F.col("n_left") =!= 1 || F.col("n_right") =!= 1)
  }

  /** Inner join on `key` that first PROVES the zip is 1:1 — raises with a
    * sample of violating keys otherwise (the remove_umi name-mismatch
    * error, transposed to sets). The validation pass is narrow (keys and
    * counts only); the join itself is a plain Catalyst equi-join, so all
    * the usual physical strategies (broadcast, shuffle-hash, SMJ) apply. */
  def strict(left: DataFrame, right: DataFrame, key: String): DataFrame = {
    val bad = audit(left, right, key).head(5)
    if (bad.nonEmpty) {
      val sample = bad.map(r => s"${r.get(0)} (left=${r.getLong(1)}, right=${r.getLong(2)})")
        .mkString("; ")
      throw new IllegalStateException(
        s"zip join on '$key' is not 1:1 — e.g. $sample. " +
          "Use ZipJoin.audit to list all violations.")
    }
    left.join(right, Seq(key))
  }
}
