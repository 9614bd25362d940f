package graft.io

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class ZipJoinSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("k", "v")
  }

  test("strict zip join passes and joins when keys are a perfect 1:1") {
    val l = mk(Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    val r = mk(Seq(2L -> "y", 1L -> "x", 3L -> "z")).withColumnRenamed("v", "w")
    val out = ZipJoin.strict(l, r, "k").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2))).sorted.toSeq
    assert(out === Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")))
  }

  test("strict zip join raises on missing and duplicate keys; audit lists them") {
    val l = mk(Seq(1L -> "a", 2L -> "b", 2L -> "b2"))
    val r = mk(Seq(1L -> "x", 3L -> "z")).withColumnRenamed("v", "w")
    val e = intercept[IllegalStateException](ZipJoin.strict(l, r, "k"))
    assert(e.getMessage.contains("not 1:1"))
    val audit = ZipJoin.audit(l, r, "k").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    // key 2: duplicated left, missing right; key 3: missing left
    assert(audit === Seq((2L, 2L, 0L), (3L, 0L, 1L)))
  }
}
