package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** Parity: every codegen'd vector kernel must be BIT-IDENTICAL to the
  * higher-order-function column stack it replaced (the old forms are
  * reconstructed inline here), including null/shape edge semantics —
  * these expressions feed SQL-oracle-checked queries, so "almost equal"
  * is a correctness regression, not noise. */
class VectorExpressionsSpec extends SparkSpec {
  import graft.functions.{doubleDot, longDot, quantizedVec, quantizedUnitVec, rhpBucketOf}

  // ---- the replaced HOF forms, verbatim from round-5 Similarity ----------
  private def hofDot(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(a, b, _ * _), F.lit(0.0), _ + _)
  private def hofLongDot(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(a, b, _ * _), F.lit(0L), _ + _)
  private def hofQuantized(emb: Column): Column =
    F.transform(emb, x => F.floor(x * 1000000.0d + 0.5d))
  private def hofQuantizedUnit(emb: Column, nrm: Column): Column =
    F.transform(emb, x => F.floor(x / nrm * 1000000.0d + 0.5d))
  private val Mask31 = 0x7FFFFFFFL
  private val HashMul = 0x45d9f3bL
  private def hofHashSign(rep: Int, p: Int, i: Column): Column = {
    val mask = F.lit(Mask31)
    def round(h: Column): Column = {
      val m = (h * HashMul).bitwiseAND(mask)
      m.bitwiseXOR(F.shiftright(m, 16))
    }
    val h0 = (F.lit(rep.toLong * 1000003L + p.toLong * 8191L + 1L) + i * 127L)
      .bitwiseAND(mask)
    val h = round(round(h0))
    F.when(h.bitwiseAND(F.lit(1L)) === 0L, 1L).otherwise(-1L)
  }
  private def hofRhpBucket(emb: Column, numPlanes: Int, rep: Int): Column = {
    val qv = hofQuantized(emb)
    (0 until numPlanes).map { p =>
      val proj = F.aggregate(
        F.zip_with(qv,
          F.transform(F.sequence(F.lit(0), F.size(emb) - 1), i => hofHashSign(rep, p, i)),
          _ * _),
        F.lit(0L), _ + _)
      F.when(proj >= 0, F.lit(1L << p)).otherwise(F.lit(0L))
    }.reduce(_ + _)
  }

  private def collectPairs(df: DataFrame): Seq[(Any, Any)] =
    df.collect().toSeq.map(r => (r.get(0), r.get(1)))

  private lazy val realVecs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(F.col("vec_id"), F.transform(F.col("embedding"), _.cast("double")).as("emb"))

  test("doubleDot matches the aggregate/zip_with fold on the real corpus") {
    val cmp = realVecs
      .select(doubleDot(F.col("emb"), F.col("emb")).as("a"),
        hofDot(F.col("emb"), F.col("emb")).as("b"))
    assert(collectPairs(cmp).forall { case (a, b) => a == b })
  }

  test("doubleDot accepts the raw float array with identical widening") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cmp = raw.select(
      doubleDot(F.col("embedding"), F.col("embedding")).as("a"),
      hofDot(F.transform(F.col("embedding"), _.cast("double")),
        F.transform(F.col("embedding"), _.cast("double"))).as("b"))
    assert(collectPairs(cmp).forall { case (a, b) => a == b })
  }

  test("dot edge semantics: empty, length mismatch, null element, null array") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[Double], Array.empty[Double]),
      (Array(1.0, 2.0), Array(3.0, 4.0))
    ).toDF("a", "b")
    val got = df.select(doubleDot($"a", $"b").as("x"), hofDot($"a", $"b").as("y"))
    assert(collectPairs(got).forall { case (a, b) => a == b })

    val mism = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
    val gm = mism.select(doubleDot($"a", $"b").as("x"), hofDot($"a", $"b").as("y")).head
    assert(gm.isNullAt(0) && gm.isNullAt(1))

    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val gn = withNull.select(doubleDot($"a", $"b").as("x"), hofDot($"a", $"b").as("y")).head
    assert(gn.isNullAt(0) && gn.isNullAt(1))

    val nullArr = Seq((Option.empty[Seq[Double]], Option(Seq(1.0)))).toDF("a", "b")
    val ga = nullArr.select(doubleDot($"a", $"b").as("x"), hofDot($"a", $"b").as("y")).head
    assert(ga.isNullAt(0) && ga.isNullAt(1))
  }

  test("longDot matches on quantized real vectors plus edge cases") {
    val q = realVecs.select(quantizedVec(F.col("emb")).as("qa"),
      hofQuantized(F.col("emb")).as("qb"))
    val cmp = q.select(longDot(F.col("qa"), F.col("qa")).as("x"),
      hofLongDot(F.col("qb"), F.col("qb")).as("y"))
    assert(collectPairs(cmp).forall { case (a, b) => a == b })

    import spark.implicits._
    val mism = Seq((Seq(1L, 2L), Seq(3L))).toDF("a", "b")
    val gm = mism.select(longDot($"a", $"b").as("x"), hofLongDot($"a", $"b").as("y")).head
    assert(gm.isNullAt(0) && gm.isNullAt(1))
  }

  test("quantizedVec / quantizedUnitVec match element-wise, incl. negatives") {
    val withN = realVecs.withColumn("nrm", F.sqrt(hofDot(F.col("emb"), F.col("emb"))))
      .where(F.col("nrm") > 0)
    val cmp = withN.select(
      quantizedVec(F.col("emb")).as("a"), hofQuantized(F.col("emb")).as("b"),
      quantizedUnitVec(F.col("emb"), F.col("nrm")).as("c"),
      hofQuantizedUnit(F.col("emb"), F.col("nrm")).as("d"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
    import spark.implicits._
    val neg = Seq(Seq(-1.23456789, 0.0, 2.5e-7, -2.5e-7)).toDF("emb")
    val gn = neg.select(quantizedVec($"emb").as("a"), hofQuantized($"emb").as("b")).head
    assert(gn.getSeq[Long](0) == gn.getSeq[Long](1))
  }

  test("rhpBucketOf matches the per-plane HOF stack for every probe rep") {
    for (rep <- 0 until 3) {
      val cmp = realVecs.select(
        rhpBucketOf(F.col("emb"), 6, rep).as("a"),
        hofRhpBucket(F.col("emb"), 6, rep).as("b"))
      assert(collectPairs(cmp).forall { case (a, b) => a == b },
        s"bucket mismatch at rep=$rep")
    }
    // wider plane count exercises higher bits
    val wide = realVecs.limit(50).select(
      rhpBucketOf(F.col("emb"), 16, 1).as("a"),
      hofRhpBucket(F.col("emb"), 16, 1).as("b"))
    assert(collectPairs(wide).forall { case (a, b) => a == b })
  }

  test("estJaccard matches the when/zip_with fold incl. mismatch semantics") {
    import spark.implicits._
    def hofEstJaccard(a: Column, b: Column): Column =
      F.aggregate(
        F.zip_with(a, b, (x, y) => F.when(x === y, 1).otherwise(0)),
        F.lit(0),
        (acc, v) => acc + v
      ).cast("double") / F.size(a)
    val sigs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(shingles(F.col("text"), 3).as("sh"))
      .select(minhash(F.col("sh"), 64).as("mh"))
      .where(F.col("mh").isNotNull)
    val pairs = sigs.limit(40).crossJoin(sigs.limit(40).withColumnRenamed("mh", "mh2"))
    val cmp = pairs.select(
      graft.functions.estJaccard(F.col("mh"), F.col("mh2")).as("a"),
      hofEstJaccard(F.col("mh"), F.col("mh2")).as("b"))
    assert(collectPairs(cmp).forall { case (a, b) => a == b })
    // length mismatch: extra positions count as unequal, divisor is size(a)
    val mism = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    val gm = mism.select(graft.functions.estJaccard($"a", $"b").as("x"),
      hofEstJaccard($"a", $"b").as("y")).head
    assert(gm.getDouble(0) == gm.getDouble(1))
    // empty-array divisor: the HOF form throws DIVIDE_BY_ZERO under
    // Spark 4's default ANSI mode; the expression yields NaN. Unreachable
    // from the operators — a signed doc's minhash is never EMPTY (no
    // shingles -> null signature, and null-signature docs never enter
    // candidate pairs) — asserted here so the divergence stays documented.
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val ge = empty.select(graft.functions.estJaccard($"a", $"b").as("x")).head
    assert(ge.getDouble(0).isNaN)
  }

  test("rhpBucketOf edge semantics: empty array and null element match HOF") {
    import spark.implicits._
    val df = Seq(Seq.empty[java.lang.Double], Seq[java.lang.Double](1.0, null))
      .toDF("emb")
    val cmp = df.select(rhpBucketOf($"emb", 4, 0).as("a"),
      hofRhpBucket($"emb", 4, 0).as("b"))
    assert(collectPairs(cmp).forall { case (a, b) => a == b })
  }
}
