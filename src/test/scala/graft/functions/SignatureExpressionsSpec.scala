package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Row

/** Unit tests for the signature expressions — the analog of the
  * reference's exhaustive parse_cigar unit module
  * (reference/dupliganger/test/test_parse_cigar.py:20-86). */
class SignatureExpressionsSpec extends SparkSpec {
  import HashUtil.DefaultSeed

  private def words(n: Int, seed: Long = 7): Array[String] = {
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    var s = seed
    Array.tabulate(n) { _ =>
      s = HashUtil.mix64(s + 0x9E3779B97F4A7C15L)
      vocab(((s % vocab.length) + vocab.length).toInt % vocab.length)
    }
  }

  test("shingles: deterministic, case/separator insensitive, distinct, sorted") {
    val a = ShingleHashes.compute("The quick brown fox jumps over the lazy dog", 3, DefaultSeed)
    val b = ShingleHashes.compute("the  QUICK brown\nfox,jumps over the LAZY dog!", 3, DefaultSeed)
    assert(a.sameElements(b))
    assert(a.sameElements(a.sorted))
    assert(a.length === 7) // 9 words -> 7 trigram shingles, all distinct here
    assert(ShingleHashes.compute("", 3, DefaultSeed).isEmpty)
    assert(ShingleHashes.compute("only two", 3, DefaultSeed).length === 1) // short-doc fallback
    // repeated shingles dedupe
    val rep = ShingleHashes.compute("a b c a b c a b c", 3, DefaultSeed)
    assert(rep.length === 3) // abc, bca, cab
  }

  test("shingles: k=1 equals word-set hashing; seed changes hashes") {
    val x = ShingleHashes.compute("w1 w2 w1", 1, DefaultSeed)
    assert(x.length === 2)
    val y = ShingleHashes.compute("w1 w2 w1", 1, DefaultSeed + 1)
    assert(!x.sameElements(y))
  }

  test("minhash: identical text -> identical signature; jaccard estimate concentrates") {
    val spark2 = spark
    import spark2.implicits._
    val base = words(300).toSeq
    // overlap fraction f of words shared -> shingle jaccard roughly known
    val docA = base.mkString(" ")
    val docB = (base.take(240) ++ words(60, seed = 99)).mkString(" ") // 80% prefix shared
    val df = Seq(("a", docA), ("b", docB), ("a2", docA)).toDF("id", "text")
      .withColumn("sh", shingles(F.col("text"), 3))
      .withColumn("mh", minhash(F.col("sh"), 128))
    val rows = df.select("id", "mh").collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("a") === rows("a2"), "identical text must give identical signature")
    assert(rows("a").length === 128)
    // true jaccard from shingle sets
    val sa = ShingleHashes.compute(docA, 3, DefaultSeed).toSet
    val sb = ShingleHashes.compute(docB, 3, DefaultSeed).toSet
    val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
    val est = rows("a").zip(rows("b")).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ") // 128 hashes -> se ~ 0.044
  }

  test("estJaccard column matches scala-side estimate; disjoint docs ~0") {
    val spark2 = spark
    import spark2.implicits._
    val docA = words(200, 1).mkString(" ")
    val docB = words(200, 2).mkString(" ")
    val df = Seq((docA, docB)).toDF("ta", "tb")
      .select(
        minhash(shingles(F.col("ta"), 3), 128).as("ma"),
        minhash(shingles(F.col("tb"), 3), 128).as("mb"))
      .select(estJaccard(F.col("ma"), F.col("mb")).as("j"))
    val j = df.collect()(0).getDouble(0)
    assert(j < 0.1, s"disjoint docs estimated j=$j")
  }

  test("simhash: identical -> distance 0; small edit -> small distance; unrelated -> ~32") {
    val base = words(400, 5)
    val edited = base.clone(); edited(100) = "zulu"; edited(200) = "yankee"
    val unrelated = words(400, 77)
    def sim(ws: Array[String]): Long = {
      val sh = ShingleHashes.compute(ws.mkString(" "), 3, DefaultSeed)
      val spark2 = spark; import spark2.implicits._
      Seq(Tuple1(sh)).toDF("sh").select(simhash(F.col("sh"))).collect()(0).getLong(0)
    }
    val (s1, s2, s3) = (sim(base), sim(edited), sim(unrelated))
    assert(s1 === sim(base.clone()))
    assert(java.lang.Long.bitCount(s1 ^ s2) <= 10, s"edit distance ${java.lang.Long.bitCount(s1 ^ s2)}")
    val dUnrel = java.lang.Long.bitCount(s1 ^ s3)
    assert(dUnrel > 15 && dUnrel < 49, s"unrelated distance $dUnrel")
  }

  test("winnowing: substring containment detected, unrelated not") {
    val inner = words(150, 11).mkString(" ")
    val container = words(100, 12).mkString(" ") + " " + inner + " " + words(100, 13).mkString(" ")
    val unrelated = words(350, 14).mkString(" ")
    val fi = WinnowedFingerprints.compute(inner, 24, 12, DefaultSeed).toSet
    val fc = WinnowedFingerprints.compute(container, 24, 12, DefaultSeed).toSet
    val fu = WinnowedFingerprints.compute(unrelated, 24, 12, DefaultSeed).toSet
    val containment = fi.intersect(fc).size.toDouble / fi.size
    val noise = fi.intersect(fu).size.toDouble / fi.size
    assert(containment > 0.9, s"containment=$containment")
    assert(noise < 0.05, s"noise=$noise")
    // guarantee: shared substring of length >= w+win-1 shares >= 1 fingerprint
    assert(fi.intersect(fc).nonEmpty)
  }

  test("null/empty inputs are null-safe end to end") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Some("hello world one two three"), Some(""), None).toDF("text")
      .withColumn("sh", shingles(F.col("text"), 3))
      .withColumn("mh", minhash(F.col("sh"), 16))
      .withColumn("sim", simhash(F.col("sh")))
    val rows: Array[Row] = df.collect()
    assert(rows(0).getSeq[Long](2).length === 16)
    assert(rows(1).getSeq[Long](1).isEmpty && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2) && rows(2).isNullAt(3))
  }

  test("md5NgramSimhash: single-gram doc equals the SQL md5-derived hash") {
    val spark2 = spark
    import spark2.implicits._
    // with exactly one gram, every vote is 2·ones > 1 ⟺ the hv bit itself,
    // so sim == hv — pins the md5 → first-15-hex-digits → long derivation
    // against Spark's own conv/substring/md5 chain (the oracle's form)
    val df = Seq("alpha bravo charlie", "x y z", "tabs\there stay intact")
      .toDF("text")
      .select(
        md5NgramSimhash(F.col("text"), 3, 60).as("sim"),
        F.conv(F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 15), 16, 10)
          .cast("long").as("hv"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("md5NgramSimhash: parity with the explode + per-bit-sum aggregation form") {
    val spark2 = spark
    import spark2.implicits._
    // corpus with repeats (dedupe must match list_distinct), short docs
    // (< 3 words → null), multi-space runs, and synthetic volume
    val docs = Seq(
      1L -> "a b c a b c a b c",
      2L -> "one  two   three four five",
      3L -> "too short",
      4L -> "",
      5L -> words(200).mkString(" "),
      6L -> (words(120).mkString(" ") + " " + words(120).mkString(" "))
    ).toDF("doc_id", "text")
    val fast = docs
      .select(F.col("doc_id"), md5NgramSimhash(F.col("text"), 3, 60).as("sim"))
      .where(F.col("sim").isNotNull)
    // the round-4 reference form: explode distinct trigrams, md5-derive
    // 60-bit hashes, per-bit ones-count aggregation, majority pack
    val grams = docs
      .select(F.col("doc_id"),
        F.explode(graft.analysis.NgramJaccard.ngrams(F.col("text"), 3)).as("gram"))
      .select(F.col("doc_id"),
        F.conv(F.substring(F.md5(F.encode(F.col("gram"), "UTF-8")), 1, 15), 16, 10)
          .cast("long").as("hv"))
    val oneCols = (0 until 60).map(b =>
      F.sum(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1L))).as(s"o$b"))
    val slow = grams.groupBy("doc_id")
      .agg(oneCols.head, (oneCols.tail :+ F.count(F.lit(1)).as("n")): _*)
      .select(F.col("doc_id"),
        (0 until 60).map(b =>
          F.when(F.col(s"o$b") * 2 > F.col("n"), F.lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("sim"))
    val f = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = slow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f === s)
    assert(f.keySet === Set(1L, 2L, 5L, 6L)) // 3 (short) and 4 (empty) drop out
  }

  test("bandBuckets kernel: bit parity with the transform/xxhash64/slice chain") {
    // Reference form: the pre-round-6 higher-order-function chain the
    // codegen kernel replaces — including short signatures (tail slices),
    // empty arrays, and arrays that are not a multiple of rowsPerBand.
    val spark0 = spark
    import spark0.implicits._
    val sigs = Seq(
      Array.tabulate(128)(i => i * 0x9E3779B97F4A7C15L),
      Array.tabulate(7)(i => -i * 31L),
      Array.empty[Long],
      Array.tabulate(128)(_ => Long.MinValue),
      Array.tabulate(130)(i => i.toLong)
    ).toDF("sig")
    for ((bands, r) <- Seq((32, 4), (8, 16), (5, 3))) {
      val ref = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        b => F.xxhash64(b, F.slice(F.col("sig"), b * r + 1, F.lit(r))))
      val got = sigs.select(
        bandBuckets(F.col("sig"), bands, r).as("k"), ref.as("h"))
        .collect()
      got.foreach { row =>
        assert(row.getSeq[Long](0) === row.getSeq[Long](1), s"bands=$bands r=$r")
      }
    }
    // real-signature sweep
    val real = graft.io.SyntheticCorpus.pages(spark, 2000L)
      .select(minhash(shingles(F.col("text"), 9), 128).as("sig"))
      .where(F.col("sig").isNotNull)
    val refReal = F.transform(
      F.sequence(F.lit(0), F.lit(31)),
      b => F.xxhash64(b, F.slice(F.col("sig"), b * 4 + 1, F.lit(4))))
    val mismatch = real.select(bandBuckets(F.col("sig"), 32, 4).as("k"), refReal.as("h"))
      .where(F.col("k") =!= F.col("h")).count()
    assert(mismatch === 0)
  }

  test("simhash64: bit-sliced counter parity with the reference voting loop") {
    // Reference form: the pre-round-6 per-bit ±1 voting loop. The
    // production kernel now ripple-carry-adds each hash into transposed
    // 8-bit counters (flushed every 255 words); outputs must be
    // bit-identical, including at the 255/256-word flush boundaries and
    // on vote ties (tie -> bit clear).
    def referenceSimhash(hashes: Array[Long], seed: Long): Long = {
      val votes = new Array[Int](64)
      for (x <- hashes) {
        var s = HashUtil.mix64(x ^ seed)
        var b = 0
        while (b < 64) {
          if ((s & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          s >>>= 1; b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    val expr = SimHash64(org.apache.spark.sql.graftshim.GraftSqlShim
      .expression(F.lit(1)), DefaultSeed)
    var s = 42L
    // sizes straddle the flush boundary (255) and its multiples; plus a
    // degenerate all-identical array whose every bit is a tie-or-win edge
    for (m <- Seq(1, 2, 254, 255, 256, 509, 510, 511, 1000, 4096)) {
      val hashes = Array.tabulate(m) { _ =>
        s = HashUtil.mix64(s + 0x9E3779B97F4A7C15L); s
      }
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hashes)
      assert(expr.evalNonEmpty(arr) === referenceSimhash(hashes, DefaultSeed), s"m=$m")
      val const = Array.fill(m)(0xDEADBEEFL)
      val carr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(const)
      assert(expr.evalNonEmpty(carr) === referenceSimhash(const, DefaultSeed), s"const m=$m")
    }
    // real-corpus sweep: every shingle array of a 2k-doc synthetic slice
    val spark0 = spark
    import spark0.implicits._
    val texts = graft.io.SyntheticCorpus.pages(spark, 2000L)
      .select("text").as[String].collect()
    for (t <- texts) {
      val hs = ShingleHashes.compute(t, 9, DefaultSeed)
      if (hs.nonEmpty) {
        val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs)
        assert(expr.evalNonEmpty(arr) === referenceSimhash(hs, DefaultSeed))
      }
    }
  }
}
