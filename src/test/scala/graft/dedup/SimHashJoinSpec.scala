package graft.dedup

import graft.SparkSpec

class SimHashJoinSpec extends SparkSpec {

  /** Brute-force oracle. */
  private def oracle(sims: Seq[(Long, Long)], h: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- sims; (ib, sb) <- sims if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= h
    } yield (ia, ib, d)).toSet

  test("multi-index join finds exactly the brute-force pairs (randomized)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    // clusters of fingerprints at small hamming distances + noise
    val sims = (0L until 60L).flatMap { i =>
      val base = rnd.nextLong()
      Seq((i * 10, base)) ++ (1 to 2).map { j =>
        var v = base
        (0 until rnd.nextInt(6)).foreach(_ => v ^= (1L << rnd.nextInt(64)))
        (i * 10 + j, v)
      }
    }
    for (h <- Seq(0, 2, 3, 7)) {
      val got = SimHashJoin.nearPairs(sims.toDF("doc_id", "sim"), h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === oracle(sims, h), s"maxHamming=$h")
    }
  }

  test("hot-chunk cap drops oversized postings (and only those)") {
    val spark2 = spark
    import spark2.implicits._
    // 50 identical fingerprints: every chunk posting has 50 members
    val sims = (0L until 50L).map(i => (i, 0x0F0F0F0F0F0F0F0FL))
    val capped = SimHashJoin.nearPairs(sims.toDF("doc_id", "sim"), 3,
      maxChunkPostings = 10)
    assert(capped.count() === 0)
    val uncapped = SimHashJoin.nearPairs(sims.toDF("doc_id", "sim"), 3)
    assert(uncapped.count() === 50L * 49 / 2)
  }
}
