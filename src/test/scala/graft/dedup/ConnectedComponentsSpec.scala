package graft.dedup

import graft.SparkSpec
import scala.collection.mutable

class ConnectedComponentsSpec extends SparkSpec {

  /** In-memory union-find oracle. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def runCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark2 = spark
    import spark2.implicits._
    ConnectedComponents.run(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long path graph (worst case for label propagation)") {
    val n = 500L
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val got = runCC(edges)
    assert(got.size === n)
    assert(got.values.toSet === Set(0L))
  }

  test("mixed graph: stars, cliques, isolated-by-self-loop, two paths") {
    val star = (1L to 50L).map(i => (1000L, 1000L + i))
    val clique = for (i <- 0L to 9L; j <- (i + 1) to 9L) yield (2000L + i, 2000L + j)
    val path1 = (0L until 20L).map(i => (3000L + i, 3001L + i))
    val selfLoop = Seq((4000L, 4000L))
    val edges = star ++ clique ++ path1 ++ selfLoop
    val got = runCC(edges)
    val want = oracle(edges.filter { case (a, b) => a != b }) ++ Map(4000L -> 4000L)
    assert(got === want)
  }

  test("random graphs match union-find oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = runCC(edges)
      assert(got === oracle(edges), s"trial $trial")
    }
  }

  test("deterministic across input partitioning") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter { case (a, b) => a != b }
    val a = ConnectedComponents.run(edges.toDF("u", "v").repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = ConnectedComponents.run(edges.toDF("u", "v").repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }

  test("empty edge set") {
    val spark2 = spark
    import spark2.implicits._
    val got = ConnectedComponents.run(Seq.empty[(Long, Long)].toDF("u", "v"))
    assert(got.count() === 0)
  }
}
