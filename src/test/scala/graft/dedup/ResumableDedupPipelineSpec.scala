package graft.dedup

import java.nio.file.{Files, Path}
import java.util.Comparator

import graft.SparkSpec
import graft.io.{StageStore, SyntheticCorpus}
import org.apache.spark.sql.{functions => F}

/** Kill-resume discipline tests — the analog of the reference's atomic
  * tmp-rename + txn-batching durability (SURVEY.md §5 test plan (c)). */
class ResumableDedupPipelineSpec extends SparkSpec {

  private def tmpDir(): Path = Files.createTempDirectory("graft-stage-")
  private def rmRf(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  private val cfg = DedupConfig(allowedLangs = Some(Set("en")))

  test("StageStore: committed stage is reloaded, builder never re-evaluated") {
    val spark2 = spark
    import spark2.implicits._
    val root = tmpDir()
    try {
      val store = new StageStore(spark, root.toString)
      val first = store.runStaged("s1")(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      assert(first.count() === 2)
      val second = store.runStaged("s1") {
        fail("builder must not run for a committed stage"): org.apache.spark.sql.DataFrame
      }
      assert(second.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
      // lineage recorded: per-partition counts sum to table count
      val lin = store.lineage().where(F.col("stage") === "s1")
      assert(lin.agg(F.sum("row_count")).head().getLong(0) === 2)
    } finally rmRf(root)
  }

  test("StageStore: a stage dir without _SUCCESS (killed mid-write) is rebuilt") {
    val spark2 = spark
    import spark2.implicits._
    val root = tmpDir()
    try {
      val store = new StageStore(spark, root.toString)
      // simulate a kill: data dir exists, no _SUCCESS marker
      Files.createDirectories(root.resolve("s2"))
      Files.writeString(root.resolve("s2/part-garbage"), "partial")
      assert(!store.isCommitted("s2"))
      val df = store.runStaged("s2")(Seq((7L, "x")).toDF("id", "v"))
      assert(df.count() === 1)
      assert(store.isCommitted("s2"))
    } finally rmRf(root)
  }

  test("pipeline resumes mid-run: later stages rebuilt from committed earlier stages") {
    val root = tmpDir()
    try {
      val pages = SyntheticCorpus.pages(spark, 600)
      val store = new StageStore(spark, root.toString)
      val full = ResumableDedupPipeline.run(pages, cfg, store)
      val expected = full.clusters.collect()
        .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).sorted.toSeq

      // simulate a job killed after 'edges' committed: drop later stages
      rmRf(root.resolve("assign"))
      rmRf(root.resolve("flags"))
      def mtimes(stage: String): Map[String, Long] = {
        val d = root.resolve(stage)
        Files.list(d).toArray.map(_.asInstanceOf[Path])
          .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
          .toMap
      }
      val sigMt = mtimes("signatures")
      val edgeMt = mtimes("edges")
      val resumed = ResumableDedupPipeline.run(pages, cfg, store)
      val got = resumed.clusters.collect()
        .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).sorted.toSeq
      assert(got === expected)
      // committed stages were served from store, not rewritten
      assert(mtimes("signatures") === sigMt)
      assert(mtimes("edges") === edgeMt)
      assert(store.isCommitted("assign") && store.isCommitted("flags"))
    } finally rmRf(root)
  }
}
