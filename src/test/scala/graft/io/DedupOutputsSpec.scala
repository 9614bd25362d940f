package graft.io

import java.nio.file.{Files, Path}
import java.util.Comparator

import graft.SparkSpec
import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.sql.{functions => F}

class DedupOutputsSpec extends SparkSpec {

  private def rmRf(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  test("routed sink: partition dirs per route, rows partition the corpus, text intact") {
    val root = Files.createTempDirectory("graft-out-")
    try {
      val pages = SyntheticCorpus.pages(spark, 400)
      val res = DedupPipeline.run(pages, DedupConfig(allowedLangs = Some(Set("en"))))
      DedupOutputs.writeRouted(res, root.toString)

      // physical layout: hive-style route partitions
      val dirs = Files.list(root.resolve("pages_routed")).toArray.map(_.toString)
      assert(DedupOutputs.Routes.forall(r => dirs.exists(_.endsWith(s"route=$r"))), dirs.mkString(","))

      val routed = spark.read.parquet(s"$root/pages_routed")
      assert(routed.count() === 400)
      val kept = DedupOutputs.readRoute(spark, root.toString, "kept")
      val dup = DedupOutputs.readRoute(spark, root.toString, "duplicate")
      val rej = DedupOutputs.readRoute(spark, root.toString, "reject")
      assert(kept.count() === res.deduped.count())
      assert(dup.count() === res.duplicates.count())
      assert(rej.count() === res.rejects.count())
      // byte-identical text per url through the sink
      val orig = pages.select(F.col("url"), F.col("text").as("t0"))
      assert(routed.join(orig, "url").where(F.col("text") =!= F.col("t0")).count() === 0)
      // rejects carry reasons; kept/dup don't
      assert(rej.where(F.col("reject_reason").isNull).count() === 0)
      assert(kept.where(F.col("reject_reason").isNotNull).count() === 0)
    } finally rmRf(root)
  }
}
