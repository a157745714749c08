package graft

import java.nio.file.{Files, Path}
import graft.dag.CorpusLoader

/** The treehash short-circuit on the fused corpus exec sweep
  * (CorpusLoader.deployAndExecuteCached): a byte-identical corpus tree
  * must NOT be redeployed within a session — the reference's
  * update_schema.py treehash gate — and ANY byte change anywhere in
  * sql/ or metrics/ must invalidate. */
class CorpusCacheSpec extends SparkTestBase {

  /** Minimal but complete corpus: one dataset, one table stand-in, one
    * view over it; metrics globals copied from the reference corpus at
    * runtime (the same read-at-runtime contract q108/q109 use). */
  private def makeCorpus(): Path = {
    val root = Files.createTempDirectory("corpus_cache")
    val ds = root.resolve("sql/demo")
    Files.createDirectories(ds.resolve("tables/base"))
    Files.createDirectories(ds.resolve("views/v1"))
    Files.writeString(ds.resolve("meta.toml"), "name = \"demo\"\n")
    Files.writeString(ds.resolve("tables/base/meta.toml"), "name = \"base\"\n")
    Files.writeString(ds.resolve("tables/base/table.toml"),
      """[id]
        |type = "INTEGER"
        |mode = "REQUIRED"
        |
        |[v]
        |type = "STRING"
        |""".stripMargin)
    Files.writeString(ds.resolve("views/v1/view.sql"),
      "SELECT id, v FROM {{ ref('demo.base') }} WHERE id IS NOT NULL")
    val refMetrics = java.nio.file.Path.of(sys.env.getOrElse(
      "SPARK_GRAFT_CORPUS_ROOT",
      "/root/reference/jobs/webcompat-kb/data")).resolve("metrics")
    Files.createDirectories(root.resolve("metrics"))
    Seq("metrics.toml", "ranks.toml").foreach { f =>
      Files.copy(refMetrics.resolve(f), root.resolve("metrics").resolve(f))
    }
    root
  }

  test("unchanged tree: second sweep returns the recorded outcomes, no redeploy") {
    val root = makeCorpus()
    val first = CorpusLoader.deployAndExecuteCached(spark, root, rowsPerTable = 8)
    val second = CorpusLoader.deployAndExecuteCached(spark, root, rowsPerTable = 8)
    assert(second._1 eq first._1, "cache missed on an identical tree")
    assert(first._1.failures.isEmpty, s"deploy failed: ${first._1.failures}")
    assert(first._2.nonEmpty && first._2.forall(_.ok))
  }

  test("any byte change in the tree invalidates the cache") {
    val root = makeCorpus()
    val first = CorpusLoader.deployAndExecuteCached(spark, root, rowsPerTable = 8)
    val h0 = CorpusLoader.corpusTreeHash(root)
    val viewFile = root.resolve("sql/demo/views/v1/view.sql")
    Files.writeString(viewFile, Files.readString(viewFile) + " -- touched")
    assert(CorpusLoader.corpusTreeHash(root) != h0, "hash blind to an edit")
    val second = CorpusLoader.deployAndExecuteCached(spark, root, rowsPerTable = 8)
    assert(!(second._1 eq first._1), "stale cache served after an edit")
    assert(second._1.failures.isEmpty)
  }

  test("different fixture params are distinct cache keys") {
    val root = makeCorpus()
    val a = CorpusLoader.deployAndExecuteCached(spark, root, rowsPerTable = 8)
    val b = CorpusLoader.deployAndExecuteCached(spark, root, rowsPerTable = 16)
    assert(!(a._1 eq b._1))
  }
}
