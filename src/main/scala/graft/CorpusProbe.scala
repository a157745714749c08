package graft

import java.nio.file.Path
import org.apache.spark.sql.SparkSession
import graft.dag.CorpusLoader

/** Dev harness: deploy the reference SQL corpus and print per-object
  * failures so Dialect/JinjaLite gaps can be fixed empirically. */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val root = Path.of(args.headOption.getOrElse("/root/reference/jobs/webcompat-kb/data"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rowsPerTable = args.lift(1).map(_.toInt).getOrElse(0)
    val result = CorpusLoader.deploy(spark, root, rowsPerTable)
    val byKind = result.outcomes.groupBy(_.kind)
    byKind.foreach { case (k, os) => println(s"$k: ${os.count(_.ok)}/${os.size} ok") }
    if (rowsPerTable > 0) {
      val t0 = System.nanoTime()
      val execs = CorpusLoader.executeAll(spark, result)
      println(f"exec: ${execs.count(_.ok)}/${execs.size} ok, " +
        s"${execs.count(_.rows > 0)} nonempty, ${math.round((System.nanoTime() - t0) / 1e8) / 10.0} s")
      execs.filterNot(_.ok).foreach { e =>
        println(s"EXECFAIL ${e.dataset}.${e.name}: ${e.error.getOrElse("?").replace('\n', ' ').take(400)}")
      }
      execs.filter(_.ok).sortBy(-_.rows).take(10).foreach(e => println(s"  ${e.rows} rows  ${e.dataset}.${e.name}"))
      println("slowest:")
      execs.sortBy(-_.millis).take(12).foreach(e => println(s"  ${e.millis} ms  ${e.dataset}.${e.name}"))
    }
    val sqls = CorpusLoader.renderedSql(root)
    val dumpDir = java.nio.file.Path.of("/tmp/corpus_fail")
    java.nio.file.Files.createDirectories(dumpDir)
    result.failures.foreach { f =>
      println(s"FAIL ${f.kind} ${f.dataset}.${f.name}: ${f.error.getOrElse("?").replace('\n', ' ').take(300)}")
      val qual = CorpusLoader.qual(f.dataset, f.name)
      sqls.get(qual).foreach(sql => java.nio.file.Files.writeString(dumpDir.resolve(s"$qual.sql"), sql))
    }
    spark.stop()
  }
}
