package graft.tools

import org.apache.spark.sql.SparkSession
import graft.dag.CorpusLoader

/** Dev profiling main: per-phase and per-view timing of the corpus
  * execution gate (q109's body). Not part of the query surface. */
object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Path.of("/root/reference/jobs/webcompat-kb/data")
    (1 to 3).foreach { pass =>
      val t0 = System.nanoTime()
      CorpusLoader.renderedSql(root)
      println(f"renderedSql pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val result = CorpusLoader.deploy(spark, root, rowsPerTable = 64)
      val t1 = System.nanoTime()
      val execs = CorpusLoader.executeAll(spark, result)
      val t2 = System.nanoTime()
      println(f"STAGED pass $pass: deploy ${(t1 - t0) / 1e9}%.1fs exec ${(t2 - t1) / 1e9}%.1fs " +
        f"ok=${execs.count(_.ok)}/${execs.size} nonempty=${execs.count(_.rows > 0)}")
    }
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val (_, execs) = CorpusLoader.deployAndExecute(spark, root, rowsPerTable = 64)
      val t1 = System.nanoTime()
      println(f"FUSED pass $pass: total ${(t1 - t0) / 1e9}%.1fs " +
        f"ok=${execs.count(_.ok)}/${execs.size} nonempty=${execs.count(_.rows > 0)}")
      if (pass == 2) execs.sortBy(-_.millis).take(8).foreach(e =>
        println(f"  ${e.millis}%6d ms  ${e.dataset}__${e.name}  rows=${e.rows}"))
    }
    spark.stop()
  }
}
