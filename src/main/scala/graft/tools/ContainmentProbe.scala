package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the q184 containment-join phases: row volumes and
  * per-phase wall times at a given SF dir, to aim optimization at the
  * real bottleneck instead of the suspected one. */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.llm.TextDedup
    val sets = docs.select(col("doc_id").as("id"),
      array_sort(array_distinct(transform(
        TextDedup.shingles(col("text"), 3),
        s => TextDedup.portableHash(s)))).as("sset")).cache()
    time("sets build+count")(println("docs=" + sets.count()))
    val sh = sets.select(col("id"), explode(col("sset")).as("sh")).cache()
    time("shingle explode")(println("sh rows=" + sh.count()))
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    time("df agg")(println("vocab=" + dfs.count()))
    import org.apache.spark.sql.expressions.Window
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("sh"))
    val ranked = sh.join(dfs, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("id")))
      .cache()
    time("rank window")(println("ranked=" + ranked.count()))
    val num = 4; val den = 5
    val prefixes = ranked
      .filter(col("rk") <= col("sz") - expr(s"cast(ceil(sz * $num / $den) as bigint)") + 1)
      .select(col("id").as("a"), col("sh"),
        col("rk").as("rka"), col("sz").as("sza")).cache()
    time("prefix filter")(println("prefix rows=" + prefixes.count()))
    val raw = prefixes
      .join(ranked.select(col("id").as("b"), col("sh"),
        col("rk").as("rkb"), col("sz").as("szb")), Seq("sh"))
      .filter(col("a") =!= col("b"))
    time("raw candidate join")(println("raw pairs=" + raw.count()))
    val sized = raw.filter(col("szb") * den >= col("sza") * num)
    time("size filter")(println("sized pairs=" + sized.count()))
    val cands = sized
      .withColumn("ub", lit(1) +
        least(col("rka") - 1, col("rkb") - 1) +
        least(col("sza") - col("rka"), col("szb") - col("rkb")))
      .groupBy("a", "b", "sza")
      .agg(min("ub").as("ub"))
      .filter(col("ub") * den >= col("sza") * num)
      .select("a", "b").cache()
    time("positional+dedup")(println("cand pairs=" + cands.count()))
    val out = cands
      .join(sets.select(col("id").as("a"), col("sset").as("sa")), Seq("a"))
      .join(sets.select(col("id").as("b"), col("sset").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("size_a"))
      .filter(col("inter") * den >= col("size_a") * num)
    time("verify join")(println("final pairs=" + out.count()))
    spark.stop()
  }
}
