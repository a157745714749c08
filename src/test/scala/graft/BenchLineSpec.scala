package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's bench-parse contract: the stdout JSON line must fit
  * the driver's 2000-byte stdout tail (with sbt's ~160 bytes of
  * [info]/[success] noise after it) or BENCH_r{N}.json records
  * "parsed": null. Bench.shortLine enforces the budget by keeping the
  * slowest queries' entries and summarizing the fast tail as
  * "omitted":N (the full record lives in BENCH_OUT.json and every
  * query stays gated by bench_2x_flags). Pure line arithmetic — no
  * SparkSession needed.
  */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("qNN prefixes stay unambiguous (short keys remain possible)") {
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.size == prefixes.distinct.size,
      "duplicate qNN prefixes would force full-name keys past the tail window")
  }

  test("short line fits the tail budget at worst-case values") {
    // worst case: every query prints a 3-char value ("9.9")
    val results = names.map(_ -> 9.9)
    val line = Bench.shortLine(results, "sf0.1")
    val sbtNoise = 7 /* [info]  */ + 110 /* [success] trailer */
    assert(line.length + sbtNoise < 2000,
      s"line ${line.length}B + noise breaches the 2000B tail window")
    // it must still be one parseable JSON object with the contract keys
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.contains(""""queries":{""") && line.contains(""""sf":"sf0.1""""))
  }

  test("budget keeps the slowest queries and counts the omitted tail") {
    val results = (1 to 400).map(i => (f"q$i%03d_x" -> i / 100.0))
    val line = Bench.shortLine(results, "sf0.1", budget = 600)
    assert(line.length <= 600)
    // slowest (q400) kept, fastest (q001) omitted, count present
    assert(line.contains("\"q400\":"))
    assert(!line.contains("\"q001\":"))
    assert("\"omitted\":(\\d+)".r.findFirstMatchIn(line)
      .exists(_.group(1).toInt > 0))
  }

  test("failures are always kept in the line") {
    val results = Seq("q001_ok" -> 0.1, "q002_bad" -> -1.0) ++
      (3 to 300).map(i => (f"q$i%03d_x" -> 5.0))
    val line = Bench.shortLine(results, "sf0.1", budget = 400)
    assert(line.contains("\"q002\":-1"))
  }

  test("every query has an oracle or is a documented rows-only path") {
    val rowsOnly = Set("q72_minhash_lsh", "q75_ann_lsh",
      "q82_ann_ivf", "q86_ann_pq", "q106_approx_variants")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty,
      s"queries without oracle SQL and not declared rows-only: $missing")
  }
}
