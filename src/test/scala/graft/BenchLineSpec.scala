package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's bench-parse contract: the stdout JSON line must fit
  * the driver's 2000-byte stdout tail (with sbt's ~160 bytes of
  * [info]/[success] noise after it) or BENCH_r{N}.json records
  * "parsed": null. Pure key arithmetic — no SparkSession needed.
  */
class BenchLineSpec extends AnyFunSuite {

  test("short-key bench JSON line fits the 2000-byte stdout tail") {
    val keys = SparkEntry.queries.keys.toSeq
    val prefixes = keys.map(_.takeWhile(_ != '_'))
    assert(prefixes.size == prefixes.distinct.size,
      "duplicate qNN prefixes would force full-name keys past the tail window")
    // worst case: every value prints as "9.9"/"999" (Bench.fmtShort clamps
    // the short line to 1 decimal under 10 s, integer seconds above; a
    // query ≥1000 s breaks its 2x pin gate long before it breaks this
    // format, and failures print "-1")
    val perQuery = prefixes.map(p => p.length + 2 /* quotes */ + 1 /* : */ +
      3 /* value */ + 1 /* comma */).sum
    val overhead = """{"metric":"total","value":9999.99,"unit":"sec","queries":{}""".length +
      ""","sf":"sf0.1"}""".length
    // nothing is printed after the JSON line (Bench stops Spark first);
    // only sbt's [info] prefix + [success] trailer share the tail
    val sbtNoise = 7 /* [info]  */ + 100 /* [success] Total time line */
    assert(perQuery + overhead + sbtNoise < 2000,
      s"bench line estimate ${perQuery + overhead + sbtNoise}B nears the 2000B tail " +
        "window - shorten keys or split the line before adding more queries")
  }

  test("every query has an oracle or is a documented rows-only path") {
    val rowsOnly = Set("q72_minhash_lsh", "q75_ann_lsh",
      "q82_ann_ivf", "q86_ann_pq", "q106_approx_variants")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty,
      s"queries without oracle SQL and not declared rows-only: $missing")
  }
}
