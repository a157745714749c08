package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VdafParse

class VdafParseSpec extends AnyFunSuite {

  test("correctWraparound: values above 2^127 wrap to negatives mod the field prime") {
    assert(VdafParse.correctWraparound(BigInt(5)) == BigInt(5))
    // prime - 1 ≡ -1
    assert(VdafParse.correctWraparound(VdafParse.FieldPrime - 1) == BigInt(-1))
    // exactly the cutoff stays positive (strict >)
    val cutoff = BigInt(2).pow(127)
    assert(VdafParse.correctWraparound(cutoff) == cutoff)
  }

  test("parseHistogram: list literal → indexed, corrected histogram") {
    val h = VdafParse.parseHistogram(
      s"[10, 0, ${VdafParse.FieldPrime - 3}]")
    assert(h == Map(0 -> BigInt(10), 1 -> BigInt(0), 2 -> BigInt(-3)))
    assert(VdafParse.parseHistogram("[]") == Map.empty)
  }
}
