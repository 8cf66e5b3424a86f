package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Pins the MECHANISM of `curate_dp_histogram`'s noise — the hash-gated
  * oracle proves both engines draw the same integers, but only this
  * spec proves those integers follow the two-sided geometric
  * distribution the ε=1 privacy claim rests on. The draw is replayed
  * in plain JVM code (MessageDigest md5, the [[graft.functions.KeyHash]]
  * recipe) over 40 000 fixed keys, so every assertion is deterministic:
  * the point masses must track p₀·α^|x|, the distribution must be
  * symmetric, and — the boundary the original sign-split construction
  * violated at ratio 2e — adjacent outcomes must stay within the e^ε
  * likelihood ratio.
  */
class DpNoiseSpec extends AnyFunSuite {

  private val thresholds: Seq[Long] = graft.pipeline.CurationQueries.dpThresholds
  private val alpha = math.exp(-1.0)
  private val p0 = (1 - alpha) / (1 + alpha)

  private def hash48(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
  }

  private def noise(m: Long): Long = {
    val i = thresholds.count(_ <= m)
    if (i == 0) 0L else if (i % 2 == 1) (i + 1L) / 2 else -(i / 2L)
  }

  test("point masses track p0*alpha^|x|, symmetric, within the e^eps ratio") {
    val n = 40000
    val draws = (0 until n).map(i => noise(hash48(s"dph|cell$i")))
    def p(x: Long) = draws.count(_ == x).toDouble / n
    assert(math.abs(p(0) - p0) < 0.01, s"P(0) = ${p(0)} drifted from $p0")
    assert(math.abs(p(1) - p0 * alpha) < 0.01,
      s"P(1) = ${p(1)} drifted from ${p0 * alpha}")
    assert(math.abs(p(-1) - p0 * alpha) < 0.01,
      s"P(-1) = ${p(-1)} drifted from ${p0 * alpha}")
    assert(math.abs(p(2) - p0 * alpha * alpha) < 0.005,
      s"P(2) = ${p(2)} drifted from ${p0 * alpha * alpha}")
    // the DP boundary: adjacent-outcome likelihood ratios must sit at
    // e^eps = e, NOT 2e (the uniform-sign construction's failure)
    val r01 = p(0) / p(1)
    assert(r01 > math.E * 0.85 && r01 < math.E * 1.15,
      s"P(0)/P(1) = $r01 must be ~e = ${math.E} (2e would break eps=1-DP)")
    assert(draws.map(math.abs).max <= 20,
      "noise cannot exceed the +-20 truncation")
  }

  test("thresholds are the exact truncated two-sided-geometric CDF table") {
    assert(thresholds.length == 40)
    assert(thresholds == thresholds.sorted, "CDF thresholds must increase")
    assert(thresholds.distinct.size == 40, "thresholds must be strict")
    assert(thresholds.head ==
      math.floor(p0 * math.pow(2.0, 48)).toLong)
    // the lumped tail past the last threshold is the delta term
    // (p0*a^20 + the beyond-+-20 remainder ~ 2.1e-9): < 1e-8
    val tail = 1.0 - thresholds.last.toDouble / math.pow(2.0, 48)
    assert(tail < 1e-8, s"truncation mass $tail exceeds the documented delta")
  }
}
