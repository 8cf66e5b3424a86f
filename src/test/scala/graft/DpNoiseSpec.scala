package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Pins the MECHANISM of `curate_dp_histogram`'s noise — the hash-gated
  * oracle proves both engines draw the same integers, but only this
  * spec proves those integers follow the two-sided geometric
  * distribution the ε=1 privacy claim rests on. The draw is replayed
  * in plain JVM code (MessageDigest md5, the [[graft.functions.KeyHash]]
  * recipe) over 20 000 fixed keys, so every assertion is deterministic:
  * tail frequencies must track e^(−j·ε) and the sign bit must be
  * unbiased.
  */
class DpNoiseSpec extends AnyFunSuite {

  private val thresholds: Seq[Long] = graft.pipeline.CurationQueries.dpThresholds

  private def hash48(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
  }

  test("magnitude tail tracks e^-j and the sign bit is unbiased") {
    val n = 20000
    val draws = (0 until n).map { i =>
      val m = hash48(s"dph|cell$i")
      val u47 = m / 2
      val k = thresholds.count(_ > u47)
      val s = if (m % 2 == 0) 1 else -1
      (s, k)
    }
    def tail(j: Int) = draws.count(_._2 >= j).toDouble / n
    // P(k >= j) = T_j / 2^47 = e^-j exactly by construction; the
    // empirical rate over 20k md5 draws sits within binomial noise
    assert(math.abs(tail(1) - math.exp(-1)) < 0.01,
      s"P(k>=1) = ${tail(1)} drifted from e^-1")
    assert(math.abs(tail(2) - math.exp(-2)) < 0.01,
      s"P(k>=2) = ${tail(2)} drifted from e^-2")
    assert(math.abs(tail(3) - math.exp(-3)) < 0.005,
      s"P(k>=3) = ${tail(3)} drifted from e^-3")
    val meanSign = draws.map(_._1).sum.toDouble / n
    assert(math.abs(meanSign) < 0.02, s"sign bias $meanSign")
    assert(draws.map(_._2).max <= thresholds.length,
      "magnitude cannot exceed the threshold table")
  }

  test("thresholds are the exact floor(2^47 e^-j) table both dialects embed") {
    assert(thresholds.length == 32)
    assert(thresholds.head == math.floor(math.exp(-1) * math.pow(2.0, 47)).toLong)
    assert(thresholds == thresholds.sorted.reverse, "must decrease")
    assert(thresholds.last >= 1)
  }
}
