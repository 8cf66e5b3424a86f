package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Definitional pins for the power-iteration PCA, complementing the
  * cross-engine oracle: on a PLANTED two-direction spectrum the 8
  * rounds must actually recover the dominant direction, and on any
  * corpus the emitted certificate must respect its eigenvalue bounds.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("planted dominant direction is recovered; certificate bounds hold") {
    // 500 vectors in span{d, e}: v_i = a_i·d + b_i·e with d = dim 3,
    // e = dim 17 (orthogonal unit vectors), a_i spread ~6x wider than
    // b_i — the top eigenvector is (a cos of) d, dominantly
    val corpus = spark.range(500).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        when(j === 3, ($"id" % 21 - 10).cast("double"))
          .when(j === 17, (($"id" * 7) % 5 - 2).cast("double"))
          .otherwise(lit(0.0))).as("v"))
    val rows = SimilarityQueries.pcaOn(corpus).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    graft.CacheTracker.releaseAll()
    assert(rows.length == 64)
    val x = rows.map(_._2)
    val lam = rows.head._3
    // quantized unit vector
    val nrm = x.map(v => v * v).sum
    assert(math.abs(nrm - 1.0) < 1e-4, s"not unit norm: $nrm")
    // recovery: all mass on dim 3 (plus the small a·b cross-term tilt
    // toward dim 17); nothing anywhere else
    assert(math.abs(x(3)) > 0.99, s"dominant loading ${x(3)}")
    assert(x.zipWithIndex.forall { case (v, i) =>
      i == 3 || i == 17 || v == 0.0 }, "mass outside the planted span")
    // certificate: var(a) <= lam <= var(a) + var(b) (trace of the 2x2)
    val a = (0 until 500).map(i => (i % 21 - 10).toDouble)
    val b = (0 until 500).map(i => ((i * 7) % 5 - 2).toDouble)
    def varOf(s: Seq[Double]) = {
      val m = s.sum / s.length
      s.map(v => (v - m) * (v - m)).sum / s.length
    }
    val (va, vb) = (varOf(a), varOf(b))
    assert(lam >= va - 1e-6 && lam <= va + vb + 1e-6,
      s"lambda $lam outside [$va, ${va + vb}]")
  }

  test("rounding stays far from the half-point grid on the real corpus") {
    // round(double, k) is the documented cross-engine tie hazard (Spark
    // rounds the shortest decimal repr, DuckDB the expanded binary); a
    // flip needs the scaled value within ~1e-9 of a half-point. Pin the
    // measured distance-to-tie of every iterate quotient (1e-6 grid) and
    // the final lambda (1e-9 grid) with ≥10x headroom over the flip zone
    // scaled by the usual drift margin, so a corpus regeneration that
    // drifts toward a tie fails HERE instead of flipping engines in the
    // oracle gate (r11 ADVICE).
    val m = SimilarityQueries.pcaTieMargin(spark, "/root/testdata/sf0.001")
    graft.CacheTracker.releaseAll()
    info(s"measured PCA tie margin: $m")
    assert(m > 1e-5, s"PCA rounding margin $m is inside the tie-risk zone")
  }
}
