package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import VectorOps._

/** Adversarial pin for the round-9 double-screen argmin: cells
  * engineered to tie within the screen margin must resolve by the
  * EXACT window identically to the all-exact min(struct) formulation —
  * the construction the provable-superset argument says cannot differ,
  * checked on the inputs most likely to break it.
  */
class ScreenedArgminSpec extends SparkSpec {

  test("near-tied cells resolve exactly like the all-exact argmin") {
    import spark.implicits._
    val dim = 64
    // corpus: 40 vectors spread over a deterministic grid
    val vecs = spark.range(40).select($"id".as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        d => (($"id" * 31 + d * 17) % 97).cast("double") / 97.0).as("v"))
    // centroid pairs: c1 = c0 + 1e-9 on one dim (screen-margin tie),
    // c2 clearly separated — every vector sees both regimes at once
    val base = transform(sequence(lit(1), lit(dim)),
      d => (d % 7).cast("double") / 7.0)
    val cents = spark.range(1).select(explode(array(
        struct(lit(0).as("c_label"), base.as("cv")),
        struct(lit(1).as("c_label"),
          transform(base, (x, i) =>
            when(i === 0, x + lit(1e-9)).otherwise(x)).as("cv")),
        struct(lit(2).as("c_label"),
          transform(base, x => x + lit(0.5)).as("cv")))).as("c"))
      .select($"c.c_label", $"c.cv")
      .withColumn("cc", dotExact($"cv", $"cv"))
    val corpus = vecs
      .withColumn("fn", sqrt(dotFast($"v", $"v")))
      .withColumn("xn", normExact($"v"))
    // screened path (what semRanked runs)
    val screened = SimilarityQueries.semRanked(corpus, cents)
      .select($"vec_id", $"cell", $"score").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    // all-exact reference
    val brute = corpus
      .crossJoin(broadcast(cents))
      .select($"vec_id", $"c_label",
        ($"cc" - lit(2.0) * dotExact($"v", $"cv")).as("score"))
      .groupBy($"vec_id")
      .agg(min(struct($"score", $"c_label")).as("b"))
      .select($"vec_id", $"b.c_label", $"b.score").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    graft.CacheTracker.releaseAll()
    assert(screened.keySet === brute.keySet)
    screened.foreach { case (id, (cell, score)) =>
      assert(brute(id) === ((cell, score)),
        s"vec $id: screened ($cell, $score) != exact ${brute(id)}")
    }
    // the tie really exercised the margin: winners must be split between
    // the two near-tied cells only (cell 2 is never competitive)
    assert(screened.values.forall(_._1 != 2))
  }
}
