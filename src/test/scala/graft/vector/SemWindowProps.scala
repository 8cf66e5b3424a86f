package graft.vector

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Randomized lock on the semantic-dedup rank window (the BandingProps
  * discipline applied to the hot-cell cap): for random cell layouts,
  * score ties included, the bucketed [[SimilarityQueries.windowCandidates]]
  * join must produce EXACTLY the sorted-neighborhood model's pair set —
  * every (a, b) in the same cell within `cap` ranks under the
  * (score, vec_id) order, nothing else — and its size must respect the
  * n·cap hard bound the 100 TB argument rests on.
  */
object SemWindowProps extends Properties("semWindow") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val layout = for {
    n <- Gen.choose(0, 40)
    cap <- Gen.choose(1, 6)
    cells <- Gen.listOfN(n, Gen.choose(0, 2))
    scores <- Gen.listOfN(n, Gen.choose(0, 5)) // small range forces ties
  } yield (cap, cells.zip(scores).zipWithIndex.map {
    case ((c, s), i) => (i.toLong, c, s.toDouble)
  })

  property("bucketed window join equals the in-memory sorted-neighborhood model") =
    forAll(layout) { case (cap, rows) =>
      val ranked = rows.toDF("vec_id", "cell", "score")
        .withColumn("v", array(lit(1.0)))
        .withColumn("fn", lit(1.0)).withColumn("xn", lit(1.0))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"cell").orderBy($"score", $"vec_id")))
      val got = SimilarityQueries.windowCandidates(ranked, cap)
        .select($"ia", $"ib").as[(Long, Long)].collect().toSet
      val model = rows.groupBy(_._2).values.flatMap { grp =>
        val order = grp.sortBy(r => (r._3, r._1)).map(_._1).toVector
        for {
          i <- order.indices
          j <- (i + 1) until math.min(i + cap + 1, order.size)
        } yield (order(i), order(j))
      }.toSet
      got == model && got.size <= rows.size * cap
    }
}
