package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.{AdvancedJoins, SharedSpark}

/** Pins `join_interval_overlap`'s bucket-grid core against the
  * brute-force inequality join: for ANY interval sets and ANY grid
  * size, the bucketed plan must produce exactly the overlapping pairs,
  * each exactly once — the later-start-cell dedup rule is the subtle
  * part (a pair whose intervals share several grid cells must be
  * emitted from precisely one of them). Generators deliberately
  * produce touching endpoints (no overlap under half-open [s, e)),
  * nested spans, and intervals far longer than the grid.
  */
object OverlapProps extends Properties("intervalOverlap") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val interval: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(0L, 400L)
    l <- Gen.frequency((1, Gen.chooseNum(1L, 12L)),
      (1, Gen.chooseNum(1L, 150L)))
  } yield (s, s + l)

  private val shape = for {
    as <- Gen.listOfN(25, interval)
    bs <- Gen.listOfN(25, interval)
    grid <- Gen.oneOf(1L, 7L, 64L)
  } yield (as, bs, grid)

  property("bucket-grid pairs equal brute-force overlap pairs, exactly once") =
    forAll(shape) { case (as, bs, grid) =>
      val a = as.zipWithIndex
        .map { case ((s0, e0), i) => (i.toLong, s0, e0) }
        .toDF("aid", "as_", "ae")
      val b = bs.zipWithIndex
        .map { case ((s0, e0), i) => (i.toLong, s0, e0) }
        .toDF("bid", "bs", "be")
      val got = AdvancedJoins.overlapPairs(a, b, grid)
        .select($"aid", $"bid").as[(Long, Long)].collect().toSeq
      val expect = for {
        ((s1, e1), i) <- as.zipWithIndex
        ((s2, e2), j) <- bs.zipWithIndex
        if s1 < e2 && s2 < e1
      } yield (i.toLong, j.toLong)
      got.sorted == expect.sorted && got.distinct.size == got.size
    }

  property("touching half-open intervals never pair; nested ones always do") = {
    val a = Seq((0L, 0L, 10L)).toDF("aid", "as_", "ae")
    val b = Seq((0L, 10L, 20L), (1L, 2L, 3L), (2L, 9L, 10L))
      .toDF("bid", "bs", "be")
    val got = AdvancedJoins.overlapPairs(a, b, 4L)
      .select($"bid").as[Long].collect().toSet
    // [0,10) overlaps nested [2,3) and boundary-interior [9,10) but
    // NOT touching [10,20)
    org.scalacheck.Prop(got == Set(1L, 2L))
  }
}
