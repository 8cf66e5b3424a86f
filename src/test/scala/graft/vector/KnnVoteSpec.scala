package graft.vector

import graft.SparkSpec

class KnnVoteSpec extends SparkSpec {

  test("majority vote: highest count wins, ties go to the lowest label") {
    val s = spark
    import s.implicits._
    val ballots = Seq(
      // clear majority
      (1L, 2), (1L, 2), (1L, 2), (1L, 0), (1L, 1),
      // 2-2-1 tie between labels 3 and 1 -> lowest label (1) wins
      (2L, 3), (2L, 3), (2L, 1), (2L, 1), (2L, 0),
      // unanimous
      (3L, 7), (3L, 7), (3L, 7), (3L, 7), (3L, 7))
      .toDF("q_id", "label")
    val got = SimilarityQueries.majorityVote(ballots)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2, 3L), (2L, 1, 2L), (3L, 7, 5L)))
  }

  test("vote is partition-invariant (one aggregation, no rank window)") {
    val s = spark
    import s.implicits._
    val ballots = (1 to 500).map(i => ((i % 7).toLong, i % 3)).toDF("q_id", "label")
    val a = SimilarityQueries.majorityVote(ballots.repartition(1))
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val b = SimilarityQueries.majorityVote(ballots.repartition(32))
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
  }
}
