package graft

import java.sql.Timestamp

/** Structural invariants of `scd2_dimension_history` that the row-hash
  * gate alone would not explain if they broke: every key's version
  * chain is rooted at the first snapshot, contiguous (each closed
  * version's valid_to equals its successor's valid_from), and carries
  * exactly one open (current) version — the properties an as-of
  * dimension join relies on.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("every history chain is contiguous, rooted, and singly-current") {
    val rows = Queries.queries("scd2_dimension_history")(spark, sf0001)
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    val root = Timestamp.valueOf("2020-01-01 00:00:00")
    rows.foreach { case (key, vs) =>
      val chain = vs.sortBy(_._3.getTime)
      assert(chain.head._3 == root, s"key $key chain not rooted at v0")
      assert(chain.count(_._5) == 1, s"key $key current-flag count != 1")
      assert(chain.last._5 && chain.last._4.isEmpty,
        s"key $key open interval must be the LAST version")
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"key $key gap: valid_to ${a._4} != next valid_from ${b._3}")
          assert(a._2 != b._2,
            s"key $key adjacent versions must differ (change detection)")
        case _ =>
      }
    }
  }
}
