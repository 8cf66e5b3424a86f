package graft

import org.apache.spark.sql.functions._

/** Pins the partition-spec-evolution mechanics under
  * lake_partition_evolution: the new-spec commit carries every old-spec
  * file ENTRY unchanged (spec evolution is metadata, never a rewrite),
  * the unified read null-fills the new partition column exactly for
  * old-layout rows, and the logical table is the exact union of both
  * layouts.
  */
class PartitionEvolutionSpec extends SparkSpec {

  test("new-spec commit carries old files; read spans both layouts") {
    import spark.implicits._
    val root = s"${Scratch.dir}/graft_pe_spec_${Scratch.runToken}"
    val base = Tables(spark, sf0001, "orders")
      .filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    operators.Snapshots.commit(spark, root, base, "o_orderstatus")
    val m1 = operators.Snapshots.manifest(root, 1).toSet
    val delta = Tables(spark, sf0001, "orders")
      .filter($"o_orderkey" % 2 === 1)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus",
        expr("(year(o_orderdate) * 100 + month(o_orderdate))").as("o_month"))
    operators.Snapshots.commit(spark, root, delta, "o_month",
      carry = _ => true)
    val m2 = operators.Snapshots.manifest(root, 2).toSet
    assert(m1.subsetOf(m2), "spec evolution must never drop old files")
    assert((m2 -- m1).forall(_.contains("o_month=")),
      "every new file must live under the new spec's layout")
    assert(m1.forall(_.contains("o_orderstatus=")),
      "old files stay under the old spec's layout")
    val unified = operators.Snapshots.read(spark, root, 2)
      .select($"o_orderkey", $"o_month").collect()
    graft.CacheTracker.releaseAll()
    unified.foreach { r =>
      val even = r.getAs[Long]("o_orderkey") % 2 == 0
      assert(r.isNullAt(r.fieldIndex("o_month")) == even,
        s"key ${r.getAs[Long]("o_orderkey")}: month null-fill wrong")
    }
    val n = Tables(spark, sf0001, "orders").count()
    assert(unified.length == n, "unified read must be the exact union")
  }
}
