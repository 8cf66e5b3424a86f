package graft

/** Physical-plan regression guards: the scale properties the queries are
  * designed around must survive refactors — filters reaching the parquet
  * scan, projections pruning the read schema, fixed-size dims being
  * broadcast, and the hot aggregation path staying in WholeStageCodegen.
  */
class PlanSpec extends SparkSpec {

  /** Final (post-AQE) physical plan: materialize first, or the string is
    * the pre-execution plan without codegen stages.
    */
  private def plan(name: String): String = {
    val df = Queries.queries(name)(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q1 pushes the shipdate filter into the scan and prunes columns") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "q1 must not read unused columns")
    // '*(n)' prefixes mark WholeStageCodegen stages in the compact plan
    assert(p.contains("*("), p)
  }

  test("q3 pushes all three dimension filters into their scans") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
  }

  test("q5 broadcasts the constant-size nation/region dims") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("EqualTo(r_name,ASIA)"), p)
  }

  test("pagination plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("ref_pagination")
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
