package graft.pipeline

import graft.SparkSpec

/** Definitional pin for water-filling allocation: the emitted level is
  * the MAX-FIT level (total allocation fits the budget, level+1 would
  * not), uncapped sources are taken whole, capped sources all sit at
  * the level — recomputed in plain Scala from the gate's own rows.
  */
class WaterFillingSpec extends SparkSpec {

  test("level is max-fit, small sources whole, capped sources at the level") {
    val rows = graft.Queries.queries("curate_water_filling")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    val lvl = rows.head._3
    assert(rows.forall(_._3 == lvl), "one level for every source")
    val total = rows.map(_._2).sum
    val budget = total * 3 / 5
    def alloc(l: Long) = rows.map(r => math.min(r._2, l)).sum
    assert(alloc(lvl) <= budget, s"allocation ${alloc(lvl)} exceeds $budget")
    assert(alloc(lvl + 1) > budget,
      s"level not maximal: ${alloc(lvl + 1)} still fits $budget")
    rows.foreach { case (src, n, _, a, capped) =>
      if (capped == 1) assert(n > lvl && a == lvl, s"$src capped but a=$a")
      else assert(n <= lvl && a == n, s"$src uncapped but a=$a n=$n")
    }
  }
}
