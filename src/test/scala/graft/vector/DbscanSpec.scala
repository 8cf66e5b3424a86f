package graft.vector

import graft.SparkSpec

class DbscanSpec extends SparkSpec {

  private def run(ids: Seq[Long], edges: Seq[(Long, Long)], minPts: Int) = {
    val s = spark
    import s.implicits._
    val out = SimilarityQueries.dbscanRoles(
      ids.toDF("vec_id"),
      graft.CacheTracker.persistTracked(edges.toDF("va", "vb")),
      minPts)
      .as[(Long, Long, String, Long)].collect().toSeq
    graft.CacheTracker.releaseAll()
    out.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("core/border/noise on a 4-clique plus tail plus isolate") {
    // 1-2-3-4 complete (deg 3 each -> core), 5 hangs off 4 (deg 1 ->
    // border into the clique's cluster), 6 isolated (noise)
    val got = run(
      ids = Seq(1L, 2L, 3L, 4L, 5L, 6L),
      edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L), (4L, 5L)),
      minPts = 3)
    assert(got(1L) == ((3L, "core", 1L)))
    assert(got(2L) == ((3L, "core", 1L)))
    assert(got(3L) == ((3L, "core", 1L)))
    assert(got(4L) == ((4L, "core", 1L)))
    assert(got(5L) == ((1L, "border", 1L)))
    assert(got(6L) == ((0L, "noise", -1L)))
  }

  test("two clusters bridged by a border point stay separate") {
    // cliques {1,2,3,4} and {11,12,13,14}; 7 touches a core in EACH but
    // is not core itself -> border, assigned the LOWEST cluster id;
    // the clusters must NOT merge through it (no core-core path)
    val clique = (b: Long) => Seq((b, b + 1), (b, b + 2), (b, b + 3),
      (b + 1, b + 2), (b + 1, b + 3), (b + 2, b + 3))
    val got = run(
      ids = (1L to 4L) ++ (11L to 14L) :+ 7L,
      edges = clique(1L) ++ clique(11L) ++ Seq((1L, 7L), (11L, 7L)),
      minPts = 3)
    assert(got(7L) == ((2L, "border", 1L)))
    assert((1L to 4L).forall(i => got(i)._3 == 1L && got(i)._2 == "core"))
    assert((11L to 14L).forall(i => got(i)._3 == 11L && got(i)._2 == "core"))
  }

  test("a chain of cores merges into one cluster transitively") {
    // path 1-2-3-4-5 with minPts=2: every interior node has deg 2 ->
    // core; ends deg 1 -> border; one cluster spanning the chain
    val got = run(
      ids = 1L to 5L,
      edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      minPts = 2)
    assert(Seq(2L, 3L, 4L).forall(i => got(i) == ((2L, "core", 2L))))
    assert(got(1L) == ((1L, "border", 2L)))
    assert(got(5L) == ((1L, "border", 2L)))
  }
}
