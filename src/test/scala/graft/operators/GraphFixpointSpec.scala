package graft.operators

import scala.collection.mutable

import graft.{Queries, SparkSpec, Tables}
import graft.pipeline.CurationQueries

/** Locks the two round-8 graph fixpoints against independent in-memory
  * models (the KcoreSpec discipline):
  *
  *  - `graph_label_propagation`: the Spark histogram-argmax round is
  *    checked against a literal synchronous-LPA simulation (count
  *    neighbor labels, take max count then min label) — agreement pins
  *    the tie rule and the round count end-to-end.
  *  - `graph_bfs_layers`: the min-plus relaxation is checked against a
  *    queue BFS, and the corpus diameter is pinned ≤ 12 so the fixed
  *    16-round unroll keeps a 4-round margin — corpus drift that
  *    stretches the graph fails HERE before the engines could ever
  *    desynchronize. A path-graph case pins the INF semantics: nodes
  *    beyond the round budget must report unreached, not a partial
  *    distance.
  */
class GraphFixpointSpec extends SparkSpec {
  import spark.implicits._

  private def graph(dir: String): (Seq[Long], Map[Long, Set[Long]]) = {
    val ids = Tables(spark, dir, "documents").select($"doc_id")
      .as[Long].collect().toSeq.sorted
    val n = ids.length.toLong
    val und = ids.flatMap { s =>
      Seq((s * 7 + 1) % n, (s * 13 + 2) % n, (s * 29 + 3) % n)
        .filter(_ != s).map(d => (math.min(s, d), math.max(s, d)))
    }.toSet
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    und.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    (ids, adj.map { case (k, v) => k -> v.toSet }.toMap)
  }

  test("label propagation matches the in-memory synchronous model") {
    val (ids, adj) = graph(sf0001)
    var lab = ids.map(v => v -> v).toMap
    for (_ <- 1 to 5) {
      lab = ids.map { v =>
        val nb = adj.getOrElse(v, Set.empty)
        if (nb.isEmpty) v -> lab(v)
        else {
          val hist = nb.toSeq.map(lab).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          val best = hist.toSeq.minBy { case (l, c) => (-c, l) }._1
          v -> best
        }
      }.toMap
    }
    val expect = lab.values.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
      .toSeq.sortBy { case (l, sz) => (-sz, l) }.take(100)
    val got = Queries.queries("graph_label_propagation")(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(got == expect,
      s"community histogram diverged; got ${got.take(5)} vs ${expect.take(5)}")
  }

  test("bfs layers match queue BFS and the diameter stays within margin") {
    val (ids, adj) = graph(sf0001)
    val dist = mutable.Map(0L -> 0L)
    val q = mutable.Queue(0L)
    while (q.nonEmpty) {
      val v = q.dequeue()
      adj.getOrElse(v, Set.empty).foreach { u =>
        if (!dist.contains(u)) { dist(u) = dist(v) + 1; q += u }
      }
    }
    val maxD = dist.values.max
    assert(maxD <= 12,
      s"BFS eccentricity from node 0 is $maxD — the fixed 16-round unroll " +
        "is out of margin; bump BOTH the Spark loop and the oracle chain")
    val expect = ids.map(v => dist.getOrElse(v, -1L))
      .groupBy(identity).map { case (d, xs) => (d, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = Queries.queries("graph_bfs_layers")(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(got == expect, s"layer histogram diverged; got $got vs $expect")
  }

  test("bfs relaxation caps at the round budget (path graph INF semantics)") {
    val n = 40
    val docs = (0 until n).map(_.toLong).toDF("doc_id")
    val und = (0 until n - 1).map(i => (i.toLong, i + 1L))
    val adj = (und ++ und.map(_.swap)).toDF("src", "dst")
    val exact = CurationQueries.bfsLoop(docs, adj, 0L, rounds = n)
      .as[(Long, Long)].collect().toMap
    assert((0 until n).forall(v => exact(v.toLong) == v.toLong),
      "full-budget relaxation must recover exact path distances")
    val capped = CurationQueries.bfsLoop(docs, adj, 0L, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert((0 to 10).forall(v => capped(v.toLong) == v.toLong),
      "within-budget nodes must hold exact distances")
    assert((11 until n).forall(v => capped(v.toLong) == 999999L),
      "beyond-budget nodes must stay at INF (reported as unreached), " +
        "never a partial distance")
  }
}
