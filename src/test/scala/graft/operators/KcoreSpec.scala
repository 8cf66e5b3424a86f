package graft.operators

import scala.collection.mutable

import graft.{Queries, SparkSpec, Tables}

/** Locks `graph_kcore`'s h-index fixpoint against the CLASSIC peeling
  * algorithm (repeatedly delete the minimum-degree vertex; a vertex's
  * core number is the highest minimum degree seen when it leaves) — a
  * completely different formulation, so agreement pins the semantics
  * rather than the implementation. Also pins convergence-by-8 of the
  * h-index iteration on this corpus: the fixed 10 rounds both engines
  * run carry a 2-round margin, and corpus drift that slows convergence
  * fails HERE before it could ever desynchronize the oracle.
  */
class KcoreSpec extends SparkSpec {
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

  test("h-index coreness equals classic min-degree peeling") {
    val (ids, adj) = graph(sf0001)
    // peel: remove a minimum-degree vertex, tracking the running max of
    // the minimum degree — that max at removal time IS the core number
    val deg = mutable.Map(ids.map(v => v -> adj.get(v).fold(0)(_.size)): _*)
    val alive = mutable.Set(ids: _*)
    val core = mutable.Map.empty[Long, Long]
    var k = 0L
    while (alive.nonEmpty) {
      val v = alive.minBy(x => (deg(x), x))
      k = math.max(k, deg(v).toLong)
      core(v) = k
      alive -= v
      adj.getOrElse(v, Set.empty).foreach { u =>
        if (alive(u)) deg(u) -= 1
      }
    }
    val got = Queries.queries("graph_kcore")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got.size == ids.size, "one core number per document")
    val diff = ids.filter(v => got(v) != core(v))
    assert(diff.isEmpty,
      s"${diff.size} nodes disagree with peeling, e.g. " +
        diff.take(5).map(v => s"$v: hIndex=${got(v)} peel=${core(v)}"))
  }

  test("h-index iteration reaches its fixpoint within 8 rounds (10 are run)") {
    val (ids, adj) = graph(sf0001)
    var est = ids.map(v => v -> adj.get(v).fold(0L)(_.size.toLong)).toMap
    var converged = -1
    for (r <- 1 to 10 if converged < 0) {
      val next = ids.map { v =>
        val vals = adj.getOrElse(v, Set.empty).toSeq.map(est).sortBy(-_)
        v -> vals.zipWithIndex
          .map { case (c, i) => math.min(c, i + 1L) }
          .foldLeft(0L)(math.max)
      }.toMap
      if (next == est) converged = r
      est = next
    }
    assert(converged >= 1 && converged <= 8,
      s"h-index fixpoint took ${if (converged < 0) ">10" else converged} " +
        "rounds — the fixed 10-round unroll is out of margin; re-measure " +
        "and bump BOTH the Spark loop and the oracle chain together")
  }
}
