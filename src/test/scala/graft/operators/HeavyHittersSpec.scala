package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The Misra-Gries guarantees the two-pass heavy-hitter gate rests on,
  * checked directly on the aggregator's reduce/merge (no Spark session
  * needed — the combine tree is simulated over random partitionings,
  * which is exactly the degree of freedom Spark exercises at runtime):
  *
  *  1. every item with true frequency > n/(m+1) is in the summary;
  *  2. every estimate is within [true − n/(m+1), true];
  *  3. the summary never exceeds capacity or invents items;
  *
  * for ANY split of the stream into partitions and any merge order. If
  * these hold, the exact-rescore second pass makes the gate output
  * equal the exact answer, which is what the DuckDB oracle checks
  * end-to-end in `text_heavy_hitters`.
  */
object HeavyHittersSpec extends Properties("MisraGries") {

  private def run(m: Int, parts: Seq[Seq[(String, Long)]]): Map[String, Long] = {
    val agg = new MisraGries(m)
    val summaries = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = summaries.foldLeft(agg.zero)(agg.merge)
    merged.words.zip(merged.counts).toMap
  }

  private def unit(parts: Seq[Seq[String]]): Seq[Seq[(String, Long)]] =
    parts.map(_.map(_ -> 1L))

  private val streamGen = for {
    n <- Gen.choose(50, 400)
    // skewed alphabet so heavy items actually occur
    toks <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.const("hot1")), (5, Gen.const("hot2")),
      (2, Gen.oneOf("w1", "w2", "w3")),
      (1, Gen.choose(1, 30).map(i => s"cold$i"))))
    nParts <- Gen.choose(1, 7)
  } yield (toks, nParts)

  property("guarantee holds under random streams and partitionings") =
    forAll(streamGen) { case (toks, nParts) =>
      val m = 4
      val n = toks.size
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // deterministic round-robin split into nParts partitions
      val parts = toks.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1)).toSeq
      val est = run(m, unit(parts))
      val bound = n.toDouble / (m + 1)
      val capacityOk = est.size <= m
      val survivorsOk = exact.forall { case (w, c) =>
        c <= bound || est.contains(w) }
      val boundsOk = exact.forall { case (w, c) =>
        val e = est.getOrElse(w, 0L)
        e <= c && e >= c - bound
      }
      val noInvented = est.keys.forall(exact.contains)
      capacityOk && survivorsOk && boundsOk && noInvented
    }

  property("merge tree shape preserves the guarantee") = {
    val toks = (1 to 100).map(i => s"x${i % 10}") ++ Seq.fill(60)("hh")
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.size
    val m = 3
    val agg = new MisraGries(m)
    val parts = toks.grouped(32).toSeq
      .map(_.map(_ -> 1L).foldLeft(agg.zero)(agg.reduce))
    val left = parts.reduceLeft(agg.merge)
    val right = parts.reduceRight(agg.merge)
    Seq(left, right).forall { s =>
      val est = s.words.zip(s.counts).toMap
      est.contains("hh") && est.forall { case (w, e) =>
        e <= exact(w) && e >= exact(w) - n.toDouble / (m + 1) }
    }
  }

  /** Weighted updates (a weight-k insert ≡ k unit inserts for the
    * guarantee, error bound in TOTAL WEIGHT W): the bound that lets a
    * pre-weighted stream — the gate's planted replication factor, or a
    * map-side combined partial — sketch without row-per-unit
    * materialization.
    */
  private val weightedGen = for {
    n <- Gen.choose(30, 200)
    toks <- Gen.listOfN(n, Gen.zip(
      Gen.frequency(
        (6, Gen.const("hot1")), (3, Gen.const("hot2")),
        (1, Gen.choose(1, 25).map(i => s"cold$i"))),
      Gen.choose(1L, 50L)))
    nParts <- Gen.choose(1, 6)
  } yield (toks, nParts)

  property("weighted guarantee holds in total weight") =
    forAll(weightedGen) { case (toks, nParts) =>
      val m = 4
      val bigW = toks.map(_._2).sum
      val exact = toks.groupMapReduce(_._1)(_._2)(_ + _)
      val parts = toks.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1)).toSeq
      val est = run(m, parts)
      val bound = bigW.toDouble / (m + 1)
      val survivorsOk = exact.forall { case (w, c) =>
        c <= bound || est.contains(w) }
      val boundsOk = exact.forall { case (w, c) =>
        val e = est.getOrElse(w, 0L)
        e <= c && e >= c - bound
      }
      est.size <= m && survivorsOk && boundsOk &&
        est.keys.forall(exact.contains)
    }

  property("weighted run equals unit-expanded run's guarantee envelope") =
    forAll(weightedGen) { case (toks, nParts) =>
      // the two runs may hold different summaries (decrement timing
      // differs) but BOTH must contain every item above the bound —
      // the property the gate's exact-rescore depends on
      val m = 4
      val bigW = toks.map(_._2).sum
      val exact = toks.groupMapReduce(_._1)(_._2)(_ + _)
      val bound = bigW.toDouble / (m + 1)
      val parts = toks.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1)).toSeq
      val weighted = run(m, parts)
      val expanded = run(m, parts.map(_.flatMap { case (w, c) =>
        Seq.fill(c.toInt)(w -> 1L) }))
      exact.forall { case (w, c) =>
        c <= bound || (weighted.contains(w) && expanded.contains(w)) }
    }
}
