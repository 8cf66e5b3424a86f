package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SharedSpark

/** Property check: the distributed min-label-propagation components must
  * equal a sequential union-find on random graphs — including path
  * shapes (worst-case diameter for the pointer-jumping loop), isolated
  * pairs, and dense blobs.
  */
object ConnectedComponentsSpec extends Properties("connectedComponents") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(6, 30) // nodes 0..n
    m <- Gen.choose(3, 40)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
    // splice in one long path so low-diameter randomness can't hide a
    // propagation bug that only bites on chains
    chainLen <- Gen.choose(5, 12)
  } yield {
    val off = n.toLong + 100
    es.filter { case (a, b) => a != b } ++
      (0 until chainLen).map(i => (off + i, off + i + 1))
  }

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("fixpoint labels equal union-find components") =
    forAll(edgesGen) { edges =>
      edges.isEmpty || {
        val expected = unionFind(edges)
        val got = ConnectedComponents
          .run(edges.toDF("a", "b").localCheckpoint(true), "a", "b")
          .as[(Long, Long)].collect().toMap
        got == expected
      }
    }
}
