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

  /** The convergence check is folded into the round: each round runs
    * exactly 3 jobs (checkpoint m1, checkpoint next, convergence scan)
    * — a regression to a join-vs-previous count would add a 4th.
    * Listener delivery is async, so poll until the count is stable.
    */
  property("rounds cost exactly 3 jobs each") = {
    val sc = spark.sparkContext
    val edges = (0L until 12L).map(i => (i, i + 1)).toList
      .toDF("a", "b").localCheckpoint(true)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // AQE stage materialization and broadcast-exchange collects each
    // spawn their own jobs — pin both off so 1 action == 1 job and the
    // per-round budget is deterministic
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.addSparkListener(listener)
    val rounds =
      try {
        val (_, r) = ConnectedComponents.runCounted(edges, "a", "b")
        var (prev, stable) = (-1, 0)
        while (stable < 3) { // 3 consecutive stable polls ≈ bus drained
          Thread.sleep(100)
          val now = jobs.get()
          if (now == prev) stable += 1 else { prev = now; stable = 0 }
        }
        r
      } finally {
        sc.removeSparkListener(listener)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      }
    // setup = 3 jobs (und checkpoint, the r16 LoopConf width-sizing
    // count over the checkpointed blocks, initial labels checkpoint)
    jobs.get() == 3 + 3 * rounds
  }
}
