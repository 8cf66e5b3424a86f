package graft.sinks

import java.sql.DriverManager

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SharedSpark
import graft.model.Location

/** Property-based equivalence of the Derby dialect's UPDATE-then-INSERT
  * rendering against [[graft.operators.Upsert.lastWins]]: for ANY multiset
  * of rows with duplicate keys, split arbitrarily into sequential write()
  * batches, the final table state must equal folding lastWins over the
  * batches in order. This pins the dialect seam (the contract both
  * [[JdbcUpsertSink.PostgresUpsert]] and [[JdbcUpsertSink.DerbyUpsert]]
  * render) against drift while no Postgres is available to execute.
  */
object JdbcUpsertDialectProps extends Properties("jdbc-upsert-dialect") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SharedSpark.spark

  /** Rows over a small key space so intra- and cross-batch duplicates are
    * common; payload columns vary so the deterministic tiebreak matters.
    */
  private val rowGen: Gen[Location] = for {
    k <- Gen.choose(1, 12)
    tz <- Gen.oneOf("Europe/London", "Asia/Tokyo", "UTC")
    name <- Gen.oneOf("na", "nb", "nc")
    biz <- Gen.oneOf("b1", "b2", "b3", "b4")
  } yield Location(f"PLOC$k%08d", tz, "UK", name, biz)

  private val batchesGen: Gen[List[List[Location]]] =
    Gen.choose(1, 3).flatMap(nb => Gen.listOfN(nb,
      Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, rowGen))))

  /** In-memory model of lastWins with the sink's default constant seq:
    * winner per key = max over the implicit all-columns tiebreak, i.e.
    * the lexicographically greatest (loctimezone, country, locname,
    * business) tuple — Spark string ordering is binary, which matches
    * Java's for this ASCII data.
    */
  private def modelWinner(rows: Seq[Location]): Map[String, Location] =
    rows.groupBy(_.locid).map { case (k, vs) =>
      k -> vs.maxBy(l => (l.loctimezone, l.country, l.locname, l.business))
    }

  private def readAll(url: String): Map[String, Location] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT locid, loctimezone, country, locname, business FROM locations")
      val b = Map.newBuilder[String, Location]
      while (rs.next())
        b += rs.getString(1) -> Location(rs.getString(1), rs.getString(2),
          rs.getString(3), rs.getString(4), rs.getString(5))
      b.result()
    } finally conn.close()
  }

  private val dbN = new java.util.concurrent.atomic.AtomicInteger(0)

  property("sequential Derby write() batches == folding lastWins per batch") =
    forAll(batchesGen) { batches =>
      import spark.implicits._
      // fresh in-memory database per case: state must come only from the
      // writes under test
      val url = s"jdbc:derby:memory:graftprop${dbN.incrementAndGet()};create=true"
      JdbcUpsertSink.ensureTable(url, JdbcUpsertSink.DerbyUpsert)
      batches.foreach { b =>
        JdbcUpsertSink.write(b.toDS(), url, parallelism = 3, chunkSize = 5,
          dialect = JdbcUpsertSink.DerbyUpsert)
      }
      val expected = batches.foldLeft(Map.empty[String, Location]) {
        (acc, b) => acc ++ modelWinner(b)
      }
      val actual = readAll(url)
      // Derby reports a successful in-memory drop via SQLException 08006
      try DriverManager.getConnection(url.replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => }
      actual == expected
    }
}
