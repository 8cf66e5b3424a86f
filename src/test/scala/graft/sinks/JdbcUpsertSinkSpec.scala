package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.Location

/** The sink's SQL generation (the DB-free part; the merge semantics are
  * oracle-tested via graft.operators.Upsert and ref_upsert_merge).
  */
class JdbcUpsertSinkSpec extends AnyFunSuite {

  test("multi-row upsert SQL has the reference's statement shape") {
    val sql = JdbcUpsertSink.upsertSql(2)
    assert(sql.contains("INSERT INTO locations (locid, loctimezone, country, locname, business)"))
    assert(sql.contains("($1, $2, $3, $4, $5)"))
    assert(sql.contains("($6, $7, $8, $9, $10)"))
    assert(sql.contains("ON CONFLICT (locid) DO UPDATE SET"))
    assert(sql.contains("loctimezone = EXCLUDED.loctimezone"))
    // last-write-wins updates every business column, never the key or id
    assert(!sql.contains("locid = EXCLUDED"))
    assert(!sql.contains("id ="))
  }

  test("golden SQL: the Postgres upsert text matches the reference field-for-field") {
    // the one dialect no sandbox database can execute (db.go:63-72
    // targets a live Postgres) is pinned as text instead, whitespace-
    // normalized, so it cannot drift silently: same column order, same
    // row-major $n placeholder layout, same conflict target, and the
    // same four EXCLUDED assignments in the reference's order
    def norm(s: String): String = s.trim.split("\\s+").mkString(" ")
    assert(norm(JdbcUpsertSink.upsertSql(3)) == norm(
      """INSERT INTO locations (locid, loctimezone, country, locname, business)
        |VALUES
        |($1, $2, $3, $4, $5),
        |($6, $7, $8, $9, $10),
        |($11, $12, $13, $14, $15)
        |ON CONFLICT (locid) DO UPDATE SET
        |  loctimezone = EXCLUDED.loctimezone,
        |  country = EXCLUDED.country,
        |  locname = EXCLUDED.locname,
        |  business = EXCLUDED.business""".stripMargin))
  }

  test("DDL creates the table plus the reference's five secondary indexes") {
    assert(JdbcUpsertSink.ddl.length == 6)
    assert(JdbcUpsertSink.ddl.head.contains("CREATE TABLE IF NOT EXISTS locations"))
    assert(JdbcUpsertSink.ddl.head.contains("id UUID PRIMARY KEY DEFAULT gen_random_uuid()"))
    Seq("locid", "loctimezone", "country", "locname", "business").foreach { c =>
      assert(JdbcUpsertSink.ddl.exists(_.contains(s"idx_locations_$c")))
    }
  }
}

/** write() executed against a REAL database: Spark's classpath ships
  * embedded Apache Derby. Derby supports neither ON CONFLICT nor a
  * VALUES-sourced MERGE, so the DerbyUpsert dialect renders the same
  * keyed last-write-wins contract as batched UPDATE-then-INSERT (safe
  * under the sink's by-key partitioning). The in-memory Derby instance
  * is shared by every task in local mode, so the distributed
  * foreachPartition path, the chunking, and the real PreparedStatement
  * round-trip all execute — insert, cross-batch update, and
  * intra-batch duplicate resolution included.
  */
class JdbcUpsertSinkDerbySpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def loc(id: Int, business: String) = Location(
    f"LOC$id%012d", "Europe/London", "UK", s"name_$id", business)

  private def readAll(): Map[String, String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT locid, business FROM locations")
      val b = Map.newBuilder[String, String]
      while (rs.next()) b += rs.getString(1) -> rs.getString(2)
      b.result()
    } finally conn.close()
  }

  test("insert -> update -> intra-batch dup through write() on embedded Derby") {
    import spark.implicits._
    JdbcUpsertSink.ensureTable(url, JdbcUpsertSink.DerbyUpsert)
    // ensureTable is idempotent even without IF NOT EXISTS support
    JdbcUpsertSink.ensureTable(url, JdbcUpsertSink.DerbyUpsert)

    // 1: insert 100 fresh keys, chunked small enough to exercise many
    // round-trips and partitions
    val acc = spark.sparkContext.longAccumulator("rows")
    JdbcUpsertSink.write((1 to 100).map(loc(_, "base")).toDS(),
      url, parallelism = 4, chunkSize = 7, rowsWritten = Some(acc),
      dialect = JdbcUpsertSink.DerbyUpsert)
    assert(readAll().size == 100)
    assert(acc.value == 100)
    assert(readAll()(f"LOC${50}%012d") == "base")

    // 2: cross-batch update of 30 existing keys + 10 new inserts
    JdbcUpsertSink.write(
      ((21 to 50).map(loc(_, "updated")) ++ (101 to 110).map(loc(_, "fresh"))).toDS(),
      url, parallelism = 3, chunkSize = 12000,
      dialect = JdbcUpsertSink.DerbyUpsert)
    val after = readAll()
    assert(after.size == 110)
    assert(after(f"LOC${30}%012d") == "updated")
    assert(after(f"LOC${51}%012d") == "base")
    assert(after(f"LOC${105}%012d") == "fresh")

    // 3: intra-batch duplicates — a single Postgres statement would fail
    // on these ("cannot affect row a second time"); the sink's lastWins
    // dedup resolves ONE winner before any SQL executes. With the
    // default constant seq the winner is the deterministic column
    // tiebreak (max business desc).
    JdbcUpsertSink.write(Seq(loc(1, "v1"), loc(1, "v3"), loc(1, "v2")).toDS(),
      url, dialect = JdbcUpsertSink.DerbyUpsert)
    assert(readAll()(f"LOC${1}%012d") == "v3")
  }
}
