package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

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

  test("DDL creates the table plus the reference's five secondary indexes") {
    assert(JdbcUpsertSink.ddl.length == 6)
    assert(JdbcUpsertSink.ddl.head.contains("CREATE TABLE IF NOT EXISTS locations"))
    assert(JdbcUpsertSink.ddl.head.contains("id UUID PRIMARY KEY DEFAULT gen_random_uuid()"))
    Seq("locid", "loctimezone", "country", "locname", "business").foreach { c =>
      assert(JdbcUpsertSink.ddl.exists(_.contains(s"idx_locations_$c")))
    }
  }
}
