package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.util.LongAccumulator

import graft.model.Location
import graft.operators.Upsert

/** Faithful port of the reference's batched keyed upsert sink
  * (O6-O8 in SURVEY.md §2; `internal/db/db.go:43-110`).
  *
  * Design mapping (SURVEY.md §4):
  *   - the reference's hand-rolled pool of 10 upsert workers fed by a
  *     bounded channel (`internal/writer/writer.go:20,50,53-68`) becomes
  *     `repartition(parallelism)` + one JDBC connection per partition task —
  *     Spark's scheduler supplies the backpressure and the parallelism knob
  *     scales with the cluster instead of a hard-coded constant;
  *   - 12 000-row multi-row `INSERT ... VALUES ... ON CONFLICT (locid)
  *     DO UPDATE` statements (`writer.go:19`, `db.go:50-74`) are preserved:
  *     one round-trip per chunk;
  *   - rows are deduplicated per key BEFORE writing (Upsert.lastWins) —
  *     Postgres rejects a statement touching the same key twice
  *     (SURVEY.md §1.4), a failure mode the reference can hit;
  *   - the atomic progress counter (`writer.go:52,63-64`, O12) becomes a
  *     Spark LongAccumulator;
  *   - same at-least-once, non-transactional semantics as the reference
  *     (no txn around chunks, `db.go:74`): task retries are safe because
  *     the upsert is idempotent.
  *
  * Not on the correctness-gate path (no Postgres in the harness); the
  * pure-Spark merge semantics are oracle-tested via graft.operators.Upsert,
  * and `write()` itself executes end-to-end against embedded Apache Derby
  * (on Spark's classpath) in JdbcUpsertSinkDerbySpec via the
  * [[UpsertDialect]] seam.
  */
object JdbcUpsertSink {

  /** DDL from the reference (`internal/db/db.go:83-103`): table + secondary
    * indexes. Executed once from the driver.
    */
  val ddl: Seq[String] = Seq(
    """CREATE TABLE IF NOT EXISTS locations (
      |  id UUID PRIMARY KEY DEFAULT gen_random_uuid(),
      |  locid TEXT UNIQUE,
      |  loctimezone TEXT,
      |  country TEXT,
      |  locname TEXT,
      |  business TEXT
      |)""".stripMargin) ++
    Seq("locid", "loctimezone", "country", "locname", "business").map(c =>
      s"CREATE INDEX IF NOT EXISTS idx_locations_$c ON locations ($c)")

  /** Multi-row upsert SQL for `n` rows — same statement shape as
    * `internal/db/db.go:63-72` (5 placeholders per row, conflict on locid,
    * last-write-wins via EXCLUDED).
    */
  def upsertSql(n: Int): String = {
    val values = (0 until n)
      .map(i => s"(${(1 to 5).map(j => s"$$${i * 5 + j}").mkString(", ")})")
      .mkString(",\n")
    s"""INSERT INTO locations (locid, loctimezone, country, locname, business)
       |VALUES
       |$values
       |ON CONFLICT (locid) DO UPDATE SET
       |  loctimezone = EXCLUDED.loctimezone,
       |  country = EXCLUDED.country,
       |  locname = EXCLUDED.locname,
       |  business = EXCLUDED.business""".stripMargin
  }

  /** JDBC uses `?` placeholders rather than `$n`. */
  private def upsertSqlJdbc(n: Int): String =
    upsertSql(n).replaceAll("\\$\\d+", "?")

  /** Upsert-chunk dialect seam. The reference's target (and the faithful
    * default) is Postgres' atomic multi-row `ON CONFLICT`; [[DerbyUpsert]]
    * renders the same last-write-wins contract for engines without an
    * upsert statement (Derby rejects both ON CONFLICT and VALUES-sourced
    * MERGE) as batched UPDATE-then-INSERT — safe here because the sink
    * hash-partitions BY KEY, so no two connections ever race on one key.
    * Its purpose is to let the round-trip test drive `write()` through
    * the embedded Derby on Spark's classpath — a real database instead
    * of string-asserted SQL.
    */
  sealed trait UpsertDialect extends Serializable {
    def ddl: Seq[String]
    def upsertChunk(conn: Connection, chunk: Seq[Location]): Unit
  }

  case object PostgresUpsert extends UpsertDialect {
    def ddl: Seq[String] = JdbcUpsertSink.ddl

    def upsertChunk(conn: Connection, chunk: Seq[Location]): Unit = {
      val ps = conn.prepareStatement(upsertSqlJdbc(chunk.size))
      try {
        chunk.iterator.zipWithIndex.foreach { case (l, i) =>
          ps.setString(i * 5 + 1, l.locid)
          ps.setString(i * 5 + 2, l.loctimezone)
          ps.setString(i * 5 + 3, l.country)
          ps.setString(i * 5 + 4, l.locname)
          ps.setString(i * 5 + 5, l.business)
        }
        ps.executeUpdate()
      } finally ps.close()
    }
  }

  case object DerbyUpsert extends UpsertDialect {
    // Derby has no TEXT / IF NOT EXISTS / gen_random_uuid; the contract
    // under test is the keyed upsert, not the Postgres DDL niceties
    def ddl: Seq[String] = Seq(
      """CREATE TABLE locations (
        |  locid VARCHAR(255) PRIMARY KEY,
        |  loctimezone VARCHAR(255),
        |  country VARCHAR(255),
        |  locname VARCHAR(255),
        |  business VARCHAR(255)
        |)""".stripMargin)

    def upsertChunk(conn: Connection, chunk: Seq[Location]): Unit = {
      val upd = conn.prepareStatement(
        """UPDATE locations SET loctimezone = ?, country = ?, locname = ?,
          |  business = ? WHERE locid = ?""".stripMargin)
      val counts =
        try {
          chunk.foreach { l =>
            upd.setString(1, l.loctimezone); upd.setString(2, l.country)
            upd.setString(3, l.locname); upd.setString(4, l.business)
            upd.setString(5, l.locid); upd.addBatch()
          }
          upd.executeBatch()
        } finally upd.close()
      val misses = chunk.iterator.zip(counts.iterator)
        .collect { case (l, 0) => l }.toSeq
      if (misses.nonEmpty) {
        val ins = conn.prepareStatement(
          """INSERT INTO locations (locid, loctimezone, country, locname,
            |  business) VALUES (?, ?, ?, ?, ?)""".stripMargin)
        try {
          misses.foreach { l =>
            ins.setString(1, l.locid); ins.setString(2, l.loctimezone)
            ins.setString(3, l.country); ins.setString(4, l.locname)
            ins.setString(5, l.business); ins.addBatch()
          }
          ins.executeBatch()
        } finally ins.close()
      }
    }
  }

  def ensureTable(url: String, dialect: UpsertDialect = PostgresUpsert): Unit = {
    val conn = DriverManager.getConnection(url)
    try dialect.ddl.foreach { stmt =>
      val st = conn.createStatement()
      try st.execute(stmt)
      catch {
        // Derby lacks IF NOT EXISTS: swallow "already exists" (X0Y32)
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      } finally st.close()
    } finally conn.close()
  }

  private def writeChunk(conn: Connection, chunk: Seq[Location],
                         dialect: UpsertDialect): Unit =
    if (chunk.nonEmpty) dialect.upsertChunk(conn, chunk)

  /** Distributed upsert write. `parallelism` mirrors the reference's 10
    * workers but should be sized to the target DB's connection budget.
    *
    * Before writing, rows are deduplicated per `locid` (last-wins by `seq`,
    * default constant 0 → deterministic via Upsert.lastWins' implicit
    * tiebreak) and hash-repartitioned BY KEY: a multi-row
    * `ON CONFLICT DO UPDATE` touching the same key twice fails in Postgres
    * ("cannot affect row a second time"), and the same key landing in two
    * partitions would race nondeterministically across connections.
    */
  def write(
      ds: Dataset[Location],
      url: String,
      parallelism: Int = 10,
      chunkSize: Int = 12000,
      rowsWritten: Option[LongAccumulator] = None,
      seq: Column = lit(0L),
      dialect: UpsertDialect = PostgresUpsert): Unit = {
    import ds.sparkSession.implicits._
    val deduped = Upsert.lastWins(ds.toDF(), Seq("locid"), seq)
      .repartition(parallelism, col("locid"))
      .as[Location]
    deduped.foreachPartition { (it: Iterator[Location]) =>
      if (it.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(true)
          it.grouped(chunkSize).foreach { chunk =>
            writeChunk(conn, chunk, dialect)
            rowsWritten.foreach(_.add(chunk.size.toLong))
          }
        } finally conn.close()
      }
    }
  }
}
