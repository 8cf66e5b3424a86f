package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry-point parity gates. Every other gate declares its plan via
  * the DataFrame DSL; nothing proved that a SQL-FIRST user of the engine
  * — temp views + `spark.sql(...)` text, with the custom function
  * surface resolving through the SQL parser — gets bit-identical
  * results. These route representative shapes (scan-heavy aggregate,
  * ranking window + join, the as-of union-window composition, and the
  * native-expression surface) through SQL text, hash-gated against the
  * SAME DuckDB oracles as their DSL twins where one exists.
  *
  * The Spark SQL strings intentionally spell out the decimal detour
  * (`CAST(SUM(CAST(x AS DECIMAL(22,6))) AS DOUBLE)`) exactly as
  * [[graft.functions.Exact]] builds it in the DSL: same expression tree
  * after parsing, same values on any partitioning.
  *
  * Scale: each gate's physical plan is identical to its DSL twin's
  * (Catalyst resolves both to the same logical plan), so the §9 scale
  * receipts carry over — this surface guards the ENTRY POINT, not a new
  * operator.
  */
object SqlQueries {
  import Queries.Q

  /** Register the tables a gate reads as temp views (through [[Tables]],
    * so schema fixups and the function-registry choke point both apply)
    * and run the SQL text. Views are re-registered per call: queries run
    * sequentially, so a later dir simply replaces the views.
    */
  private def overViews(s: SparkSession, dir: String, tables: Seq[String],
      sql: String): DataFrame = {
    tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_$t"))
    s.sql(sql)
  }

  val sqlQ1: Q = (s, dir) => overViews(s, dir, Seq("lineitem"),
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) / COUNT(1) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) / COUNT(1) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(22,6))) AS DOUBLE) / COUNT(1) AS avg_disc,
      |  COUNT(1) AS count_order
      |FROM graft_lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  val sqlWindowTop3: Q = (s, dir) => overViews(s, dir,
    Seq("customer", "nation"),
    """SELECT n_name, c_custkey, c_acctbal, rk FROM (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    dense_rank() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM graft_customer) c
      |JOIN graft_nation ON c_nationkey = n_nationkey
      |WHERE rk <= 3 ORDER BY n_name, rk, c_custkey""".stripMargin)

  /** The as-of composition ([[AdvancedJoins.asofPurchaseClick]]) as pure
    * SQL text — union the tagged sides, carry the latest click forward
    * with `last(..., true) IGNORE NULLS` over the (key, time) window.
    * The oracle stays DuckDB's native ASOF LEFT JOIN.
    */
  val sqlAsof: Q = (s, dir) => overViews(s, dir, Seq("events"),
    """WITH c0 AS (
      |  SELECT user_id, ts, value,
      |    row_number() OVER (PARTITION BY user_id, ts
      |                       ORDER BY event_id DESC) AS rn
      |  FROM graft_events WHERE event_type = 'click'),
      |c AS (SELECT user_id, ts, value, 0 AS tag,
      |        CAST(NULL AS BIGINT) AS purchase_id
      |      FROM c0 WHERE rn = 1),
      |p AS (SELECT user_id, ts, CAST(NULL AS DOUBLE) AS value, 1 AS tag,
      |        event_id AS purchase_id
      |      FROM graft_events WHERE event_type = 'purchase'),
      |u AS (SELECT * FROM c UNION ALL SELECT * FROM p),
      |w AS (SELECT user_id, purchase_id, ts, tag,
      |    last(CASE WHEN tag = 0 THEN ts END, true) OVER (
      |      PARTITION BY user_id ORDER BY ts, tag
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts,
      |    last(CASE WHEN tag = 0 THEN value END, true) OVER (
      |      PARTITION BY user_id ORDER BY ts, tag
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value
      |  FROM u)
      |SELECT user_id, purchase_id, ts, click_ts, click_value
      |FROM w WHERE tag = 1 ORDER BY purchase_id""".stripMargin)

  /** The native expression surface under the SQL parser: grapheme_count,
    * codepoints, nfc_normalize, and rolling_hash64 resolving from
    * SQL text (the [[graft.functions.Registry]] triples — identical to
    * what GraftExtensions injects at session build).
    */
  val sqlNativeFns: Q = (s, _) => {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    graft.text.Utf8Queries.docs.toDF("doc_id", "text", "lang")
      .createOrReplaceTempView("graft_utf8_docs")
    s.sql(
      """SELECT doc_id,
        |  grapheme_count(text) AS n_graphemes,
        |  size(codepoints(text)) AS n_codepoints,
        |  md5(nfc_normalize(text)) AS nfc_fp,
        |  rolling_hash64(regexp_replace(text, '[^ -~]', '')) AS ascii_fp
        |FROM graft_utf8_docs ORDER BY doc_id""".stripMargin)
  }

  val sqlNativeFnsSql: String = {
    val cp = graft.functions.Codepoints.sql("text")
    val rh = graft.functions.RollingHash64.sql(
      "regexp_replace(text, '[^ -~]', '', 'g')")
    s"""WITH ${graft.text.Utf8Queries.sqlDocsCte},
       |t AS (SELECT doc_id, text FROM utf8_docs)
       |SELECT doc_id,
       |  CAST(length_grapheme(text) AS INTEGER) AS n_graphemes,
       |  CAST(length($cp) AS INTEGER) AS n_codepoints,
       |  md5(nfc_normalize(text)) AS nfc_fp,
       |  $rh AS ascii_fp
       |FROM t ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "sql_q1_pricing" -> (sqlQ1, Some(Queries.q1PricingSummarySql)),
    "sql_window_top3" -> (sqlWindowTop3, Some(TpchQueries.windowTop3Sql)),
    "sql_asof_purchase_click" -> (sqlAsof, Some(AdvancedJoins.asofSql)),
    "sql_native_functions" -> (sqlNativeFns, Some(sqlNativeFnsSql)))
}
