package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** The engine's query surface: one named entry per operator in SURVEY.md §2
  * plus the large-scale pipeline extensions. Each query is paired with an
  * ANSI-SQL oracle (DuckDB) over the same parquet tables; see
  * [[graft.SparkEntry]] for the driver contract.
  *
  * Determinism rules (FIXTURES.md harness notes):
  *   - every checked query ends in an explicit ORDER BY on a unique key;
  *   - no `uuid()`/`rand()` in checked output;
  *   - double aggregates go through [[graft.functions.Exact]] so the result
  *     is independent of partitioning / add order.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-shaped pricing summary: scan-heavy filter + group-by.
    *
    * Scale notes: the filter and the 7-column projection are pushed into the
    * parquet scan (PushedFilters / ReadSchema); aggregation is partial
    * (map-side) then final — the shuffle carries only |groups| ≈ 6 rows per
    * partition, so this stays scan-bound at any SF.
    */
  val q1PricingSummary: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** name -> (query, Some(oracle sql) | None for rows-only-checked ops) */
  /** Rows-only checked (decode stub is JVM code, not SQL-expressible). */
  val multimodalPipeline: Q =
    (s, _) => graft.multimodal.Multimodal.pipelineSummary(s, 200)

  val all: Map[String, (Q, Option[String])] = {
    val modules: Seq[Map[String, (Q, Option[String])]] = Seq(
      Map(
        "q1_pricing_summary" -> (q1PricingSummary, Some(q1PricingSummarySql)),
        "multimodal_pipeline" -> (multimodalPipeline, None)),
      RefQueries.all, TpchQueries.all, EventQueries.all,
      AdvancedJoins.all, RelationalExtras.all,
      graft.text.TextQueries.all, graft.text.DedupQueries.all,
      graft.vector.SimilarityQueries.all,
      graft.streaming.StreamQueries.all)
    // a duplicate name would silently shadow an earlier query AND its
    // oracle, dropping a gated operator from the correctness surface —
    // fail loudly instead
    val dupes = modules.flatMap(_.keys)
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dupes.isEmpty,
      s"duplicate query names across modules: ${dupes.mkString(", ")}")
    modules.reduce(_ ++ _)
  }

  def queries: Map[String, Q] = all.map { case (k, (q, _)) => k -> q }
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, Some(sql))) => k -> sql }
}
