package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.operators.Salt

/** Remaining relational surface: skew-salted joins, scalar subqueries,
  * histogram binning, and unpivot/melt.
  */
object RelationalExtras {
  import Queries.Q

  /** Skewed-join shape with explicit salting: events (the big, potentially
    * hot-keyed side) salted by event_id, customer dimension replicated 8
    * ways, joined on (key, salt). The oracle is the PLAIN join — salting
    * must not change semantics, only the shuffle layout.
    */
  val skewSalted: Q = (s, dir) => {
    import s.implicits._
    val events = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"value")
    val users = Tables(s, dir, "customer")
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    Salt.saltedJoin(events, users, "user_id", $"event_id", 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
      .orderBy($"c_mktsegment")
  }

  val skewSaltedSql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_events,
       |  ${sqlDsum("value")} AS total_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Scalar subquery: orders priced above the (exact-decimal) global
    * average — Catalyst plans the subquery once and broadcasts the scalar.
    */
  val scalarSubquery: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_sq")
    s.sql(scalarSubqueryBody("orders_sq"))
  }

  private def scalarSubqueryBody(t: String): String =
    s"""SELECT o_orderkey, o_totalprice
       |FROM $t
       |WHERE o_totalprice > 1.5 * (SELECT ${sqlDavg("o_totalprice")} FROM $t)
       |ORDER BY o_orderkey""".stripMargin

  val scalarSubquerySql: String = scalarSubqueryBody("orders")

  /** Histogram binning via integer bucket arithmetic (portable across
    * engines, unlike width_bucket variants).
    */
  val valueHistogram: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy(floor($"o_totalprice" / 50000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .withColumn("bucket_lo", ($"bucket" * 50000.0).cast("double"))
      .orderBy($"bucket")
  }

  val valueHistogramSql: String =
    s"""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total,
       |  CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS DOUBLE) AS bucket_lo
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Unpivot (melt): wide per-part numeric columns to (part, metric,
    * value) long form — the inverse of pivot.
    */
  val unpivotParts: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "part")
      .filter($"p_partkey" <= 200)
      .select($"p_partkey", $"p_size".cast("double").as("p_size"),
        $"p_retailprice")
      .unpivot(Array($"p_partkey"), Array($"p_size", $"p_retailprice"),
        "metric", "value")
      .orderBy($"p_partkey", $"metric")
  }

  val unpivotPartsSql: String =
    """SELECT p_partkey, metric, value FROM (
      |  SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
      |  FROM part WHERE p_partkey <= 200
      |  UNION ALL
      |  SELECT p_partkey, 'p_retailprice', p_retailprice
      |  FROM part WHERE p_partkey <= 200)
      |ORDER BY p_partkey, metric""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "join_skew_salted" -> (skewSalted, Some(skewSaltedSql)),
    "scalar_subquery_above_avg" -> (scalarSubquery, Some(scalarSubquerySql)),
    "agg_value_histogram" -> (valueHistogram, Some(valueHistogramSql)),
    "unpivot_part_metrics" -> (unpivotParts, Some(unpivotPartsSql))
  )
}
