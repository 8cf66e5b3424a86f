package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** Extended relational surface over the TPC-H-ish corpus (SURVEY.md §2
  * category checklist: joins, aggregations, windows, set ops, sorts/top-k,
  * scalar functions — all marked *absent* in the reference and supplied here
  * Spark-natively).
  *
  * Scale notes applied throughout:
  *   - dimension tables of FIXED cardinality (region=5, nation=25) are
  *     explicitly `broadcast()` — no shuffle of the fact side, at any SF;
  *   - tables that GROW with SF (customer, supplier, part) are joined with
  *     shuffle joins and left to AQE to pick broadcast at small SF;
  *   - filters are applied before joins so parquet pushdown (PushedFilters)
  *     and column pruning (ReadSchema) shrink the scan — the dominant cost
  *     at 100 TB;
  *   - every double aggregate goes through [[graft.functions.Exact]]
  *     (order-independent decimal sums) so results are identical on 1 or
  *     10 000 partitions;
  *   - every query ends in an ORDER BY whose trailing key is unique, so
  *     the oracle hash-compare is stable.
  */
object TpchQueries {
  import Queries.Q

  private def ts(d: String) = lit(d).cast("timestamp")

  // ---------------------------------------------------------------- joins

  /** TPC-H Q3-shaped shipping priority: 3-way join, agg, top-10.
    * lineitem⋈orders shuffle on orderkey; customer side is filtered to one
    * segment before the join. AQE may broadcast the filtered customer side
    * at low SF; at high SF all three shuffle on their keys — the minimum.
    */
  val q3ShippingPriority: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select("c_custkey")
    val ord = Tables(s, dir, "orders")
      .filter($"o_orderdate" < ts("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" > ts("1998-01-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q6-shaped forecasting revenue: the pure scan query — range +
    * band + threshold predicates, ALL pushed into the parquet scan, one
    * partial-then-final aggregate of a single decimal sum. At 100 TB
    * this is the query whose cost IS the scan; anything beyond pushdown
    * + pruning would be overhead.
    */
  val q6ForecastRevenue: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-01-01") &&
        $"l_shipdate" < ts("1998-01-01") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q6Sql: String =
    s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10-shaped returned-item reporting: customers ranked by
    * revenue lost to returns in a quarter. lineitem/orders/customer
    * shuffle on their keys; constant-size nation broadcasts; top-20 via
    * orderBy+limit plans as TakeOrderedAndProject.
    */
  val q10ReturnedItems: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .filter($"l_returnflag" === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables(s, dir, "orders")
      .filter($"o_orderdate" >= ts("1997-01-01") &&
        $"o_orderdate" < ts("1997-04-01"))
      .select("o_orderkey", "o_custkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-04-01'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q5-shaped local-supplier revenue: 6-table join. region and
    * nation are constant-size → broadcast; supplier/customer/orders/
    * lineitem shuffle on join keys (they all grow with SF).
    */
  val q5RegionRevenue: Q = (s, dir) => {
    import s.implicits._
    val nations = broadcast(
      Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region").filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select("n_nationkey", "n_name"))
    Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables(s, dir, "orders")
          .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1997-01-01"))
          .select("o_orderkey", "o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(nations, $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    s"""SELECT n_name, ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q17-shaped small-quantity revenue: per-key average as a join
    * (the decorrelated form of the correlated subquery — one shuffle on
    * l_partkey for the avg, one for the join; Catalyst/AQE pick the join
    * strategy).
    */
  val q17SmallQty: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQty = li.groupBy($"l_partkey".as("a_partkey"))
      .agg(davg($"l_quantity").as("avg_qty"))
    li.join(avgQty, $"l_partkey" === $"a_partkey")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem l JOIN (
       |  SELECT l_partkey AS a_partkey, ${sqlDavg("l_quantity")} AS avg_qty
       |  FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.a_partkey
       |WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * a.avg_qty""".stripMargin

  /** LEFT OUTER join + aggregation with null-preserving counts: customers
    * against only their high-value orders; customers with none keep a
    * 0-count / null-sum row (the join's null-extension is the point).
    */
  val joinLeftBigOrders: Q = (s, dir) => {
    import s.implicits._
    val big = Tables(s, dir, "orders")
      .filter($"o_totalprice" > 450000.0)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    Tables(s, dir, "customer").select("c_custkey", "c_mktsegment")
      .join(big, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_big_orders"),
        dsum($"o_totalprice").as("big_total"))
      .orderBy($"c_custkey")
  }

  val joinLeftSql: String =
    s"""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders,
       |  ${sqlDsum("o_totalprice")} AS big_total
       |FROM customer LEFT JOIN (
       |  SELECT * FROM orders WHERE o_totalprice > 450000.0) o
       |  ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** LEFT SEMI: orders having at least one max-quantity lineitem. Spark
    * plans a semi join — the probe side streams, no duplicate expansion.
    */
  val joinSemi: Q = (s, dir) => {
    import s.implicits._
    val maxed = Tables(s, dir, "lineitem")
      .filter($"l_quantity" >= 50.0).select("l_orderkey")
    Tables(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .join(maxed, $"o_orderkey" === $"l_orderkey", "left_semi")
      .orderBy($"o_orderkey")
  }

  val joinSemiSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity >= 50.0)
      |ORDER BY o_orderkey""".stripMargin

  /** LEFT ANTI: the complement — orders with NO max-quantity lineitem. */
  val joinAnti: Q = (s, dir) => {
    import s.implicits._
    val maxed = Tables(s, dir, "lineitem")
      .filter($"l_quantity" >= 50.0).select("l_orderkey")
    Tables(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus")
      .join(maxed, $"o_orderkey" === $"l_orderkey", "left_anti")
      .orderBy($"o_orderkey")
  }

  val joinAntiSql: String =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity >= 50.0)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- windows

  /** Top-3 customers by account balance per nation (dense_rank over a
    * keyed window — one shuffle on the partition key). nation is
    * broadcast for the name lookup.
    */
  val windowTop3PerNation: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables(s, dir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .withColumn("rk", dense_rank().over(w))
      .filter($"rk" <= 3)
      .join(broadcast(Tables(s, dir, "nation").select("n_nationkey", "n_name")),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey", $"c_acctbal", $"rk")
      .orderBy($"n_name", $"rk", $"c_custkey")
  }

  val windowTop3Sql: String =
    """SELECT n_name, c_custkey, c_acctbal, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    dense_rank() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM customer) c JOIN nation ON c_nationkey = n_nationkey
      |WHERE rk <= 3 ORDER BY n_name, rk, c_custkey""".stripMargin

  /** Running (cumulative) order total per customer — a frame-bounded
    * window sum. The sum runs in decimal so the cumulation is exact and
    * engine-independent.
    */
  val windowRunningTotal: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 50)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("running_total",
        sum($"o_totalprice".cast("decimal(22,6)")).over(w).cast("double"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(22,6))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** lag(): days since the customer's previous order (null for the
    * first). Dates are compared as DATE in both engines.
    */
  val windowOrderGap: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 50)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .withColumn("gap_days",
        datediff(to_date($"o_orderdate"), to_date($"prev_date")))
      .select($"o_custkey", $"o_orderkey", $"gap_days")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val windowGapSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day',
      |    CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS INT) AS gap_days
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------------- set ops

  /** INTERSECT / EXCEPT / UNION over key sets, tagged and stacked into one
    * deterministic result. Spark plans these as aggregate/semi-join —
    * one shuffle each.
    */
  val setOps: Q = (s, dir) => {
    import s.implicits._
    val rich = Tables(s, dir, "customer")
      .filter($"c_acctbal" > 9000.0).select($"c_custkey")
    val building = Tables(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val both = rich.intersect(building).withColumn("tag", lit("rich_building"))
    val richOnly = rich.except(building).withColumn("tag", lit("rich_only"))
    val either = rich.union(building).distinct().withColumn("tag", lit("rich_or_building"))
    both.unionByName(richOnly).unionByName(either)
      .orderBy($"tag", $"c_custkey")
  }

  val setOpsSql: String =
    """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0),
      |building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT c_custkey, 'rich_building' AS tag
      |  FROM (SELECT * FROM rich INTERSECT SELECT * FROM building)
      |UNION ALL
      |SELECT c_custkey, 'rich_only' FROM (SELECT * FROM rich EXCEPT SELECT * FROM building)
      |UNION ALL
      |SELECT c_custkey, 'rich_or_building'
      |  FROM (SELECT * FROM rich UNION SELECT * FROM building)
      |ORDER BY tag, c_custkey""".stripMargin

  // ----------------------------------------------------- aggs / groupings

  /** ROLLUP over (status, priority): subtotal rows get an 'ALL' sentinel
    * (portable across engines; source columns are non-null). Partial
    * aggregation still applies — the shuffle carries group rows only.
    */
  val aggRollup: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  val aggRollupSql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
       |  coalesce(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  /** PIVOT: order counts per market segment × status. The pivot values
    * are given explicitly, so no extra distinct-collect job runs.
    */
  val aggPivotStatus: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "customer").select("c_custkey", "c_mktsegment")
      .join(Tables(s, dir, "orders").select("o_custkey", "o_orderstatus"),
        $"c_custkey" === $"o_custkey")
      .groupBy($"c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .orderBy($"c_mktsegment")
  }

  val aggPivotSql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** DISTINCT projection (dedup-as-aggregate; one shuffle on all cols). */
  val aggDistinct: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_orderstatus", $"o_orderpriority")
      .distinct()
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  val aggDistinctSql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ------------------------------------------------- dates / scalar funcs

  /** Month bucketing (date_trunc) — the batch analogue of a tumbling
    * window, grouped with exact sums.
    */
  val dateMonthly: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      .orderBy($"month")
  }

  val dateMonthlySql: String =
    s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total
       |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Scalar string-function surface on part: case mapping, length,
    * token split, regexp extraction, substring, concat — all
    * codegen'd built-ins (SURVEY.md §2 "scalar functions").
    */
  val strPartFuncs: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "part")
      .select(
        $"p_partkey",
        upper($"p_name").as("name_upper"),
        length($"p_name").as("name_len"),
        split_part($"p_type", lit(" "), lit(1)).as("type_first"),
        regexp_extract($"p_brand", "(\\d+)", 1).as("brand_num"),
        substring($"p_name", 1, 5).as("name_pfx"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"))
      .orderBy($"p_partkey")
  }

  val strPartSql: String =
    """SELECT p_partkey, upper(p_name) AS name_upper,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  split_part(p_type, ' ', 1) AS type_first,
      |  regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
      |  substring(p_name, 1, 5) AS name_pfx,
      |  p_brand || '|' || p_type AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------- correlated-subquery shapes

  /** TPC-H Q4-shaped order-priority checking: correlated EXISTS whose
    * predicate references the outer row BEYOND the join key
    * (`l_shipdate > o_orderdate`), written as SQL so Catalyst's
    * subquery decorrelation (RewritePredicateSubquery → left semi join)
    * actually runs — the DataFrame twin would hand-build the semi join
    * and skip the rewrite. One shuffle on orderkey for the semi join;
    * the date filter pushes into the orders scan.
    *
    * (The canonical Q4 correlates on l_commitdate < l_receiptdate; this
    * corpus has no commit/receipt dates — FIXTURES.md — so "shipped after
    * order date" stands in, preserving the non-equi correlated shape.)
    */
  private def q4Body(orders: String, lineitem: String): String =
    s"""SELECT o_orderpriority, COUNT(*) AS order_count
       |FROM $orders
       |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-04-01'
       |  AND EXISTS (SELECT 1 FROM $lineitem
       |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  val q4OrderPriority: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q4")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    s.sql(q4Body("orders_q4", "lineitem_q4"))
  }

  val q4Sql: String = q4Body("orders", "lineitem")

  /** TPC-H Q13-shaped customer order-count distribution: LEFT OUTER join
    * with a predicate on the RIGHT side inside the join condition (so
    * customers whose only orders are urgent still count as 0), then a
    * second aggregate over the first's result. Two shuffles — custkey,
    * then c_count — both unavoidable; the first may broadcast at small SF.
    */
  val q13CustomerDistribution: Q = (s, dir) => {
    import s.implicits._
    val perCust = Tables(s, dir, "customer").select("c_custkey")
      .join(Tables(s, dir, "orders")
          .filter($"o_orderpriority" =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q18-shaped large-volume customers: group-HAVING feeding an IN
    * subquery (SQL form so Catalyst decorrelates the IN into a semi join
    * against the aggregated lineitem), then re-join and re-aggregate for
    * the report. The HAVING threshold (sum qty > 250 ≈ p99 here) keeps
    * the semi-join build side tiny — the property that makes this a
    * broadcast at any SF.
    */
  private def q18Body(customer: String, orders: String, lineitem: String): String =
    s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       |  ${sqlDsum("l_quantity")} AS sum_qty
       |FROM $customer
       |  JOIN $orders ON c_custkey = o_custkey
       |  JOIN $lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM $lineitem
       |  GROUP BY l_orderkey
       |  HAVING ${sqlDsum("l_quantity")} > 250)
       |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin

  val q18LargeVolume: Q = (s, dir) => {
    Tables(s, dir, "customer").createOrReplaceTempView("customer_q18")
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q18")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q18")
    s.sql(q18Body("customer_q18", "orders_q18", "lineitem_q18"))
  }

  val q18Sql: String = q18Body("customer", "orders", "lineitem")

  /** TPC-H Q14-shaped type-share revenue: conditional aggregate over a
    * month of lineitem joined to part — the numerator is a CASE inside
    * the same exact-decimal sum as the denominator, so the share is one
    * deterministic division of two order-independent sums.
    */
  val q14TypeShare: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-03-01") && $"l_shipdate" < ts("1997-04-01"))
      .select($"l_partkey",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    li.join(Tables(s, dir, "part").select("p_partkey", "p_type"),
        $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) * dsum(when($"p_type" === "ECONOMY", $"rev").otherwise(0.0)) /
        dsum($"rev")).as("economy_revenue_pct"),
        count(lit(1)).as("n_lines"))
  }

  val q14Sql: String =
    s"""SELECT 100.0 * ${sqlDsum("CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |  / ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS economy_revenue_pct,
       |  COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
       |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin

  /** TPC-H Q15-shaped top supplier: a derived revenue view read twice —
    * once as the join input, once under a scalar MAX subquery — selecting
    * the supplier(s) whose quarterly revenue equals the global max.
    * Equality on doubles is safe here because both sides of it are the
    * SAME exact-decimal sums. SQL form so Catalyst plans the scalar
    * subquery (one extra aggregation of the k-row view, broadcast as a
    * literal).
    */
  private def q15Body(supplier: String, lineitem: String): String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM $lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM $supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  /** Executed form: the SQL shape above plans the scalar MAX as a
    * SEPARATE subquery execution, so the revenue view — and the 100 TB
    * lineitem scan under it — runs twice. Instead compute the global max
    * as an empty-window aggregate over the ALREADY-AGGREGATED revenue
    * rows: one lineitem scan, one shuffle on l_suppkey, then a
    * single-partition exchange of only |suppliers| one-row-per-key
    * aggregates (tiny at any SF) for the window. Values are identical —
    * both sides of the equality are the same exact-decimal sums.
    * PlanSpec pins the single-scan shape.
    */
  val q15TopSupplier: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val revenue = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1997-04-01"))
      .groupBy($"l_suppkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("total_revenue"))
      .select($"l_suppkey".as("supplier_no"), $"total_revenue")
    // 1-row aggregate + broadcast, NOT an empty-partition window max:
    // the revenue table is supplier-cardinality (corpus-scaling), and
    // an unkeyed window would drag all of it through one reducer.
    // Persisted: the max side and the filter side both read it
    val rev = graft.CacheTracker.persistTracked(revenue)
    val top = rev
      .crossJoin(broadcast(rev.agg(max($"total_revenue").as("mx"))))
      .filter($"total_revenue" === $"mx")
    Tables(s, dir, "supplier")
      .join(top, $"s_suppkey" === $"supplier_no")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val q15Sql: String = q15Body("supplier", "lineitem")

  /** TPC-H Q19-shaped disjunctive-predicate join: an OR of three
    * brand/size/quantity AND-clauses as the join condition. Catalyst
    * extracts the common `l_partkey = p_partkey` equi-key (hash join,
    * not a cartesian) and pushes the per-side conjuncts
    * (`p_size >= 1`, quantity bands) into the scans.
    */
  val q19Disjunctive: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    li.join(part, $"l_partkey" === $"p_partkey" && (
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30))))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    s"""SELECT ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q20-shaped heavy shippers: IN over a grouped-HAVING subquery
    * keyed by a DIFFERENT grouping (supp × part) than the IN key — the
    * decorrelated plan aggregates lineitem once and semi-joins the
    * distinct supplier keys. (The canonical Q20 nests through partsupp,
    * which this corpus does not have — FIXTURES.md.)
    */
  private def q20Body(supplier: String, lineitem: String): String =
    s"""SELECT s_suppkey, s_name
       |FROM $supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM $lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING ${sqlDsum("l_quantity")} > 55)
       |ORDER BY s_suppkey""".stripMargin

  val q20HeavyShippers: Q = (s, dir) => {
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier_q20")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q20")
    s.sql(q20Body("supplier_q20", "lineitem_q20"))
  }

  val q20Sql: String = q20Body("supplier", "lineitem")

  /** TPC-H Q21-shaped sole-late-supplier count: EXISTS and NOT EXISTS in
    * the same query, both correlated on the order key — the plan is a
    * semi join AND an anti join against lineitem self-references.
    * "Late" is shipped >60 days after the order date (this corpus has no
    * commit/receipt dates). The NOT EXISTS carries its own orders join
    * so the correlation stays a pure equi-key — the shape Catalyst
    * decorrelates without a nested-loop fallback.
    */
  private def q21Body(supplier: String, orders: String, lineitem: String): String =
    s"""SELECT s_suppkey, s_name, COUNT(*) AS numwait
       |FROM $supplier
       |  JOIN $lineitem l1 ON s_suppkey = l1.l_suppkey
       |  JOIN $orders o ON o.o_orderkey = l1.l_orderkey
       |WHERE o.o_orderstatus = 'F'
       |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
       |  AND EXISTS (SELECT 1 FROM $lineitem l2
       |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM $lineitem l3
       |      JOIN $orders o3 ON l3.l_orderkey = o3.o_orderkey
       |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
       |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
       |GROUP BY s_suppkey, s_name
       |ORDER BY numwait DESC, s_suppkey
       |LIMIT 20""".stripMargin

  val q21SoleLate: Q = (s, dir) => {
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier_q21")
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q21")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q21")
    s.sql(q21Body("supplier_q21", "orders_q21", "lineitem_q21"))
  }

  val q21Sql: String = q21Body("supplier", "orders", "lineitem")

  /** TPC-H Q22-shaped idle-rich-customer report: a scalar AVG subquery
    * and a correlated NOT EXISTS (anti join) in one query — customers
    * above the positive-balance average with no high-value orders,
    * grouped by segment. (Canonical Q22 filters on phone country codes,
    * which this corpus lacks; the subquery shapes are identical.)
    */
  private def q22Body(customer: String, orders: String): String =
    s"""SELECT c_mktsegment, COUNT(*) AS numcust, ${sqlDsum("c_acctbal")} AS totacctbal
       |FROM $customer
       |WHERE c_acctbal > (SELECT ${sqlDavg("c_acctbal")}
       |  FROM $customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (SELECT 1 FROM $orders
       |    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  val q22IdleRich: Q = (s, dir) => {
    Tables(s, dir, "customer").createOrReplaceTempView("customer_q22")
    Tables(s, dir, "orders").createOrReplaceTempView("orders_q22")
    s.sql(q22Body("customer_q22", "orders_q22"))
  }

  val q22Sql: String = q22Body("customer", "orders")

  /** TPC-H Q2-shaped minimum-cost supplier: a correlated SCALAR MIN
    * subquery whose inner query repeats the outer's region join — the
    * classic decorrelation-to-aggregate-join shape (Catalyst rewrites
    * the per-part MIN into one grouped aggregate joined back on the
    * correlation key). MIN over a raw double column is exact in any
    * engine, so the equality correlate is hash-safe (unlike a SUM,
    * which would need the decimal detour). The corpus has no partsupp
    * — FIXTURES.md — so lineitem stands in as the part↔supplier price
    * relation, preserving the query shape exactly.
    */
  private def q2Body(part: String, lineitem: String, supplier: String,
      nation: String, region: String): String =
    s"""SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
       |  l_extendedprice AS best_price
       |FROM $part
       |  JOIN $lineitem ON p_partkey = l_partkey
       |  JOIN $supplier ON l_suppkey = s_suppkey
       |  JOIN $nation ON s_nationkey = n_nationkey
       |  JOIN $region ON n_regionkey = r_regionkey
       |WHERE r_name = 'EUROPE' AND p_size <= 10
       |  AND l_extendedprice = (
       |    SELECT MIN(l2.l_extendedprice)
       |    FROM $lineitem l2
       |      JOIN $supplier s2 ON l2.l_suppkey = s2.s_suppkey
       |      JOIN $nation n2 ON s2.s_nationkey = n2.n_nationkey
       |      JOIN $region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY best_price DESC, p_partkey, s_suppkey
       |LIMIT 100""".stripMargin

  val q2MinCostSupplier: Q = (s, dir) => {
    Tables(s, dir, "part").createOrReplaceTempView("part_q2")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q2")
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier_q2")
    Tables(s, dir, "nation").createOrReplaceTempView("nation_q2")
    Tables(s, dir, "region").createOrReplaceTempView("region_q2")
    s.sql(q2Body("part_q2", "lineitem_q2", "supplier_q2", "nation_q2", "region_q2"))
  }

  val q2Sql: String = q2Body("part", "lineitem", "supplier", "nation", "region")

  /** TPC-H Q7-shaped volume shipping: revenue flowing between two
    * specific nations, in either direction, by ship year. The two
    * nation lookups broadcast PRE-FILTERED to the pair (so the join
    * discards non-pair rows before the shuffle, not after), and the
    * symmetric OR runs on the two small joined name columns. Fact
    * tables shuffle on their keys — the minimum for SF-scaling sides.
    */
  val q7VolumeShipping: Q = (s, dir) => {
    import s.implicits._
    val pair = Seq("NATION_6", "NATION_9")
    val n1 = broadcast(Tables(s, dir, "nation")
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
    val n2 = broadcast(Tables(s, dir, "nation")
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation")))
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(Tables(s, dir, "orders").select("o_orderkey", "o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(n1, $"s_nationkey" === $"s_nk")
      .join(n2, $"c_nationkey" === $"c_nk")
      .filter(($"supp_nation" === "NATION_6" && $"cust_nation" === "NATION_9") ||
        ($"supp_nation" === "NATION_9" && $"cust_nation" === "NATION_6"))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9')
       |    OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6'))
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8-shaped national market share: one nation's fraction of
    * the revenue sold to one region's customers for one part type, per
    * order year. Numerator and denominator are the SAME exact-decimal
    * sum (one with a CASE), so the share is a deterministic division.
    * Region-filtered customer nations and the supplier-nation name
    * lookup both broadcast (fixed 25/5-row dims).
    */
  val q8MarketShare: Q = (s, dir) => {
    import s.implicits._
    val custNations = broadcast(Tables(s, dir, "nation")
      .join(broadcast(Tables(s, dir, "region").filter($"r_name" === "AMERICA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("c_nk")))
    val suppNation = broadcast(Tables(s, dir, "nation")
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
    Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables(s, dir, "part").filter($"p_type" === "STANDARD").select("p_partkey"),
        $"l_partkey" === $"p_partkey")
      .join(Tables(s, dir, "orders")
          .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(custNations, $"c_nationkey" === $"c_nk")
      .join(Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(suppNation, $"s_nationkey" === $"s_nk")
      .withColumn("volume", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg((dsum(when($"supp_nation" === "NATION_9", $"volume").otherwise(0.0)) /
        dsum($"volume")).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_year")
  }

  val q8Sql: String =
    s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       |  ${sqlDsum("CASE WHEN sn.n_name = 'NATION_9' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |    / ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** TPC-H Q9-shaped product-type profit: profit per supplier nation
    * per order year for parts matching a name pattern. The corpus has
    * no ps_supplycost — FIXTURES.md — so cost is modeled as
    * 0.6 × p_retailprice × l_quantity, keeping the canonical amount
    * expression's (revenue − cost) shape. LIKE pushes into the part
    * scan; the profit sum runs in exact decimal.
    */
  val q9ProductProfit: Q = (s, dir) => {
    import s.implicits._
    val suppNation = broadcast(Tables(s, dir, "nation")
      .select($"n_nationkey".as("s_nk"), $"n_name".as("nation")))
    Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(Tables(s, dir, "part")
          .filter($"p_name".like("%bolt%")).select("p_partkey", "p_retailprice"),
        $"l_partkey" === $"p_partkey")
      .join(Tables(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(suppNation, $"s_nationkey" === $"s_nk")
      .groupBy($"nation", year($"o_orderdate").as("o_year"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") -
        lit(0.6) * $"p_retailprice" * $"l_quantity").as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation,
       |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity")}
       |    AS sum_profit
       |FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%bolt%'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11-shaped important stock: per-part value within one
    * nation's suppliers, kept only where it exceeds a multiple of the
    * per-part MEAN — a grouped HAVING against a SCALAR subquery that
    * re-aggregates the same derived view (Catalyst plans the subquery
    * once and broadcasts the literal into the filter). The canonical
    * fraction-of-total threshold degenerates on a uniform corpus
    * (nothing clears x% of a 20k-part total), so the threshold is
    * 1.2× the mean part value — same shape, SF-stable selectivity.
    * No partsupp in this corpus: value = extendedprice × quantity
    * summed over the nation's lineitems.
    */
  private def q11Body(lineitem: String, supplier: String, nation: String): String =
    s"""WITH natl AS (
       |  SELECT l_partkey, l_extendedprice * l_quantity AS val
       |  FROM $lineitem
       |    JOIN $supplier ON l_suppkey = s_suppkey
       |    JOIN $nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_9')
       |SELECT l_partkey, ${sqlDsum("val")} AS value
       |FROM natl
       |GROUP BY l_partkey
       |HAVING ${sqlDsum("val")} > (
       |  SELECT 1.2 * ${sqlDavg("pv")} FROM (
       |    SELECT ${sqlDsum("val")} AS pv FROM natl GROUP BY l_partkey))
       |ORDER BY value DESC, l_partkey""".stripMargin

  val q11ImportantStock: Q = (s, dir) => {
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q11")
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier_q11")
    Tables(s, dir, "nation").createOrReplaceTempView("nation_q11")
    s.sql(q11Body("lineitem_q11", "supplier_q11", "nation_q11"))
  }

  val q11Sql: String = q11Body("lineitem", "supplier", "nation")

  /** TPC-H Q12-shaped shipping-priority counts: conditional counts of
    * high/low-priority orders per lineitem class over a ship-year — the
    * CASE-inside-SUM pivot that plans as ONE pass over the join (no
    * per-priority re-scan). The corpus has no l_shipmode — FIXTURES.md
    * — so l_returnflag stands in as the lineitem class.
    */
  val q12ShipPriority: Q = (s, dir) => {
    import s.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .select("l_orderkey", "l_returnflag")
      .join(Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q16-shaped supplier-count distribution: distinct suppliers
    * per (brand, type, size) bucket, EXCLUDING suppliers from a NOT IN
    * subquery — the null-aware anti join Catalyst plans specially
    * (NOT IN must reject ALL rows if the subquery ever yields NULL;
    * s_suppkey is non-null here, so it degenerates to a broadcast anti
    * join, but the plan path is the point). "Complaints" stand-in:
    * suppliers with negative account balance. COUNT(DISTINCT) adds the
    * expand-then-dedup aggregate no other q-query exercises.
    */
  private def q16Body(lineitem: String, part: String, supplier: String): String =
    s"""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM $lineitem JOIN $part ON p_partkey = l_partkey
       |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
       |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
       |  AND l_suppkey NOT IN (
       |    SELECT s_suppkey FROM $supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val q16SupplierCount: Q = (s, dir) => {
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q16")
    Tables(s, dir, "part").createOrReplaceTempView("part_q16")
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier_q16")
    s.sql(q16Body("lineitem_q16", "part_q16", "supplier_q16"))
  }

  val q16Sql: String = q16Body("lineitem", "part", "supplier")

  val all: Map[String, (Q, Option[String])] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier, Some(q2Sql)),
    "q7_volume_shipping" -> (q7VolumeShipping, Some(q7Sql)),
    "q8_market_share" -> (q8MarketShare, Some(q8Sql)),
    "q9_product_profit" -> (q9ProductProfit, Some(q9Sql)),
    "q11_important_stock" -> (q11ImportantStock, Some(q11Sql)),
    "q12_ship_priority" -> (q12ShipPriority, Some(q12Sql)),
    "q16_supplier_count" -> (q16SupplierCount, Some(q16Sql)),
    "q3_shipping_priority" -> (q3ShippingPriority, Some(q3Sql)),
    "q4_order_priority" -> (q4OrderPriority, Some(q4Sql)),
    "q13_customer_distribution" -> (q13CustomerDistribution, Some(q13Sql)),
    "q14_type_share" -> (q14TypeShare, Some(q14Sql)),
    "q15_top_supplier" -> (q15TopSupplier, Some(q15Sql)),
    "q18_large_volume" -> (q18LargeVolume, Some(q18Sql)),
    "q19_disjunctive_join" -> (q19Disjunctive, Some(q19Sql)),
    "q20_heavy_shippers" -> (q20HeavyShippers, Some(q20Sql)),
    "q21_sole_late_supplier" -> (q21SoleLate, Some(q21Sql)),
    "q22_idle_rich_customers" -> (q22IdleRich, Some(q22Sql)),
    "q6_forecast_revenue" -> (q6ForecastRevenue, Some(q6Sql)),
    "q10_returned_items" -> (q10ReturnedItems, Some(q10Sql)),
    "q5_region_revenue" -> (q5RegionRevenue, Some(q5Sql)),
    "q17_small_qty_revenue" -> (q17SmallQty, Some(q17Sql)),
    "join_left_big_orders" -> (joinLeftBigOrders, Some(joinLeftSql)),
    "join_semi_maxqty" -> (joinSemi, Some(joinSemiSql)),
    "join_anti_maxqty" -> (joinAnti, Some(joinAntiSql)),
    "window_top3_per_nation" -> (windowTop3PerNation, Some(windowTop3Sql)),
    "window_running_total" -> (windowRunningTotal, Some(windowRunningSql)),
    "window_order_gap" -> (windowOrderGap, Some(windowGapSql)),
    "set_ops_customers" -> (setOps, Some(setOpsSql)),
    "agg_rollup_status_priority" -> (aggRollup, Some(aggRollupSql)),
    "agg_pivot_status" -> (aggPivotStatus, Some(aggPivotSql)),
    "agg_distinct_status_priority" -> (aggDistinct, Some(aggDistinctSql)),
    "date_monthly_orders" -> (dateMonthly, Some(dateMonthlySql)),
    "str_part_funcs" -> (strPartFuncs, Some(strPartSql))
  )
}
