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

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`), rounded to 6 decimals because the linear
    * interpolation's last ulp is engine-specific. One scalar column per
    * quantile — the driver's comparator can't sort array cells.
    */
  val percentiles: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.95D))").as("p"))
      .select($"o_orderstatus",
        round(element_at($"p", 1), 6).as("price_p25"),
        round(element_at($"p", 2), 6).as("price_p50"),
        round(element_at($"p", 3), 6).as("price_p95"))
      .orderBy($"o_orderstatus")
  }

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.25), 6) AS price_p25,
      |  round(quantile_cont(o_totalprice, 0.5), 6) AS price_p50,
      |  round(quantile_cont(o_totalprice, 0.95), 6) AS price_p95
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Sample stddev and Pearson correlation from exact decimal power sums.
    * Spark's native stddev/corr stream co-moments, so their low bits
    * depend on partition order — the closed-form over order-independent
    * decimal sums is deterministic on any cluster AND engine-portable.
    */
  val statsMoments: Q = (s, dir) => {
    import s.implicits._
    val n = count(lit(1)).cast("double")
    val sx = dsum($"o_totalprice")
    val sxx = dsum($"o_totalprice" * $"o_totalprice")
    val sy = dsum($"o_custkey".cast("double"))
    val syy = dsum($"o_custkey".cast("double") * $"o_custkey".cast("double"))
    val sxy = dsum($"o_totalprice" * $"o_custkey".cast("double"))
    Tables(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(n.as("n"), sx.as("sx"), sxx.as("sxx"), sy.as("sy"),
        syy.as("syy"), sxy.as("sxy"))
      .select($"o_orderstatus",
        round(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1.0)), 6)
          .as("stddev_price"),
        // denominator guard mirrored in the oracle: on a constant or
        // single-row group Spark's x/0 is NULL but DuckDB's is IEEE nan
        round(when(($"n" * $"sxx" - $"sx" * $"sx") > 0.0 &&
            ($"n" * $"syy" - $"sy" * $"sy") > 0.0,
          ($"n" * $"sxy" - $"sx" * $"sy") /
            (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy"))), 9)
          .as("corr_price_cust"))
      .orderBy($"o_orderstatus")
  }

  val statsMomentsSql: String = {
    val sx = sqlDsum("o_totalprice")
    val sxx = sqlDsum("o_totalprice * o_totalprice")
    val sy = sqlDsum("CAST(o_custkey AS DOUBLE)")
    val syy = sqlDsum("CAST(o_custkey AS DOUBLE) * CAST(o_custkey AS DOUBLE)")
    val sxy = sqlDsum("o_totalprice * CAST(o_custkey AS DOUBLE)")
    s"""WITH m AS (
       |  SELECT o_orderstatus, CAST(COUNT(*) AS DOUBLE) AS n,
       |    $sx AS sx, $sxx AS sxx, $sy AS sy, $syy AS syy, $sxy AS sxy
       |  FROM orders GROUP BY o_orderstatus)
       |SELECT o_orderstatus,
       |  round(sqrt((sxx - sx * sx / n) / (n - CAST(1.0 AS DOUBLE))), 6) AS stddev_price,
       |  round(CASE WHEN (n * sxx - sx * sx) > 0.0 AND (n * syy - sy * sy) > 0.0
       |    THEN (n * sxy - sx * sy) /
       |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
       |    ELSE NULL END, 9) AS corr_price_cust
       |FROM m ORDER BY o_orderstatus""".stripMargin
  }

  /** CUBE — all 2^n grouping combinations (rollup's superset). */
  val aggCube: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  val aggCubeSql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
       |  coalesce(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  /** Bag-semantics set ops (intersectAll / exceptAll keep multiplicity —
    * needed when the inputs are multisets, e.g. per-order status rows).
    */
  val setOpsAll: Q = (s, dir) => {
    import s.implicits._
    val byStatus = Tables(s, dir, "orders")
      .filter($"o_custkey" <= 200).select($"o_custkey", $"o_orderstatus")
    val f = byStatus.filter($"o_orderstatus" =!= "O")
    val p = byStatus.filter($"o_orderstatus" =!= "F")
    f.intersectAll(p).withColumn("tag", lit("both"))
      .unionByName(f.exceptAll(p).withColumn("tag", lit("f_only")))
      .groupBy($"tag", $"o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy($"tag", $"o_orderstatus")
  }

  val setOpsAllSql: String =
    """WITH s AS (SELECT o_custkey, o_orderstatus FROM orders WHERE o_custkey <= 200),
      |f AS (SELECT * FROM s WHERE o_orderstatus <> 'O'),
      |p AS (SELECT * FROM s WHERE o_orderstatus <> 'F'),
      |u AS (
      |  SELECT *, 'both' AS tag FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM p)
      |  UNION ALL
      |  SELECT *, 'f_only' FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM p))
      |SELECT tag, o_orderstatus, COUNT(*) AS n FROM u
      |GROUP BY tag, o_orderstatus ORDER BY tag, o_orderstatus""".stripMargin

  /** Sorted collect_set — deterministic set aggregation, joined to one
    * scalar string so the driver's comparator can hash it (array cells
    * are unsortable in pandas).
    */
  val collectSet: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(array_join(sort_array(collect_set($"o_orderpriority")), "|")
          .as("priorities"),
        countDistinct($"o_orderpriority").as("n_priorities"))
      .orderBy($"o_orderstatus")
  }

  val collectSetSql: String =
    """SELECT o_orderstatus,
      |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|') AS priorities,
      |  COUNT(DISTINCT o_orderpriority) AS n_priorities
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** ntile + first/last_value over an explicit frame — the remaining
    * ranking/navigation window functions.
    */
  val windowNtile: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice", $"o_orderkey")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 100)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice",
        ntile(4).over(w).as("quartile"),
        first($"o_orderkey").over(wf).as("cheapest_key"),
        last($"o_orderkey").over(wf).as("priciest_key"))
      .orderBy($"o_orderstatus", $"o_totalprice", $"o_orderkey")
  }

  val windowNtileSql: String =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  first_value(o_orderkey) OVER wf AS cheapest_key,
      |  last_value(o_orderkey) OVER wf AS priciest_key
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
      |  wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin

  /** Rank-distribution window functions (dense_rank / percent_rank /
    * cume_dist) — integer-ratio doubles, exact in both engines.
    */
  val windowRankDist: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 100)
      .select($"o_orderstatus", $"o_orderkey",
        dense_rank().over(w).as("drank"),
        round(percent_rank().over(w), 9).as("pct_rank"),
        round(cume_dist().over(w), 9).as("cume"))
      .orderBy($"o_orderstatus", $"o_orderkey")
  }

  val windowRankDistSql: String =
    """SELECT o_orderstatus, o_orderkey,
      |  CAST(dense_rank() OVER w AS INT) AS drank,
      |  round(percent_rank() OVER w, 9) AS pct_rank,
      |  round(cume_dist() OVER w, 9) AS cume
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** FULL OUTER join — the one join type the surface still lacked:
    * high-volume customers vs urgent-order customers, null-filled on
    * either side and coalesced to a total key.
    */
  val joinFullOuter: Q = (s, dir) => {
    import s.implicits._
    val orders = Tables(s, dir, "orders")
    val big = orders.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders")).filter($"n_orders" >= 10)
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_custkey".as("u_custkey")).agg(count(lit(1)).as("n_urgent"))
    big.join(urgent, $"o_custkey" === $"u_custkey", "full_outer")
      .select(coalesce($"o_custkey", $"u_custkey").as("custkey"),
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_urgent", lit(0L)).as("n_urgent"))
      .orderBy($"custkey")
  }

  val joinFullOuterSql: String =
    """WITH big AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1 HAVING COUNT(*) >= 10),
      |urg AS (
      |  SELECT o_custkey AS u_custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent
      |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
      |SELECT coalesce(o_custkey, u_custkey) AS custkey,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(n_urgent, 0) AS n_urgent
      |FROM big FULL OUTER JOIN urg ON o_custkey = u_custkey
      |ORDER BY custkey""".stripMargin

  /** RANGE window frame (value-based, vs the ROWS frames elsewhere):
    * for each order, total and count of orders of the same status
    * within the preceding 100 order keys. Decimal window sum → the
    * frame's fold order can't leak into the double.
    */
  val windowRangeFrame: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_orderkey")
      .rangeBetween(-100L, Window.currentRow)
    Tables(s, dir, "orders")
      .filter($"o_custkey" <= 200)
      .select($"o_orderstatus", $"o_orderkey",
        sum($"o_totalprice".cast("decimal(22,6)")).over(w)
          .cast("double").as("nearby_total"),
        count(lit(1)).over(w).as("n_nearby"))
      .orderBy($"o_orderstatus", $"o_orderkey")
  }

  val windowRangeFrameSql: String =
    """SELECT o_orderstatus, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(22,6))) OVER w AS DOUBLE) AS nearby_total,
      |  COUNT(*) OVER w AS n_nearby
      |FROM orders WHERE o_custkey <= 200
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
      |  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** Edit distance (identical integer DP in both engines). */
  val editDistance: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "part")
      .select($"p_partkey", $"p_brand",
        levenshtein($"p_brand", lit("Brand#10")).as("dist_to_b10"),
        levenshtein($"p_name", $"p_brand").as("name_brand_dist"))
      .orderBy($"p_partkey")
  }

  val editDistanceSql: String =
    """SELECT p_partkey, p_brand,
      |  CAST(levenshtein(p_brand, 'Brand#10') AS INT) AS dist_to_b10,
      |  CAST(levenshtein(p_name, p_brand) AS INT) AS name_brand_dist
      |FROM part ORDER BY p_partkey""".stripMargin

  /** SCD Type-2 dimension history: three deterministic attribute
    * snapshots per customer collapse into validity ranges — rows kept
    * only where the attribute CHANGED vs the previous version (lag),
    * each range closed by the next change's effective date (lead),
    * open-ended rows flagged current. The warehouse op behind every
    * "as-of" dimension join. One shuffle on the key carries both
    * windows; snapshots explode from a single scan.
    */
  val scd2History: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val versions = Tables(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment",
        explode(sequence(lit(0), lit(2))).as("v"))
      .select($"c_custkey", $"v",
        make_date(lit(2020), $"v" + 1, lit(1)).as("eff"),
        when($"c_custkey" % ($"v" + 2) === 0,
          concat(lit("SEG"), $"v")).otherwise($"c_mktsegment").as("seg"))
    val w = Window.partitionBy($"c_custkey").orderBy($"v")
    versions
      .withColumn("prev_seg", lag($"seg", 1).over(w))
      .filter($"prev_seg".isNull || $"seg" =!= $"prev_seg")
      .withColumn("valid_to", lead($"eff", 1).over(w))
      // TIMESTAMP, not DATE, in the gated output: DuckDB's
      // date-valued functions (date_trunc, make_date) surface as DATE
      // while Spark's casts land on TIMESTAMP_NTZ — casting BOTH
      // sides to TIMESTAMP is the comparator's common ground
      .select($"c_custkey", $"seg",
        $"eff".cast("timestamp").as("valid_from"),
        $"valid_to".cast("timestamp").as("valid_to"),
        $"valid_to".isNull.as("is_current"))
      .orderBy($"c_custkey", $"valid_from")
  }

  val scd2HistorySql: String =
    """WITH versions AS (
      |  SELECT c_custkey, v, make_date(2020, CAST(v + 1 AS INT), 1) AS eff,
      |    CASE WHEN c_custkey % (v + 2) = 0 THEN 'SEG' || CAST(v AS VARCHAR)
      |         ELSE c_mktsegment END AS seg
      |  FROM customer CROSS JOIN range(0, 3) t(v)),
      |changed AS (
      |  SELECT * FROM (
      |    SELECT c_custkey, v, eff, seg,
      |      lag(seg) OVER (PARTITION BY c_custkey ORDER BY v) AS prev_seg
      |    FROM versions)
      |  WHERE prev_seg IS NULL OR seg <> prev_seg)
      |SELECT c_custkey, seg, CAST(eff AS TIMESTAMP) AS valid_from,
      |  CAST(lead(eff) OVER (PARTITION BY c_custkey ORDER BY v) AS TIMESTAMP)
      |    AS valid_to,
      |  lead(eff) OVER (PARTITION BY c_custkey ORDER BY v) IS NULL AS is_current
      |FROM changed
      |ORDER BY c_custkey, valid_from""".stripMargin

  /** Incremental aggregate maintenance — the materialized-view update
    * path: per-key partial states (count / decimal sum / min / max)
    * computed for a base slice and a delta slice SEPARATELY, then
    * merged by state algebra (sum of counts, sum of exact sums, min of
    * mins, max of maxs). The gate's oracle is the FULL recompute — the
    * whole point of the query is that merge(base, delta) must equal
    * recompute(base ∪ delta) exactly, which only holds because the sum
    * state is order-invariant decimal. At 100 TB this is the shape that
    * turns a nightly full scan into a delta-sized job.
    */
  val incrementalMerge: Q = (s, dir) => {
    import s.implicits._
    // partial-sum scale MUST equal Exact.dsum's (22,6): Spark's
    // double→decimal cast rounds via the shortest decimal repr so any
    // scale ≥ the data's agrees TODAY, but DuckDB expands the binary
    // double — a wider Spark scale here would silently diverge from the
    // sqlDsum oracle the moment values need more fraction digits
    def state(slice: org.apache.spark.sql.DataFrame) =
      slice.groupBy($"o_custkey")
        .agg(count(lit(1)).as("cnt"),
          sum($"o_totalprice".cast("decimal(22,6)")).as("s"),
          min($"o_totalprice").as("mn"),
          max($"o_totalprice").as("mx"))
    val orders = Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val base = state(orders.filter($"o_orderkey" % 5 =!= 0))
    val delta = state(orders.filter($"o_orderkey" % 5 === 0))
    base.unionByName(delta)
      .groupBy($"o_custkey")
      .agg(sum($"cnt").as("n_orders"),
        sum($"s").cast("double").as("total"),
        min($"mn").as("min_price"),
        max($"mx").as("max_price"))
      .orderBy($"o_custkey")
  }

  val incrementalMergeSql: String =
    s"""SELECT o_custkey, COUNT(*) AS n_orders,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  MIN(o_totalprice) AS min_price,
       |  MAX(o_totalprice) AS max_price
       |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Recursive CTE hierarchy traversal (Spark 4's WITH RECURSIVE): the
    * iterative-in-SQL surface — org charts, BOM explosions, reachable
    * sets — that previously required a DataFrame driver loop
    * ([[graft.operators.ConnectedComponents]] remains the operator for
    * corpus-scale graphs; this gates the SQL-native form). The
    * hierarchy is the deterministic binary tree parent(k) = k div 2
    * over customer keys ≤ 127 (depth 6, complete); per-depth rollups
    * ride the decimal detour. Both engines execute the same recursion;
    * only `div` vs `//` differs between dialects.
    */
  val recursiveTree: Q = (s, dir) => {
    import s.implicits._
    // the recursion's reachable set is exactly keys 1..127 (root 1,
    // parent(k) = k div 2, guard ≤ 127), so the view is pre-pruned to
    // those 127 rows and persisted — each of the 6 recursion steps
    // joins the in-memory slice instead of re-scanning the customer
    // parquet (semantics identical: the recursive arm keeps its own
    // ≤ 127 guard)
    graft.CacheTracker.persistTracked(
      Tables(s, dir, "customer")
        .filter($"c_custkey" <= 127)
        .select($"c_custkey", $"c_acctbal"))
      .createOrReplaceTempView("graft_rec_customer")
    s.sql(
      """WITH RECURSIVE tree AS (
        |  SELECT c_custkey AS node, 0 AS depth, c_acctbal
        |  FROM graft_rec_customer WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1, c.c_acctbal
        |  FROM graft_rec_customer c JOIN tree t ON c.c_custkey div 2 = t.node
        |  WHERE c.c_custkey <= 127 AND c.c_custkey >= 2
        |)
        |SELECT depth, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(22,6))) AS DOUBLE) AS total_bal,
        |  MIN(node) AS lo, MAX(node) AS hi
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val recursiveTreeSql: String =
    """WITH RECURSIVE tree AS (
      |  SELECT c_custkey AS node, 0 AS depth, c_acctbal
      |  FROM customer WHERE c_custkey = 1
      |  UNION ALL
      |  SELECT c.c_custkey, t.depth + 1, c.c_acctbal
      |  FROM customer c JOIN tree t ON c.c_custkey // 2 = t.node
      |  WHERE c.c_custkey <= 127 AND c.c_custkey >= 2
      |)
      |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(22,6))) AS DOUBLE) AS total_bal,
      |  MIN(node) AS lo, MAX(node) AS hi
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "rel_recursive_tree" -> (recursiveTree, Some(recursiveTreeSql)),
    "scd2_dimension_history" -> (scd2History, Some(scd2HistorySql)),
    "agg_incremental_merge" -> (incrementalMerge, Some(incrementalMergeSql)),
    "window_ntile_frames" -> (windowNtile, Some(windowNtileSql)),
    "window_rank_distribution" -> (windowRankDist, Some(windowRankDistSql)),
    "window_range_frame" -> (windowRangeFrame, Some(windowRangeFrameSql)),
    "join_full_outer" -> (joinFullOuter, Some(joinFullOuterSql)),
    "str_edit_distance" -> (editDistance, Some(editDistanceSql)),
    "agg_cube_status_priority" -> (aggCube, Some(aggCubeSql)),
    "set_ops_all_multiset" -> (setOpsAll, Some(setOpsAllSql)),
    "agg_collect_set_sorted" -> (collectSet, Some(collectSetSql)),
    "agg_percentiles" -> (percentiles, Some(percentilesSql)),
    "agg_stats_moments" -> (statsMoments, Some(statsMomentsSql)),
    "join_skew_salted" -> (skewSalted, Some(skewSaltedSql)),
    "scalar_subquery_above_avg" -> (scalarSubquery, Some(scalarSubquerySql)),
    "agg_value_histogram" -> (valueHistogram, Some(valueHistogramSql)),
    "unpivot_part_metrics" -> (unpivotParts, Some(unpivotPartsSql))
  )
}
