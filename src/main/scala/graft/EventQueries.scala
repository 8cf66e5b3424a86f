package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** Event-time analytics over the `events` stream table, expressed in
  * batch so the DuckDB oracle can check them; the same transforms run
  * unchanged on a `readStream` DataFrame (see [[graft.streaming.Streams]])
  * with watermarks supplying state cleanup.
  *
  * Scale: windowed group-bys partially aggregate before the shuffle, so
  * the exchange carries |windows × types| rows, not |events|.
  * Sessionization shuffles once on user_id — the same key a streaming
  * flatMapGroupsWithState would state-partition on.
  */
/** Typed rows for [[EventQueries.userSeqTyped]] (integer micros, no
  * timestamp codec in the typed path).
  */
case class UserEv(user_id: Long, ts_us: Long, event_type: String,
    value: Double, event_id: Long)

/** Per-user sequence features emitted by the mapGroups fold. */
case class UserSeq(user_id: Long, n_events: Long, max_gap_us: Option[Long],
    n_value_increases: Long, first_type: String, last_type: String)

object EventQueries {
  import Queries.Q

  /** 10-minute tumbling windows per event type. */
  val tumbling: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"total_value")
      .orderBy($"w_start", $"event_type")
  }

  val tumblingSql: String =
    s"""SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** 10-minute windows sliding every 5 — each event lands in two windows
    * (the oracle unnests the two candidate starts explicitly).
    */
  val sliding: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select($"window.start".as("w_start"), $"n", $"total_value")
      .orderBy($"w_start")
  }

  val slidingSql: String =
    s"""WITH e AS (SELECT value,
       |    time_bucket(INTERVAL '5 minutes', ts) AS tb FROM events),
       |w AS (SELECT value,
       |    unnest([tb, tb - INTERVAL '5 minutes']) AS w_start FROM e)
       |SELECT w_start, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM w GROUP BY 1 ORDER BY w_start""".stripMargin

  /** Sessionization with a 30-minute inactivity gap: lag + running sum of
    * session-start flags assigns session numbers, then one aggregate per
    * (user, session). Gap arithmetic runs on exact epoch microseconds.
    */
  val sessions: Q = (s, dir) => {
    import s.implicits._
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val flagged = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"value",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || $"us" - $"prev_us" > gapUs, 1).otherwise(0))
      .withColumn("session_n",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy($"user_id", $"session_n")
      .agg(min($"ts").as("sess_start"), max($"ts").as("sess_end"),
        count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
      .orderBy($"user_id", $"session_n")
  }

  val sessionsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > ${30L * 60 * 1000000}
       |                 THEN 1 ELSE 0 END AS new_sess
       |  FROM (SELECT *, lag(us, 1) OVER (PARTITION BY user_id
       |          ORDER BY us, event_id) AS prev_us FROM e)),
       |sess AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
       |  FROM flagged)
       |SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
       |  MIN(ts) AS sess_start, MAX(ts) AS sess_end,
       |  COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
       |FROM sess GROUP BY user_id, session_n
       |ORDER BY user_id, session_n""".stripMargin

  /** Semi-structured props: JSON field extraction + per-type stats. */
  val jsonProps: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"),
        (sum($"k").cast("double") / count(lit(1))).as("avg_k"))
      .orderBy($"event_type")
  }

  val jsonPropsSql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k,
      |  CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Z-score anomaly flagging: events whose value deviates > 3σ from
    * their type's mean, with mean/σ from exact decimal power sums (the
    * only partition-order-stable formulation — see
    * RelationalExtras.statsMoments) broadcast back over the stream.
    */
  val zscoreAnomalies: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val stats = ev.groupBy($"event_type".as("t"))
      .agg(count(lit(1)).cast("double").as("n"),
        dsum($"value").as("sx"),
        dsum($"value" * $"value").as("sxx"))
      .select($"t", ($"sx" / $"n").as("mean"),
        sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1.0)).as("sd"))
    // sd > 0 guard mirrored in the oracle: Spark's non-ANSI x/0 yields
    // NULL while DuckDB yields IEEE nan/inf — excluding degenerate groups
    // identically keeps the engines agreeing
    ev.join(broadcast(stats.filter($"sd" > 0.0)), $"event_type" === $"t")
      .withColumn("z", ($"value" - $"mean") / $"sd")
      .filter(abs($"z") > 3.0)
      .select($"event_id", $"event_type", $"value", round($"z", 9).as("z"))
      .orderBy($"event_id")
  }

  val zscoreSql: String = {
    val sx = sqlDsum("value")
    val sxx = sqlDsum("value * value")
    s"""WITH stats AS (
       |  SELECT event_type AS t, CAST(COUNT(*) AS DOUBLE) AS n,
       |    $sx AS sx, $sxx AS sxx
       |  FROM events GROUP BY event_type),
       |st AS (SELECT * FROM (
       |         SELECT t, sx / n AS mean,
       |           sqrt((sxx - sx * sx / n) / (n - CAST(1.0 AS DOUBLE))) AS sd
       |         FROM stats) WHERE sd > 0.0)
       |SELECT event_id, event_type, value,
       |  round((value - mean) / sd, 9) AS z
       |FROM events JOIN st ON event_type = t
       |WHERE abs((value - mean) / sd) > 3.0
       |ORDER BY event_id""".stripMargin
  }

  /** Daily cohort retention: DAU plus how many of a day's users are
    * active again the next day — the canonical activity self-join of a
    * product-analytics engine. The (user, day) activity table is built
    * once (distinct = one shuffle), persisted for its self-join, and
    * the join key is the pure equi-pair (user_id, d = d+1), so it plans
    * as a hash join — no range scan, no cross product.
    */
  val retentionDaily: Q = (s, dir) => {
    import s.implicits._
    val daily = graft.CacheTracker.persistTracked(
      Tables(s, dir, "events")
        .select($"user_id", to_date($"ts").as("d")).distinct())
    val dau = daily.groupBy($"d").agg(count(lit(1)).as("dau"))
    val ret = daily.alias("a").join(daily.alias("b"),
        $"a.user_id" === $"b.user_id" && $"b.d" === date_add($"a.d", 1))
      .groupBy($"a.d".as("d")).agg(count(lit(1)).as("retained_next_day"))
    dau.join(ret, Seq("d"), "left")
      .select($"d", $"dau",
        coalesce($"retained_next_day", lit(0L)).as("retained_next_day"))
      .orderBy($"d")
  }

  val retentionDailySql: String =
    """WITH daily AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM daily GROUP BY d),
      |ret AS (SELECT a.d AS d, CAST(COUNT(*) AS BIGINT) AS retained_next_day
      |        FROM daily a JOIN daily b
      |          ON a.user_id = b.user_id AND b.d = a.d + 1
      |        GROUP BY a.d)
      |SELECT d, dau, coalesce(retained_next_day, 0) AS retained_next_day
      |FROM dau LEFT JOIN ret USING (d) ORDER BY d""".stripMargin

  /** MapType surface: per-user feature map event_type → count built
    * with map_from_entries, then queried with map_keys / element_at —
    * the per-entity feature-bag shape a training pipeline materializes.
    * Output is scalarized (sorted key join + extracted entries) for the
    * comparator; the oracle mirrors the SEMANTICS with plain grouping,
    * which is the point — the map is a layout choice, not a result.
    */
  val eventTypeMap: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .filter($"user_id" <= 200)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg(map_from_entries(
        array_sort(collect_list(struct($"event_type", $"n")))).as("m"))
      .select($"user_id",
        size($"m").as("n_types"),
        array_join(sort_array(map_keys($"m")), "|").as("types"),
        coalesce(element_at($"m", "click"), lit(0L)).as("n_clicks"),
        coalesce(element_at($"m", "purchase"), lit(0L)).as("n_purchases"))
      .orderBy($"user_id")
  }

  val eventTypeMapSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events WHERE user_id <= 200 GROUP BY 1, 2)
      |SELECT user_id,
      |  CAST(COUNT(*) AS INT) AS n_types,
      |  array_to_string(list_sort(list(event_type)), '|') AS types,
      |  CAST(coalesce(SUM(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT) AS n_clicks,
      |  CAST(coalesce(SUM(CASE WHEN event_type = 'purchase' THEN n END), 0) AS BIGINT) AS n_purchases
      |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Typed per-group sequence analysis via `mapGroups` — the Dataset
    * API's escape hatch for arbitrary per-key imperative logic (the
    * third leg of the typed surface next to the TopK Aggregator and
    * the native expressions). Each user's events sort in memory inside
    * the group (bounded per-user cardinality — the mapGroups contract)
    * and fold into sequence features: max inter-event gap, count of
    * value increases, first/last event type. One shuffle on user_id;
    * timestamps are pre-projected to integer micros so the typed path
    * carries no timestamp codec, and every output is integer/string —
    * the oracle reproduces it with lag windows.
    */
  val userSeqTyped: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      // ts is TIMESTAMP_NTZ; session TZ is pinned UTC, so the cast to
      // TIMESTAMP (which unix_micros requires) is value-preserving
      .select($"user_id", unix_micros($"ts".cast("timestamp")).as("ts_us"),
        $"event_type", $"value", $"event_id")
      .as[UserEv]
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
        val gaps = evs.iterator.sliding(2).withPartial(false)
          .map(p => p(1).ts_us - p(0).ts_us).toSeq
        UserSeq(
          user_id = uid,
          n_events = evs.length.toLong,
          max_gap_us = if (gaps.isEmpty) None else Some(gaps.max),
          n_value_increases = evs.iterator.sliding(2).withPartial(false)
            .count(p => p(1).value > p(0).value).toLong,
          first_type = evs.head.event_type,
          last_type = evs.last.event_type)
      }
      .toDF()
      .orderBy($"user_id")
  }

  val userSeqTypedSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type, value,
      |    lag(epoch_us(ts)) OVER w AS pts,
      |    epoch_us(ts) AS ts_us,
      |    lag(value) OVER w AS pval,
      |    row_number() OVER w AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MAX(ts_us - pts) AS max_gap_us,
      |  CAST(SUM(CASE WHEN pval IS NOT NULL AND value > pval THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_value_increases,
      |  MIN(CASE WHEN rn = 1 THEN event_type END) AS first_type,
      |  MIN(CASE WHEN rn = n THEN event_type END) AS last_type
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Ordered funnel per user: first view → first click AFTER that view
    * → first purchase AFTER that click. The stage timestamps are
    * staged conditional MINs (each stage's window opens where the
    * previous stage landed — the order constraint is the funnel), all
    * on integer micros. Three user-keyed aggregate/join rounds — the
    * same one shuffle key throughout, so co-partitioning carries across
    * stages. NULL stage = user fell out; the trailing conversion gap is
    * exact integer micros.
    */
  val funnelConversion: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("ts_us"))
    val t1 = ev.groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts_us")).as("t1"))
    val t2 = ev.join(t1, "user_id")
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "click" && $"ts_us" > $"t1", $"ts_us"))
        .as("t2"), min($"t1").as("t1_keep"))
    val t3 = ev.join(t2, "user_id")
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "purchase" && $"ts_us" > $"t2", $"ts_us"))
        .as("t3"), min($"t1_keep").as("t1"), min($"t2").as("t2_keep"))
    t3.select($"user_id", $"t1", $"t2_keep".as("t2"), $"t3",
        ($"t3" - $"t1").as("convert_us"))
      .orderBy($"user_id")
  }

  val funnelConversionSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |s1 AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
      |  FROM ev GROUP BY user_id),
      |s2 AS (
      |  SELECT ev.user_id,
      |    MIN(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END) AS t2,
      |    MIN(t1) AS t1
      |  FROM ev JOIN s1 ON ev.user_id = s1.user_id GROUP BY ev.user_id),
      |s3 AS (
      |  SELECT ev.user_id,
      |    MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END) AS t3,
      |    MIN(t1) AS t1, MIN(t2) AS t2
      |  FROM ev JOIN s2 ON ev.user_id = s2.user_id GROUP BY ev.user_id)
      |SELECT user_id, t1, t2, t3, t3 - t1 AS convert_us
      |FROM s3 ORDER BY user_id""".stripMargin

  /** Time-series gap filling with forward fill (last observation
    * carried forward) — the regularization step before any
    * fixed-interval model consumes an irregular event stream: each
    * user's observed hours collapse to their LAST reading (latest
    * timestamp, event_id tiebreak — picked by one struct-max
    * aggregation, no sort), a dense hour grid spans each user's own
    * [first, last] range, and missing hours inherit the most recent
    * reading via last(ignoreNulls) over the per-user ordered window.
    *
    * Scale shape: one shuffle on (user, hour) with map-side combine,
    * a per-user bounds aggregate, and the fill window keyed on the
    * high-cardinality user id — the grid explode is bounded by
    * span-hours per user, and the reading rides through BOTH engines
    * verbatim (no arithmetic on the double), so the gate needs no
    * rounding discipline at all.
    */
  val gapFill: Q = (s, dir) => {
    import s.implicits._
    val hourUs = 3600L * 1000000L
    val ev = Tables(s, dir, "events")
      .filter($"user_id" < 10)
      .select($"user_id", $"event_id", $"value",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .withColumn("h", expr(s"us div $hourUs"))
    val hourly = ev.groupBy($"user_id", $"h")
      .agg(max(struct($"us", $"event_id", $"value")).as("m"))
      .select($"user_id", $"h", $"m.value".as("v"))
    val grid = hourly.groupBy($"user_id")
      .agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("h"))
    val wFf = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select($"user_id", $"h",
        last($"v", ignoreNulls = true).over(wFf).as("v_ff"),
        $"v".isNull.cast("int").as("filled"))
      .orderBy($"user_id", $"h")
  }

  val gapFillSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
       |    epoch_us(ts) // 3600000000 AS h
       |  FROM events WHERE user_id < 10),
       |hourly AS (
       |  -- value DESC mirrors the Spark struct-max's third key, so a
       |  -- drifted corpus with duplicate (us, event_id) rows cannot
       |  -- leave the oracle's pick nondeterministic
       |  SELECT user_id, h, value AS v FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id, h
       |      ORDER BY us DESC, event_id DESC, value DESC) AS rn FROM ev)
       |  WHERE rn = 1),
       |grid AS (
       |  SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM (
       |    SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
       |    FROM hourly GROUP BY user_id)),
       |j AS (SELECT g.user_id, g.h, v
       |      FROM grid g LEFT JOIN hourly USING (user_id, h))
       |SELECT user_id, h,
       |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff,
       |  CAST(v IS NULL AS INT) AS filled
       |FROM j ORDER BY user_id, h""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next_type | prev_type) as exact parts-per-million. The per-user
    * `lead` orders on (us, event_id) — the unique trailing key making the
    * successor deterministic even under equal timestamps — and both the
    * counts and the ppm ratio are pure int64 (`cnt·10⁶ div total`), so no
    * float ever reaches the hash.
    *
    * Scale shape: one shuffle on user_id for the sequence window (the
    * same key sessionization state-partitions on), then a partial-agg
    * group-by on the (prev, next) pairs — the exchange after the window
    * carries |type|² rows, not |events|. The per-prev totals join is a
    * broadcast of ≤ |type| rows.
    */
  val markovTransitions: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    // persisted: `pairs` feeds both the totals aggregate and the join's
    // left side — without the barrier the events scan + per-user lead
    // window would evaluate twice (the self-join invariant). |type|²
    // rows, so the cache is constant-size.
    val pairs = graft.CacheTracker.persistTracked(Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("prev_type"), $"next_type")
      .agg(count(lit(1)).as("cnt")))
    val totals = pairs.groupBy($"prev_type")
      .agg(sum($"cnt").as("total"))
    pairs.join(broadcast(totals), "prev_type")
      .select($"prev_type", $"next_type", $"cnt",
        expr("(cnt * 1000000) div total").as("ppm"))
      .orderBy($"prev_type", $"next_type")
  }

  val markovTransitionsSql: String =
    s"""WITH seq AS (
       |  SELECT event_type,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS next_type
       |  FROM events),
       |pairs AS (
       |  SELECT event_type AS prev_type, next_type, COUNT(*) AS cnt
       |  FROM seq WHERE next_type IS NOT NULL
       |  GROUP BY 1, 2),
       |totals AS (
       |  SELECT prev_type, CAST(SUM(cnt) AS BIGINT) AS total
       |  FROM pairs GROUP BY prev_type)
       |SELECT prev_type, next_type, cnt, (cnt * 1000000) // total AS ppm
       |FROM pairs JOIN totals USING (prev_type)
       |ORDER BY prev_type, next_type""".stripMargin

  /** Robust anomaly detection: per event type, the median and the
    * median absolute deviation (MAD), flagging |x − med| > 3·MAD — the
    * outlier rule that, unlike [[zscoreAnomalies]]'s mean/stddev, a few
    * extreme values cannot drag. Both medians are SELECTED, never
    * interpolated: the lower median via `row_number` at rank
    * `(n+1) div 2` with an event_id tiebreak, so every emitted double
    * is a raw corpus value or one IEEE subtract/abs of two — no
    * accumulation anywhere, engine-identical with no rounding.
    *
    * Scale shape: two rank windows keyed on event_type (the same
    * partition key the per-type sort shuffles on) + broadcast joins of
    * the |type|-row median/MAD tables. A production corpus with
    * billions of rows per type swaps the in-partition sort for the
    * two-pass distributed rank — same output, swap confined here.
    */
  val anomalyMad: Q = (s, dir) => {
    import s.implicits._
    val ev = graft.CacheTracker.persistTracked(
      Tables(s, dir, "events").select($"event_id", $"event_type", $"value"))
    val n = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val wV = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val med = ev.withColumn("rn", row_number().over(wV))
      .join(broadcast(n), "event_type")
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"event_type", $"value".as("med"))
    val dev = graft.CacheTracker.persistTracked(
      ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs($"value" - $"med")))
    val wD = Window.partitionBy($"event_type").orderBy($"dev", $"event_id")
    val mad = dev.withColumn("rn", row_number().over(wD))
      .join(broadcast(n), "event_type")
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"event_type", $"dev".as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"med").as("med"), min($"mad").as("mad"),
        sum(when($"dev" > lit(3.0) * $"mad", 1L).otherwise(0L))
          .as("n_anomalies"))
      .orderBy($"event_type")
  }

  val anomalyMadSql: String =
    s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
       |nn AS (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1),
       |med AS (SELECT event_type, value AS med FROM (
       |    SELECT e.event_type, e.value, n.n, row_number() OVER (
       |      PARTITION BY e.event_type ORDER BY e.value, e.event_id) AS rn
       |    FROM ev e JOIN nn n USING (event_type))
       |  WHERE rn = (n + 1) // 2),
       |dev AS (
       |  SELECT e.event_type, e.event_id, m.med, abs(e.value - m.med) AS dev
       |  FROM ev e JOIN med m USING (event_type)),
       |mad AS (SELECT event_type, dev AS mad FROM (
       |    SELECT d.event_type, d.dev, n.n, row_number() OVER (
       |      PARTITION BY d.event_type ORDER BY d.dev, d.event_id) AS rn
       |    FROM dev d JOIN nn n USING (event_type))
       |  WHERE rn = (n + 1) // 2)
       |SELECT event_type, COUNT(*) AS n, MIN(med) AS med, MIN(mad) AS mad,
       |  CAST(SUM(CASE WHEN dev > CAST(3.0 AS DOUBLE) * mad
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
       |FROM dev JOIN mad USING (event_type)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Autocorrelation lags (hours) the seasonality report probes. */
  private val AcfLags = Seq(1, 2, 3, 6, 12, 24)

  /** Lag-k autocorrelation of the hourly event-count series — the
    * seasonality diagnostic run before time-slicing a corpus (a daily
    * cycle shows up as a high lag-24 coefficient). Entirely INTEGER
    * arithmetic: with S = Σx and n hours, ACF_k's numerator and
    * denominator are emitted as the exact integers
    * num_k = Σ (n·x_t − S)(n·x_{t+k} − S) and den = Σ (n·x_t − S)²
    * (the mean-centered sums scaled by n² so no rational mean ever
    * materializes — the ratio num/den is the textbook coefficient,
    * left to the consumer so no float touches the hash). Gaps in the
    * hour spine count as zero (a dense series is the ACF contract).
    *
    * Scale shape: one scan to hourly counts (shuffle on the hour key),
    * then every downstream row count is DOMAIN-sized (hours in the
    * corpus' time span) — the [[graft.pipeline.CurationQueries]]
    * quantile-bins precedent for the unpartitioned lead window. Sums
    * ride DECIMAL(38,0)/HUGEINT so a century-long span cannot
    * silently overflow; the final BIGINT cast fails loudly instead.
    */
  val autocorrelation: Q = (s, dir) => {
    import s.implicits._
    val counts = Tables(s, dir, "events")
      .select(expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("x"))
    val spine = counts.agg(min($"h").as("h0"), max($"h").as("h1"))
      .select(explode(sequence($"h0", $"h1")).as("h"))
    val series = graft.CacheTracker.persistTracked(
      spine.join(counts, Seq("h"), "left")
        .select($"h", coalesce($"x", lit(0L)).as("x")))
    val st = series.agg(count(lit(1)).as("n"), sum($"x").as("ss"))
    val w = Window.orderBy($"h")
    val dv = series.crossJoin(broadcast(st))
      .select($"h", $"n", $"ss", ($"n" * $"x" - $"ss").as("dev"))
    val led = AcfLags.foldLeft(dv)((df, k) =>
      df.withColumn(s"d$k", lead($"dev", k).over(w)))
    // Widen EACH FACTOR to decimal before multiplying: dev reaches
    // ~n_hours·max_x (≈3e9 at 1e9-event scale), so dev² overflows int64
    // and a long*long product would wrap SILENTLY (ANSI off) before the
    // decimal widen could help. decimal(38,0)×decimal(38,0) mirrors the
    // oracle's HUGEINT products exactly; loudLong makes the final
    // narrowing raise instead of NULLing on overflow.
    val dec = "decimal(38,0)"
    val aggCols = max($"n").as("n") +: max($"ss").as("s") +:
      loudLong(sum($"dev".cast(dec) * $"dev".cast(dec))).as("den") +:
      AcfLags.map(k =>
        loudLong(sum($"dev".cast(dec) * col(s"d$k").cast(dec))).as(s"num$k"))
    val aggRow = led.agg(aggCols.head, aggCols.tail: _*)
    aggRow.select(explode(array(AcfLags.map(k =>
        struct(lit(k).as("lag"), $"n", $"s",
          col(s"num$k").as("num"), $"den".as("den"))): _*)).as("r"))
      .select($"r.lag", $"r.n", $"r.s", $"r.num", $"r.den")
      .orderBy($"lag")
  }

  val autocorrelationSql: String = {
    val leads = AcfLags.map(k =>
      s"lead(dev, $k) OVER (ORDER BY h) AS d$k").mkString(",\n    ")
    val nums = AcfLags.map(k =>
      s"CAST(SUM(CAST(dev AS HUGEINT) * d$k) AS BIGINT) AS num$k")
      .mkString(",\n    ")
    val rows = AcfLags.map(k =>
      s"SELECT CAST($k AS INT) AS lag, n, s, num$k AS num, den FROM agg")
      .mkString("\n  UNION ALL ")
    s"""WITH cnt AS (
       |  SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS x
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cnt),
       |spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds),
       |series AS (
       |  SELECT s.h, COALESCE(c.x, 0) AS x
       |  FROM spine s LEFT JOIN cnt c USING (h)),
       |st AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS ss FROM series),
       |dv AS (
       |  SELECT h, n, ss, n * x - ss AS dev FROM series CROSS JOIN st),
       |led AS (
       |  SELECT n, ss, dev,
       |    $leads
       |  FROM dv),
       |agg AS (
       |  SELECT MAX(n) AS n, MAX(ss) AS s,
       |    CAST(SUM(CAST(dev AS HUGEINT) * dev) AS BIGINT) AS den,
       |    $nums
       |  FROM led)
       |$rows
       |ORDER BY lag""".stripMargin
  }

  /** Per-segment trend detection — the "is this event type growing?"
    * diagnostic, as exact-integer OLS: per event_type the daily-count
    * series (x = day index rebased to the corpus' first day, y =
    * count) yields slope = num/den with
    * num = n·Σxy − Σx·Σy and den = n·Σxx − (Σx)² — both EXACT
    * integers (the [[autocorrelation]] discipline: clear the rational
    * mean, emit the integer pair, let no float near the hash). The
    * verdict column is the slope's sign. One shuffle to (type, day)
    * counts, one to per-type sums; day gaps count as missing points
    * (OLS over observed days — the n in the formula is observed days,
    * so the two engines agree by construction).
    */
  val trendSlope: Q = (s, dir) => {
    import s.implicits._
    val daily = Tables(s, dir, "events")
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("y"))
    val d0 = daily.agg(min($"day").as("d0"))
    val xy = daily.crossJoin(broadcast(d0))
      .select($"event_type", ($"day" - $"d0").as("x"), $"y")
    xy.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"event_type", $"n_days",
        ($"n_days" * $"sxy" - $"sx" * $"sy").as("num"),
        ($"n_days" * $"sxx" - $"sx" * $"sx").as("den"))
      .withColumn("trend",
        when($"num" > 0, "up").when($"num" < 0, "down").otherwise("flat"))
      .orderBy($"event_type")
  }

  /** Holt's double exponential smoothing (level + trend, α = β = 1/4)
    * over the dense per-type daily-count series — the forecasting
    * sibling of [[trendSlope]]: where OLS fits ONE line to the whole
    * span, Holt tracks a drifting level and trend and extrapolates
    * (the capacity-planning primitive behind "will this event volume
    * hit the quota next week?"). Exact fixed-point arithmetic in
    * micro-units: s_t = ⌊(c_t·10⁶ + 3·(s₋ + b₋))/4⌋ and
    * b_t = ⌊((s_t − s₋) + 3·b₋)/4⌋, where every floor-division runs
    * through the OFFSET identity ⌊x/4⌋ = ((x + 4e15) div 4) − 1e15 in
    * BOTH engines — b_t goes negative on decaying series, and Spark's
    * `div` truncates toward zero while DuckDB's `//` floors, so the
    * shared positive-shifted form is the only safe quotient (the r12
    * rule: never hash a quotient of possibly-negative integers).
    * Headroom: c·10⁶ + 3(s+b) + 4e15 stays under int64 for daily
    * counts up to ~10¹² — documented next to the shift.
    *
    * Shape: one shuffle to (type, day) counts, a domain-sized spine
    * join (gaps are real zero-count days — a forecast over a sparse
    * series must see them), then ONE bounded per-key fold — the
    * Viterbi aggregate-expression discipline (no per-step jobs, state
    * as a struct riding the fold; the DuckDB oracle replays it as a
    * recursive CTE carrying the counts list in-row, the r13
    * pre-grouped-list template).
    */
  val holtWinters: Q = (s, dir) => {
    import s.implicits._
    val daily = Tables(s, dir, "events")
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
    val bounds = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
    val spine = bounds.select(explode(sequence($"d0", $"d1")).as("day"))
      .crossJoin(broadcast(daily.select($"event_type").distinct()))
    val arr = spine.join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"c", lit(0L)).as("c"))
      .groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"c"))).as("dc"))
      .select($"event_type", expr("transform(dc, x -> x.c)").as("cs"))
    val sNew = "(((c * 1000000L + 3L * (acc.s + acc.b)) + 4000000000000000L)" +
      " div 4L) - 1000000000000000L"
    val bNew = s"(((($sNew) - acc.s + 3L * acc.b) + 4000000000000000L)" +
      " div 4L) - 1000000000000000L"
    val fold = expr(
      s"""aggregate(slice(cs, 2, size(cs) - 1),
         |  named_struct('s', element_at(cs, 1) * 1000000L, 'b', 0L),
         |  (acc, c) -> named_struct('s', $sNew, 'b', $bNew))""".stripMargin)
    arr.select($"event_type", size($"cs").as("n_days"), fold.as("hw"))
      .select($"event_type", $"n_days",
        $"hw.s".as("level_micro"), $"hw.b".as("trend_micro"),
        ($"hw.s" + lit(7L) * $"hw.b").as("forecast7_micro"))
      .orderBy($"event_type")
  }

  val holtWintersSql: String = {
    val sNew = "((cs[i + 1] * 1000000 + 3 * (s + b) + 4000000000000000)" +
      " // 4) - 1000000000000000"
    val bNew = s"(((($sNew) - s + 3 * b) + 4000000000000000)" +
      " // 4) - 1000000000000000"
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
       |  FROM events GROUP BY 1, 2),
       |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
       |spine AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds),
       |types AS (SELECT DISTINCT event_type FROM daily),
       |series AS (
       |  SELECT t.event_type, s.day, COALESCE(d.c, CAST(0 AS BIGINT)) AS c
       |  FROM types t CROSS JOIN spine s
       |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day),
       |arr AS (
       |  SELECT event_type, list(c ORDER BY day) AS cs
       |  FROM series GROUP BY event_type),
       |rec AS (
       |  SELECT event_type, cs, 1 AS i,
       |    cs[1] * 1000000 AS s, CAST(0 AS BIGINT) AS b
       |  FROM arr
       |  UNION ALL
       |  SELECT event_type, cs, i + 1, $sNew, $bNew
       |  FROM rec WHERE i < len(cs))
       |SELECT event_type, CAST(len(cs) AS INT) AS n_days,
       |  CAST(s AS BIGINT) AS level_micro, CAST(b AS BIGINT) AS trend_micro,
       |  CAST(s + 7 * b AS BIGINT) AS forecast7_micro
       |FROM rec WHERE i = len(cs)
       |ORDER BY event_type""".stripMargin
  }

  val trendSlopeSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |d0 AS (SELECT MIN(day) AS d0 FROM daily),
      |xy AS (
      |  SELECT event_type, day - d0 AS x, CAST(y AS BIGINT) AS y
      |  FROM daily CROSS JOIN d0),
      |sums AS (
      |  SELECT event_type, COUNT(*) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM xy GROUP BY event_type)
      |SELECT event_type, n_days,
      |  n_days * sxy - sx * sy AS num,
      |  n_days * sxx - sx * sx AS den,
      |  CASE WHEN n_days * sxy - sx * sy > 0 THEN 'up'
      |       WHEN n_days * sxy - sx * sy < 0 THEN 'down'
      |       ELSE 'flat' END AS trend
      |FROM sums ORDER BY event_type""".stripMargin

  /** CUSUM change-point detection per event type — the level-shift
    * diagnostic run beside [[trendSlope]] before time-slicing a corpus:
    * for each type's DAILY count series on the corpus' dense day spine
    * (gaps are zero — absence of events IS the signal a change detector
    * must see), the cumulative sum of n-scaled mean deviations
    * C_d = Σ_{i≤d} (n·y_i − S) peaks in magnitude at the most likely
    * change point. Entirely INTEGER (the [[autocorrelation]]
    * discipline): scaling by n clears the rational mean, so the peak
    * day, its C value and the sign (positive C = the level DROPPED
    * after that day; counts ran above the mean before it) are exact in
    * both engines. Ties on |C| break to the earliest day.
    *
    * Scale shape: one shuffle to (type, day) counts, then every row
    * count is DOMAIN-sized (types × days in the corpus' span) — the
    * quantile-bins precedent for the per-type running-sum window.
    * Headroom: C ≤ n²·max_y ≤ 3650²·(corpus/365) — int64-safe past
    * 10¹² events/day over a decade; the running sum rides
    * DECIMAL(38,0)/HUGEINT with a loudLong narrowing, so past that it
    * raises rather than wrapping (ANSI-off long maths would wrap
    * silently).
    */
  val cusumChangepoint: Q = (s, dir) => {
    import s.implicits._
    // read three times (bounds, type list, spine join): persist the
    // domain-sized count table so the events scan runs once
    val daily = graft.CacheTracker.persistTracked(
      Tables(s, dir, "events")
        .select($"event_type",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y")))
    val bounds = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
    val types = daily.select($"event_type").distinct()
    val spine = types.crossJoin(broadcast(bounds))
      .select($"event_type", explode(sequence($"d0", $"d1")).as("day"), $"d0")
    val series = spine.join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", $"d0", coalesce($"y", lit(0L)).as("y"))
    val st = Window.partitionBy($"event_type")
    val run = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Per-factor decimal widening before the n·y product and a decimal
    // running sum (the oracle's HUGEINT window SUM), narrowed loudly —
    // long·long would wrap silently past ~10¹² events/day·decade.
    val dec = "decimal(38,0)"
    val cus = series
      .withColumn("n", count(lit(1)).over(st))
      .withColumn("ss", sum($"y").over(st))
      .withColumn("c", loudLong(sum(
        $"n".cast(dec) * $"y".cast(dec) - $"ss".cast(dec)).over(run)))
    cus.withColumn("rk", row_number().over(
        Window.partitionBy($"event_type").orderBy(abs($"c").desc, $"day")))
      .filter($"rk" === 1)
      .select($"event_type", $"n".as("n_days"),
        ($"day" - $"d0").as("change_day"), $"c".as("cusum"),
        when($"c" > 0, "drop_after").when($"c" < 0, "rise_after")
          .otherwise("flat").as("shift"))
      .orderBy($"event_type")
  }

  val cusumChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |spine AS (
      |  SELECT t.event_type, unnest(range(b.d0, b.d1 + 1)) AS day, b.d0
      |  FROM types t CROSS JOIN bounds b),
      |series AS (
      |  SELECT s.event_type, s.day, s.d0, COALESCE(d.y, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |    ON s.event_type = d.event_type AND s.day = d.day),
      |st AS (
      |  SELECT event_type, day, d0, y,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n,
      |    CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS ss
      |  FROM series),
      |cus AS (
      |  SELECT event_type, day, d0, n,
      |    CAST(SUM(n * y - ss) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      |  FROM st),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs(c) DESC, day) AS r
      |  FROM cus)
      |SELECT event_type, n AS n_days, day - d0 AS change_day, c AS cusum,
      |  CASE WHEN c > 0 THEN 'drop_after' WHEN c < 0 THEN 'rise_after'
      |       ELSE 'flat' END AS shift
      |FROM rk WHERE r = 1 ORDER BY event_type""".stripMargin

  /** Day-of-week seasonality profile per event type — the weekly-cycle
    * companion to [[cusumChangepoint]] and [[autocorrelation]]: on the
    * same dense day spine (absent days count zero), each (type, dow)
    * cell reports its day count, event total, and the exact integer
    * rate `1000·events div days`; the per-type peak weekday is flagged
    * (rate rank with dow tie-break — integer comparisons only, so both
    * engines agree even when rates tie). Weekday is computed from the
    * epoch-day index ((day + 4) mod 7, 0 = Sunday) — pure arithmetic,
    * immune to locale/timezone WEEKDAY() divergence.
    *
    * Scale shape: one shuffle to (type, day) counts, then domain-sized
    * rows (types × days → types × 7); the rank window is over 7 rows
    * per type.
    */
  val seasonalityDow: Q = (s, dir) => {
    import s.implicits._
    // read three times (bounds, type list, spine join): persist the
    // domain-sized count table so the events scan runs once
    val daily = graft.CacheTracker.persistTracked(
      Tables(s, dir, "events")
        .select($"event_type",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y")))
    val bounds = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
    val types = daily.select($"event_type").distinct()
    val spine = types.crossJoin(broadcast(bounds))
      .select($"event_type", explode(sequence($"d0", $"d1")).as("day"))
    val series = spine.join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"y", lit(0L)).as("y"),
        expr("pmod(day + 4, 7)").as("dow"))
    val cells = series.groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("n_days"), sum($"y").as("n_events"))
      .withColumn("rate_permille",
        expr("(1000 * n_events) div n_days"))
    cells.withColumn("is_peak", row_number().over(
        Window.partitionBy($"event_type")
          .orderBy($"rate_permille".desc, $"dow")) === 1)
      .orderBy($"event_type", $"dow")
  }

  val seasonalityDowSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |spine AS (
      |  SELECT t.event_type, unnest(range(b.d0, b.d1 + 1)) AS day
      |  FROM types t CROSS JOIN bounds b),
      |series AS (
      |  SELECT s.event_type, s.day, COALESCE(d.y, 0) AS y,
      |    ((s.day + 4) % 7 + 7) % 7 AS dow
      |  FROM spine s LEFT JOIN daily d
      |    ON s.event_type = d.event_type AND s.day = d.day),
      |cells AS (
      |  SELECT event_type, dow, COUNT(*) AS n_days,
      |    CAST(SUM(y) AS BIGINT) AS n_events
      |  FROM series GROUP BY event_type, dow),
      |rated AS (
      |  SELECT *, CAST((1000 * n_events) // n_days AS BIGINT)
      |    AS rate_permille
      |  FROM cells)
      |SELECT event_type, dow, n_days, n_events, rate_permille,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY rate_permille DESC, dow) = 1 AS is_peak
      |FROM rated ORDER BY event_type, dow""".stripMargin

  /** Burstiness (index of dispersion) per event type — the Poisson-ness
    * diagnostic beside [[trendSlope]]/[[cusumChangepoint]]: on the dense
    * day spine, the Fano factor F = Var/Mean distinguishes bursty
    * (F ≫ 1), Poisson-like (F ≈ 1), and clock-regular (F < 1) streams.
    * Emitted as EXACT INTEGERS (the autocorrelation discipline):
    * n days, total S, var_num = n·Σy² − S², so
    * F = var_num / (n·S) is the textbook value (population variance
    * over mean) with no float near the hash; the verdict column
    * compares var_num against n·S in integers.
    *
    * Scale shape: one shuffle to the persisted (type, day) counts, one
    * per-type aggregate over domain-sized rows.
    */
  val burstiness: Q = (s, dir) => {
    import s.implicits._
    val daily = graft.CacheTracker.persistTracked(
      Tables(s, dir, "events")
        .select($"event_type",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("y")))
    val bounds = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
    val types = daily.select($"event_type").distinct()
    val spine = types.crossJoin(broadcast(bounds))
      .select($"event_type", explode(sequence($"d0", $"d1")).as("day"))
    val series = spine.join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", coalesce($"y", lit(0L)).as("y"))
    // y² widened per-factor (long·long wraps silently past y≈3e9 with
    // ANSI off); loudLong raises on narrowing overflow.
    val dec = "decimal(38,0)"
    series.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"y").as("s"),
        loudLong(sum($"y".cast(dec) * $"y".cast(dec))).as("syy"))
      .select($"event_type", $"n_days", $"s",
        loudLong($"n_days".cast(dec) * $"syy".cast(dec) -
          $"s".cast(dec) * $"s".cast(dec)).as("var_num"),
        ($"n_days" * $"s").as("mean_den"))
      .withColumn("regime",
        when($"var_num" > $"mean_den" * 2, "bursty")
          .when($"var_num" * 2 < $"mean_den", "regular")
          .otherwise("poisson_like"))
      .orderBy($"event_type")
  }

  val burstinessSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |spine AS (
      |  SELECT t.event_type, unnest(range(b.d0, b.d1 + 1)) AS day
      |  FROM types t CROSS JOIN bounds b),
      |series AS (
      |  SELECT s.event_type, COALESCE(d.y, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |    ON s.event_type = d.event_type AND s.day = d.day),
      |sums AS (
      |  SELECT event_type, COUNT(*) AS n_days,
      |    CAST(SUM(y) AS BIGINT) AS s,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
      |  FROM series GROUP BY event_type),
      |stats AS (
      |  SELECT event_type, n_days, s,
      |    CAST(CAST(n_days AS HUGEINT) * syy
      |      - CAST(s AS HUGEINT) * s AS BIGINT) AS var_num,
      |    n_days * s AS mean_den
      |  FROM sums)
      |SELECT event_type, n_days, s, var_num, mean_den,
      |  CASE WHEN var_num > mean_den * 2 THEN 'bursty'
      |       WHEN var_num * 2 < mean_den THEN 'regular'
      |       ELSE 'poisson_like' END AS regime
      |FROM stats ORDER BY event_type""".stripMargin

  /** Exponentially-decayed activity ranking — the "trending now"
    * scoring every feed/leaderboard pipeline runs: each user's events
    * are weighted by 2^(day − d_max) (half-life = one day) so
    * yesterday counts half of today, last week ~1%. Computed EXACTLY
    * as integers by scaling the whole corpus by 2^(d_max − d_min):
    * score = Σ_days cnt(u, d) · (1 << (d − d_min)) — a left shift per
    * day, no pow()/libm anywhere, so ranks cannot drift cross-engine
    * (the same scaled-integer trick as the fixed-point PageRank).
    * Per-day counts widen to decimal/HUGEINT before the sum and land
    * behind [[graft.functions.Exact.loudLong]]: 30 days of span leaves
    * 2^29 headroom × per-user-day counts ≪ int64; a year-long window
    * at scale would bucket days into weeks first (same shift trick,
    * exponent ≤ 52) — the recipe documents its own headroom.
    *
    * Scale shape: one shuffle to (user, day) counts, one per-user
    * aggregate, a global top-50 (rank window over the already
    * user-collapsed frame — 1 row per user, not per event).
    */
  val decayedCounts: Q = (s, dir) => {
    import s.implicits._
    val daily = graft.CacheTracker.persistTracked(
      Tables(s, dir, "events")
        .select($"user_id",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .groupBy($"user_id", $"day").agg(count(lit(1)).as("y")))
    // 1-row bounded driver read (the house cap+1 discipline): the shift
    // weight WRAPS SILENTLY past 62 bits (Spark masks the shift count),
    // so the day span is checked loudly here instead of trusting the
    // corpus — testdata is regenerated between rounds (CLAUDE.md)
    val b0 = daily.agg(min($"day"), max($"day")).collect()(0)
    val (d0, d1) = (b0.getLong(0), b0.getLong(1))
    require(d1 - d0 <= 62,
      s"events_decayed_counts: day span ${d1 - d0} exceeds the 62-bit " +
        "shift headroom — bucket days into weeks before decaying")
    // div/`//` only agree on non-negative operands (Spark truncates
    // toward zero, DuckDB floors) — a pre-1970 corpus would bucket days
    // differently across engines, so fail loudly instead
    require(d0 >= 0,
      s"events_decayed_counts: min day $d0 is pre-epoch — div vs // " +
        "floor semantics diverge on negative days")
    val dec = "decimal(38,0)"
    val scored = daily
      .select($"user_id", $"y",
        expr(s"shiftleft(cast(1 as bigint), cast(day - $d0 as int))")
          .as("w"),
        (lit(d1) - $"day").as("age"))
      .groupBy($"user_id")
      .agg(loudLong(sum($"y".cast(dec) * $"w".cast(dec))).as("score"),
        sum($"y").as("n_events"),
        min($"age").as("days_idle"))
    // bound FIRST (orderBy+limit → TakeOrderedAndProject, distributed
    // top-k), then rank the 50 survivors — the global row_number window
    // only ever sees k rows, never the user universe
    scored.orderBy($"score".desc, $"user_id").limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy($"score".desc, $"user_id")).cast("int"))
      .select($"rank", $"user_id", $"score", $"n_events", $"days_idle")
      .orderBy($"rank")
  }

  val decayedCountsSql: String =
    """WITH daily AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |scored AS (
      |  SELECT user_id,
      |    CAST(SUM(CAST(y AS HUGEINT) *
      |      (CAST(1 AS BIGINT) << (day - d0))) AS BIGINT) AS score,
      |    CAST(SUM(y) AS BIGINT) AS n_events,
      |    MIN(d1 - day) AS days_idle
      |  FROM daily CROSS JOIN bounds
      |  GROUP BY user_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY score DESC, user_id) AS rank
      |  FROM scored)
      |SELECT CAST(rank AS INTEGER) AS rank, user_id, score, n_events,
      |  days_idle
      |FROM ranked WHERE rank <= 50 ORDER BY rank""".stripMargin

  /** Marketing attribution — first-touch vs last-touch revenue credit,
    * the classic conversion-analytics pair: every `purchase` event's
    * value is credited (a) to the user's most recent click/view
    * STRICTLY BEFORE it (last-touch) and (b) to the user's earliest
    * click/view ever (first-touch); purchases with no preceding touch
    * land in the 'none' bucket so the report partitions revenue
    * exactly. The per-user "latest preceding touch" is a window ARGMAX
    * — DuckDB can't MAX a struct over a frame, so the (ts, event_id,
    * type) triple rides the fixed-width-ASCII string encoding
    * (lpad(us)|lpad(id)|type; lexicographic MAX = latest, the
    * winnowing/DP template) identically in both engines, with event_id
    * making simultaneous-timestamp ties deterministic.
    *
    * Scale shape: ONE shuffle on user_id serves both window passes and
    * at 100 TB is the same user-keyed exchange sessionization already
    * pays; the output is |models × touch types| rows. Revenue sums
    * ride the decimal detour.
    */
  val attribution: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"user_id", $"event_type", $"value", $"event_id",
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("tkey", when($"event_type".isin("click", "view"),
        concat(lpad($"us".cast("string"), 20, "0"), lit("|"),
          lpad($"event_id".cast("string"), 20, "0"), lit("|"),
          $"event_type")))
    val wUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val wPrev = wUser.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = wUser.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val credited = ev
      .withColumn("last_touch", max($"tkey").over(wPrev))
      .withColumn("first_touch", min($"tkey").over(wAll))
      .filter($"event_type" === "purchase")
      .select($"value",
        coalesce(substring_index($"last_touch", "|", -1), lit("none"))
          .as("last_type"),
        coalesce(substring_index($"first_touch", "|", -1), lit("none"))
          .as("first_type"))
    val lastM = credited.groupBy($"last_type".as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("revenue"))
      .withColumn("model", lit("last_touch"))
    val firstM = credited.groupBy($"first_type".as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("revenue"))
      .withColumn("model", lit("first_touch"))
    lastM.unionByName(firstM)
      .select($"model", $"touch_type", $"n_purchases", $"revenue")
      .orderBy($"model", $"touch_type")
  }

  val attributionSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, value, event_id, epoch_us(ts) AS us,
       |    CASE WHEN event_type IN ('click', 'view') THEN
       |      lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
       |      lpad(CAST(event_id AS VARCHAR), 20, '0') || '|' || event_type
       |    END AS tkey
       |  FROM events),
       |credited AS (
       |  SELECT value,
       |    COALESCE(string_split(MAX(tkey) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), '|')[3],
       |      'none') AS last_type,
       |    COALESCE(string_split(MIN(tkey) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       |      '|')[3], 'none') AS first_type,
       |    event_type
       |  FROM ev),
       |purchases AS MATERIALIZED (
       |  SELECT * FROM credited WHERE event_type = 'purchase'),
       |both_models AS (
       |  SELECT 'last_touch' AS model, last_type AS touch_type, value
       |  FROM purchases
       |  UNION ALL
       |  SELECT 'first_touch', first_type, value FROM purchases)
       |SELECT model, touch_type, COUNT(*) AS n_purchases,
       |  ${sqlDsum("value")} AS revenue
       |FROM both_models GROUP BY model, touch_type
       |ORDER BY model, touch_type""".stripMargin

  /** Cohort lifetime-value matrix — the retention-economics view every
    * subscription/commerce pipeline maintains: users are cohorted by
    * their first-seen absolute week, and each (cohort, age-in-weeks)
    * cell reports active users and purchase revenue. Week indices are
    * pure integer day-div-7 (no calendar libm); revenue rides the
    * decimal detour; the matrix is |cohorts × ages| rows regardless of
    * corpus size.
    *
    * Scale shape: one groupBy (user, week) pass, a broadcast-joinable
    * per-user cohort table (user-count-sized — shuffled on user_id,
    * the same key), one final domain-sized aggregate.
    */
  val cohortLtv: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"user_id", $"event_type", $"value",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000 div 7")
          .as("w"))
    val cohort = ev.groupBy($"user_id").agg(min($"w").as("cohort_w"))
    val cells = ev.join(cohort, "user_id")
      .withColumn("age", $"w" - $"cohort_w")
      .groupBy($"cohort_w", $"age")
      .agg(countDistinct($"user_id").as("active_users"),
        sum(($"event_type" === "purchase").cast("long")).as("n_purchases"),
        dsum(when($"event_type" === "purchase", $"value").otherwise(0.0))
          .as("revenue"))
    cells.orderBy($"cohort_w", $"age")
  }

  val cohortLtvSql: String =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, event_type, value,
       |    epoch_us(ts) // 86400000000 // 7 AS w
       |  FROM events),
       |cohort AS (SELECT user_id, MIN(w) AS cohort_w FROM ev GROUP BY 1)
       |SELECT cohort_w, w - cohort_w AS age,
       |  COUNT(DISTINCT ev.user_id) AS active_users,
       |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_purchases,
       |  ${sqlDsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")}
       |    AS revenue
       |FROM ev JOIN cohort USING (user_id)
       |GROUP BY cohort_w, age ORDER BY cohort_w, age""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "events_attribution" -> (attribution, Some(attributionSql)),
    "events_cohort_ltv" -> (cohortLtv, Some(cohortLtvSql)),
    "events_decayed_counts" -> (decayedCounts, Some(decayedCountsSql)),
    "events_burstiness" -> (burstiness, Some(burstinessSql)),
    "events_seasonality_dow" -> (seasonalityDow, Some(seasonalityDowSql)),
    "events_cusum_changepoint" ->
      (cusumChangepoint, Some(cusumChangepointSql)),
    "events_trend_slope" -> (trendSlope, Some(trendSlopeSql)),
    "events_holt_winters" -> (holtWinters, Some(holtWintersSql)),
    "events_autocorrelation" -> (autocorrelation, Some(autocorrelationSql)),
    "events_anomaly_mad" -> (anomalyMad, Some(anomalyMadSql)),
    "events_markov_transitions" -> (markovTransitions, Some(markovTransitionsSql)),
    "events_gap_fill" -> (gapFill, Some(gapFillSql)),
    "events_funnel_conversion" -> (funnelConversion, Some(funnelConversionSql)),
    "events_user_seq_typed" -> (userSeqTyped, Some(userSeqTypedSql)),
    "events_type_count_map" -> (eventTypeMap, Some(eventTypeMapSql)),
    "events_retention_daily" -> (retentionDaily, Some(retentionDailySql)),
    "events_zscore_anomalies" -> (zscoreAnomalies, Some(zscoreSql)),
    "events_tumbling_10m" -> (tumbling, Some(tumblingSql)),
    "events_sliding_10m5m" -> (sliding, Some(slidingSql)),
    "events_sessions_30m" -> (sessions, Some(sessionsSql)),
    "events_json_props" -> (jsonProps, Some(jsonPropsSql))
  )
}
