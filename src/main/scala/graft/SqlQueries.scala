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

  /** MinHash-LSH near-dup dedup as pure SQL text (r11 VERDICT #8 — the
    * dedup family's entry-point twin): the same corpus construction,
    * native `word_shingles`/`minhash_md5` resolving through the SQL
    * parser, banding via posexplode + collect_list, the hot-band cap as
    * a window, exact-Jaccard verify. Hash-gated against the SAME oracle
    * as `dedup_minhash_lsh`. (Note: `agg_grouping_sets` needs no twin —
    * its DSL gate is ALREADY issued as spark.sql text.)
    *
    * Plans intentionally NOT identical to the DSL twin: the DSL path
    * persists the shingled corpus and band table (read 3×/2×); SQL text
    * has no persist hook, so Spark inlines the CTEs and re-derives them
    * per reference. Same values, pinned by the shared hash gate; the
    * DSL gate remains the performance formulation.
    */
  val sqlDedupMinhash: Q = (s, dir) => {
    val (k, bands, r, cap) = (graft.Tuning.minhashK, graft.Tuning.minhashBands,
      graft.Tuning.minhashR, graft.Tuning.lshBandCap)
    graft.functions.Registry.registerAll(s)
    // same +10000 planted-variant scheme as the DSL twin — same loud
    // corpus-drift guard (collisions would be green-but-wrong in BOTH
    // engines, invisible to the hash gate)
    graft.text.DedupQueries.assertVariantIdHeadroom(s, dir)
    // NOTE r14: a docs0 CTE with DISTRIBUTE BY doc_id (the SQL form of
    // the single-partition repartition) measured a NULL here — paired
    // A/B (QueryProbe sqltwin, alternating reps): distribute 2.06 s vs
    // plain 1.96 s median. The inlined CTE chain re-evaluates shingles
    // anyway, so the exchange only adds cost; the DSL gate keeps its
    // repartition (its persist hook makes the parallel tokenize pay).
    overViews(s, dir, Seq("documents"),
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ') AS toks
         |  FROM graft_documents),
         |base AS (SELECT * FROM docs WHERE size(toks) >= 15),
         |corpus AS (
         |  SELECT doc_id, toks FROM base
         |  UNION ALL
         |  SELECT doc_id + 10000, slice(toks, 1, size(toks) - 5) FROM base),
         |shingled AS (SELECT doc_id, word_shingles(toks, 3) AS sh FROM corpus),
         |sig AS (SELECT doc_id, posexplode(minhash_md5(sh, $k)) AS (i, h)
         |        FROM shingled),
         |bandt AS (
         |  SELECT doc_id, CAST(floor(i / $r) AS INT) AS band,
         |    array_join(transform(array_sort(collect_list(struct(i, h))),
         |      st -> st.h), '|') AS mh
         |  FROM sig GROUP BY doc_id, CAST(floor(i / $r) AS INT)),
         |sized AS (
         |  SELECT doc_id, band, mh,
         |    COUNT(*) OVER (PARTITION BY band, mh) AS gsz FROM bandt),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sized a JOIN sized b ON a.band = b.band AND a.mh = b.mh
         |  WHERE a.gsz <= $cap AND a.doc_id < b.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |      CAST(size(array_union(sa.sh, sb.sh)) AS DOUBLE) AS jaccard
         |  FROM cand JOIN shingled sa ON cand.doc_a = sa.doc_id
         |            JOIN shingled sb ON cand.doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.4
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** The bucket-grid interval-overlap join as SQL text — same grid
    * explode, same exactly-once cell rule, against the DSL twin's
    * inequality-join oracle.
    */
  val sqlIntervalOverlap: Q = (s, dir) => {
    val hourUs = 3600L * 1000000L
    val dayUs = 24L * hourUs
    overViews(s, dir, Seq("events"),
      s"""WITH ev AS (
         |  SELECT user_id, event_type,
         |    unix_micros(CAST(ts AS TIMESTAMP)) AS us
         |  FROM graft_events),
         |a AS (SELECT user_id, us div $dayUs AS day,
         |        MIN(us) AS as_, MAX(us) + 1 AS ae
         |      FROM ev GROUP BY user_id, us div $dayUs),
         |b AS (SELECT event_type, us div $hourUs AS hr,
         |        MIN(us) AS bs, MAX(us) + 1 AS be
         |      FROM ev GROUP BY event_type, us div $hourUs),
         |aexp AS (SELECT user_id, as_, ae,
         |    explode(sequence(as_ div $hourUs, (ae - 1) div $hourUs)) AS g
         |  FROM a),
         |bexp AS (SELECT event_type, bs, be,
         |    explode(sequence(bs div $hourUs, (be - 1) div $hourUs)) AS g
         |  FROM b)
         |SELECT event_type, COUNT(*) AS n_pairs,
         |  COUNT(DISTINCT user_id) AS n_users
         |FROM aexp JOIN bexp USING (g)
         |WHERE as_ < be AND bs < ae
         |  AND g = greatest(as_, bs) div $hourUs
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Brute-force exact kNN as SQL text — the vector family's entry-point
    * twin, with the native `dot_exact_dec` kernel resolving through the
    * SQL parser inside the hoisted-norm/cosine formulation.
    */
  val sqlKnnBrute: Q = (s, dir) => {
    graft.functions.Registry.registerAll(s)
    overViews(s, dir, Seq("embeddings"),
      """WITH emb AS (
        |  SELECT vec_id, embedding,
        |    sqrt(dot_exact_dec(embedding, embedding)) AS xn
        |  FROM graft_embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, xn AS qxn
        |      FROM emb WHERE vec_id < 5),
        |scored AS (
        |  SELECT q_id, vec_id,
        |    dot_exact_dec(embedding, q_emb) / (xn * qxn) AS cosine
        |  FROM emb CROSS JOIN q WHERE vec_id <> q_id),
        |ranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT q_id, vec_id, round(cosine, 9) AS cosine, rank
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "sql_q1_pricing" -> (sqlQ1, Some(Queries.q1PricingSummarySql)),
    "sql_window_top3" -> (sqlWindowTop3, Some(TpchQueries.windowTop3Sql)),
    "sql_asof_purchase_click" -> (sqlAsof, Some(AdvancedJoins.asofSql)),
    "sql_native_functions" -> (sqlNativeFns, Some(sqlNativeFnsSql)),
    "sql_dedup_minhash" ->
      (sqlDedupMinhash, Some(graft.text.DedupQueries.minhashLshSql)),
    "sql_interval_overlap" ->
      (sqlIntervalOverlap, Some(AdvancedJoins.intervalOverlapSql)),
    "sql_knn_brute" -> (sqlKnnBrute, Some(graft.vector.SimilarityQueries.knnBruteSql)))
}
