package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** Partitioned-layout ("data lake") queries: the storage-side scan
  * features that decide whether a 100 TB table is read in full or in
  * slivers. The gate corpus ships as single parquet files, so these
  * queries first lay events out as a hive-partitioned table in scratch
  * (partition column = event_type) and then gate the two pruning paths
  * against the plain single-file oracle:
  *
  *   - STATIC partition pruning: a literal filter on the partition
  *     column must reach the file index (PartitionFilters), so only the
  *     matching directory is listed/read — guarded in PlanSpec.
  *   - DYNAMIC partition pruning (DPP): when the filter lives on a
  *     joined dimension, the scan learns its partition list at runtime
  *     from the broadcast side (dynamicpruning subquery) — THE feature
  *     that saves a fact-table scan when the dim filter is selective.
  *
  * Writing the layout is itself the ingest-side operator (partitionBy
  * on write — how any large fact table should land on disk).
  */
object LakeQueries {
  import Queries.Q

  /** One partitioned copy of events per (JVM, sf dir); built lazily and
    * reused by both queries — the layout is the fixture, the queries
    * gate the reads. Thread-safe via the synchronized map (Verify runs
    * queries sequentially, but nothing should rely on that).
    */
  private val built = scala.collection.mutable.Map[String, String]()
  private def partitionedEvents(s: org.apache.spark.sql.SparkSession,
                                dir: String): String = synchronized {
    built.getOrElseUpdate(dir, {
      val path = s"${Scratch.dir}/graft_lake_events_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
      Tables(s, dir, "events")
        .write.partitionBy("event_type").mode("overwrite").parquet(path)
      path
    })
  }

  /** Static pruning: aggregate one event type out of the partitioned
    * layout. At scale this reads |purchases|/|events| of the table —
    * the plan guard (not the row counts) is what proves it.
    */
  val prunedScan: Q = (s, dir) => {
    import s.implicits._
    s.read.parquet(partitionedEvents(s, dir))
      .filter($"event_type" === "purchase")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"),
        countDistinct($"user_id").as("n_users"))
  }

  val prunedScanSql: String =
    s"""SELECT COUNT(*) AS n, ${sqlDsum("value")} AS total_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events WHERE event_type = 'purchase'""".stripMargin

  /** Dynamic pruning: the event-type filter lives on a tiny category
    * dimension; the partitioned scan must learn {purchase} from the
    * broadcast at runtime. Per-type aggregate so the join is load-bearing.
    */
  val dppJoin: Q = (s, dir) => {
    import s.implicits._
    // the dim must be a FILE source: a literal local relation's filter
    // constant-folds away at plan time, leaving no selective predicate
    // for the optimizer to derive the dynamic pruning subquery from
    val dimPath = s"${Scratch.dir}/graft_lake_dim_${Scratch.runToken}"
    Seq(("purchase", "revenue"), ("click", "engagement"),
      ("view", "engagement"), ("signup", "acquisition"), ("error", "ops"))
      .toDF("event_type", "category")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.schema("event_type STRING, category STRING").parquet(dimPath)
    s.read.parquet(partitionedEvents(s, dir))
      .join(broadcast(dim.filter($"category" === "revenue")), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"event_type")
  }

  val dppJoinSql: String =
    s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events JOIN (VALUES ('purchase', 'revenue')) dim(event_type, category)
       |  USING (event_type)
       |WHERE category = 'revenue'
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Z-order clustering stats — the layout decision behind multi-column
    * data skipping: rows sorted by an interleaved-bit curve over
    * (user_id, value-bucket) land in files whose min/max ranges are
    * TIGHT in BOTH dimensions, so a predicate on either column prunes
    * files; a linear sort only bounds its leading column. The z-value
    * is pure integer bit arithmetic (engine-identical); the query
    * splits the curve into 16 STATIC equal-width z-ranges ("files") and
    * reports each range's per-dimension bounds — the footer stats a
    * skipping reader would consult. Entirely scan-local (no global
    * rank/window — fixed curve ranges ARE the file boundaries at
    * scale, exactly how a z-ordered writer assigns rows to files);
    * only the 16-row stats aggregate shuffles.
    */
  val zorderStats: Q = (s, dir) => {
    import s.implicits._
    val z = expr(
      """aggregate(sequence(0, 7), 0L, (acc, i) -> acc
        |  + shiftleft(shiftright(x, i) % 2, i * 2)
        |  + shiftleft(shiftright(y, i) % 2, i * 2 + 1))""".stripMargin)
    // pmod keeps x/y in [0,256) for ANY input sign, so z >= 0 and integer
    // `div` (truncating) agrees with DuckDB's floor `//` on every row —
    // double division + cast would diverge from the oracle on negatives
    Tables(s, dir, "events")
      .select($"event_id", pmod($"user_id".cast("long"), lit(256L)).as("x"),
        pmod(floor($"value" * 2.56).cast("long"), lit(256L)).as("y"))
      .withColumn("z", z)
      .withColumn("bucket", expr("z div 4096").cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"x").as("x_min"), max($"x").as("x_max"),
        min($"y").as("y_min"), max($"y").as("y_max"))
      .orderBy($"bucket")
  }

  val zorderStatsSql: String =
    """WITH pts AS (
      |  SELECT event_id, ((user_id % 256) + 256) % 256 AS x,
      |    ((CAST(floor(value * 2.56) AS BIGINT) % 256) + 256) % 256 AS y
      |  FROM events),
      |zed AS (
      |  SELECT x, y,
      |    CAST(list_sum(list_transform(range(0, 8), i ->
      |      (((x >> i) % 2) << (i * 2)) + (((y >> i) % 2) << (i * 2 + 1))))
      |      // 4096 AS INT) AS bucket
      |  FROM pts)
      |SELECT bucket, COUNT(*) AS n,
      |  MIN(x) AS x_min, MAX(x) AS x_max,
      |  MIN(y) AS y_min, MAX(y) AS y_max
      |FROM zed GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Data-skipping effectiveness — the payoff [[zorderStats]]'s layout
    * exists for, measured the way a reader experiences it: for each
    * probe predicate, how many FILES' footer min/max ranges intersect
    * it (and must be scanned) under (a) the z-order layout (16 static
    * equal-width z-ranges — each is one 64×64 quadrant of the 8-bit ×
    * 8-bit curve, so every file bounds BOTH dimensions to width 64)
    * versus (b) the classic leading-column layout (file = x div 16 —
    * tight x bounds, y unconstrained). Probes are four width-8 ranges
    * per dimension. Expected shape, and what the gate pins: x-probes
    * scan 1/16 files linear vs 4/16 z (the price), y-probes scan 16/16
    * linear vs 4/16 z (the point) — z trades a constant factor on the
    * leading column for bounded scans on EVERY clustered column, which
    * at 100 TB is the difference between a 6% scan and a full scan for
    * the second predicate. Entirely scan-local (static ranges are the
    * file boundaries — no global sort, no window); the per-file stats
    * aggregate is 32 rows and the probe join is 8×32.
    */
  val zorderSkipping: Q = (s, dir) => {
    import s.implicits._
    val z = expr(
      """aggregate(sequence(0, 7), 0L, (acc, i) -> acc
        |  + shiftleft(shiftright(x, i) % 2, i * 2)
        |  + shiftleft(shiftright(y, i) % 2, i * 2 + 1))""".stripMargin)
    val pts = Tables(s, dir, "events")
      .select(pmod($"user_id".cast("long"), lit(256L)).as("x"),
        pmod(floor($"value" * 2.56).cast("long"), lit(256L)).as("y"))
      .withColumn("z", z)
    val stats = pts
      .select(explode(array(
          struct(lit("zorder").as("layout"), expr("z div 4096").as("file")),
          struct(lit("linear").as("layout"), expr("x div 16").as("file")))).as("f"),
        $"x", $"y")
      .groupBy($"f.layout", $"f.file")
      .agg(min($"x").as("x_min"), max($"x").as("x_max"),
        min($"y").as("y_min"), max($"y").as("y_max"))
    val probes = s.range(4).select(
        explode(array(
          struct(lit("x").as("dim"), ($"id" * 64 + 24).as("lo")),
          struct(lit("y").as("dim"), ($"id" * 64 + 24).as("lo")))).as("p"))
      .select(concat($"p.dim", lit("_"), $"p.lo").as("probe"),
        $"p.dim", $"p.lo", ($"p.lo" + 7).as("hi"))
    // LEFT join so a probe no file intersects still reports (0, 0) —
    // "every file skipped" is the best row in the table, not a dropout
    probes.join(stats,
        when($"dim" === "x", $"x_min" <= $"hi" && $"x_max" >= $"lo")
          .otherwise($"y_min" <= $"hi" && $"y_max" >= $"lo"), "left")
      .groupBy($"probe")
      .agg(count(when($"layout" === "zorder", 1)).as("files_zorder"),
        count(when($"layout" === "linear", 1)).as("files_linear"))
      .orderBy($"probe")
  }

  val zorderSkippingSql: String =
    """WITH pts AS (
      |  SELECT ((user_id % 256) + 256) % 256 AS x,
      |    ((CAST(floor(value * 2.56) AS BIGINT) % 256) + 256) % 256 AS y
      |  FROM events),
      |zed AS (
      |  SELECT x, y,
      |    list_sum(list_transform(range(0, 8), i ->
      |      (((x >> i) % 2) << (i * 2)) + (((y >> i) % 2) << (i * 2 + 1))))
      |      AS z
      |  FROM pts),
      |files AS (
      |  SELECT layout, CASE layout WHEN 'zorder' THEN z // 4096
      |                 ELSE x // 16 END AS file, x, y
      |  FROM zed CROSS JOIN (SELECT unnest(['zorder', 'linear']) AS layout)),
      |stats AS (
      |  SELECT layout, file, MIN(x) AS x_min, MAX(x) AS x_max,
      |    MIN(y) AS y_min, MAX(y) AS y_max
      |  FROM files GROUP BY layout, file),
      |probes AS (
      |  SELECT dim || '_' || CAST(i * 64 + 24 AS VARCHAR) AS probe,
      |    dim, i * 64 + 24 AS lo, i * 64 + 31 AS hi
      |  FROM range(0, 4) t(i)
      |    CROSS JOIN (SELECT unnest(['x', 'y']) AS dim))
      |SELECT probe,
      |  CAST(COUNT(*) FILTER (layout = 'zorder') AS BIGINT) AS files_zorder,
      |  CAST(COUNT(*) FILTER (layout = 'linear') AS BIGINT) AS files_linear
      |FROM probes LEFT JOIN stats
      |  ON CASE WHEN dim = 'x' THEN x_min <= hi AND x_max >= lo
      |          ELSE y_min <= hi AND y_max >= lo END
      |GROUP BY probe ORDER BY probe""".stripMargin

  /** Copy-on-write MERGE with dynamic partition overwrite — incremental
    * table maintenance without a table format: a status-partitioned
    * orders table takes an update batch that touches ONLY the 'F'
    * partition; last-wins merge runs on that partition alone and the
    * dynamic-overwrite write replaces only the partitions present in
    * the written frame — 'O'/'P' files are never rewritten. At 100 TB
    * this is what turns a daily upsert from a full-table rewrite into a
    * touched-partitions job. The gate reads the maintained table back
    * and checks the merged state (untouched partitions intact, updated
    * keys doubled, new keys inserted) against the oracle's relational
    * rendition of the same merge.
    */
  private val mergedTbl = scala.collection.mutable.Map[String, String]()
  private def mergedOrders(s: org.apache.spark.sql.SparkSession,
                           dir: String): String = synchronized {
    mergedTbl.getOrElseUpdate(dir, {
      import s.implicits._
      val path = s"${Scratch.dir}/graft_lake_merge_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
      val base = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", $"o_totalprice", lit("base").as("src"),
          $"o_orderstatus")
      base.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
      val updates = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 3 === 0 && $"o_orderstatus" === "F")
        .select($"o_orderkey", ($"o_totalprice" * 2).as("o_totalprice"),
          lit("update").as("src"), $"o_orderstatus")
      // merge = last-wins over (touched partition ∪ updates), written
      // back under dynamic overwrite: only partition F is replaced
      val touched = s.read.parquet(path).filter($"o_orderstatus" === "F")
      // eager checkpoint: the merged frame reads the very files the
      // write below replaces — materialize first so the plan no longer
      // references the output path (Spark rejects read-write cycles)
      val merged = graft.operators.Upsert.lastWins(
        touched.unionByName(updates)
          .withColumn("seq", when($"src" === "update", 1L).otherwise(0L)),
        Seq("o_orderkey"), col("seq")).drop("seq")
        .localCheckpoint(true)
      graft.Confs.withConf(s,
        "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
        merged.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
      }
      path
    })
  }

  val mergePartition: Q = (s, dir) => {
    import s.implicits._
    s.read.parquet(mergedOrders(s, dir))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        dsum($"o_totalprice").as("total"),
        sum(($"src" === "update").cast("long")).as("n_updated"))
      .orderBy($"o_orderstatus")
  }

  val mergePartitionSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice, 'base' AS src, 0 AS seq
       |  FROM orders WHERE o_orderkey % 2 = 0),
       |upd AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
       |    'update' AS src, 1 AS seq
       |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus = 'F'),
       |fmerged AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY seq DESC) AS rn
       |    FROM (SELECT * FROM base WHERE o_orderstatus = 'F'
       |          UNION ALL SELECT * FROM upd))
       |  WHERE rn = 1),
       |final AS (
       |  SELECT o_orderstatus, o_totalprice, src FROM base
       |  WHERE o_orderstatus <> 'F'
       |  UNION ALL
       |  SELECT o_orderstatus, o_totalprice, src FROM fmerged)
       |SELECT o_orderstatus, COUNT(*) AS n_rows,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  CAST(SUM(CASE WHEN src = 'update' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_updated
       |FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Small-file compaction (operators/Compaction): events lands as a
    * deliberately-fragmented partitioned layout (24 tiny files per
    * event_type — the shape an incremental writer leaves behind), then
    * each partition is compacted to its byte-derived file target. The
    * gate reads the compacted table and checks every row survived
    * against the plain single-file oracle; LayoutSpec asserts the
    * file-count drop and the untouched-partition discipline.
    */
  private val compacted = scala.collection.mutable.Map[String, String]()
  private def compactedEvents(s: org.apache.spark.sql.SparkSession,
                              dir: String): String = synchronized {
    compacted.getOrElseUpdate(dir, {
      val path = s"${Scratch.dir}/graft_lake_compact_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
      Tables(s, dir, "events").repartition(24)
        .write.partitionBy("event_type").mode("overwrite").parquet(path)
      graft.operators.Compaction.compactPartitioned(s, path,
        targetBytes = 256L * 1024 * 1024)
      path
    })
  }

  val compactSmallFiles: Q = (s, dir) => {
    import s.implicits._
    s.read.parquet(compactedEvents(s, dir))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  val compactSmallFilesSql: String =
    s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time travel (operators/Snapshots): the same base/merge as
    * [[mergePartition]], but run as three manifest-published versions of
    * one table — v1 initial load, v2 the F-partition merge carrying the
    * untouched partitions' files forward, v3 a whole-table compaction
    * commit. The gate reads ALL THREE versions after everything has
    * committed: v1 must still show the pre-merge state (the snapshot a
    * yesterday's-report reader pinned), v2 the merged state, and v3 the
    * identical merged state through compacted files — the
    * rewrite-invariance + isolation contract a table format sells.
    * LayoutSpec additionally asserts the file-level mechanics (old
    * manifests' files survive on disk, compaction shrinks the live set).
    */
  private val snapTbl = scala.collection.mutable.Map[String, String]()
  private def snapshotOrders(s: org.apache.spark.sql.SparkSession,
                             dir: String): String = synchronized {
    snapTbl.getOrElseUpdate(dir, {
      import s.implicits._
      val root = s"${Scratch.dir}/graft_lake_snap_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
      val base = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", $"o_totalprice", lit("base").as("src"),
          $"o_orderstatus")
        .repartition($"o_orderstatus")
      operators.Snapshots.commit(s, root, base, "o_orderstatus")
      val updates = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 3 === 0 && $"o_orderstatus" === "F")
        .select($"o_orderkey", ($"o_totalprice" * 2).as("o_totalprice"),
          lit("update").as("src"), $"o_orderstatus")
      // the merge reads v1's files and writes a NEW commit dir, so no
      // read-write cycle exists and no checkpoint is needed (contrast
      // mergedOrders, which overwrites in place)
      val touched = operators.Snapshots.read(s, root, 1)
        .filter($"o_orderstatus" === "F")
      val merged = operators.Upsert.lastWins(
        touched.unionByName(updates)
          .withColumn("seq", when($"src" === "update", 1L).otherwise(0L)),
        Seq("o_orderkey"), col("seq")).drop("seq")
        .repartition($"o_orderstatus")
      operators.Snapshots.commit(s, root, merged, "o_orderstatus",
        carry = !_.contains("o_orderstatus=F/"))
      operators.Snapshots.compactCommit(s, root, "o_orderstatus")
      root
    })
  }

  val snapshotRead: Q = (s, dir) => {
    import s.implicits._
    val root = snapshotOrders(s, dir)
    def stateAt(v: Int) = operators.Snapshots.read(s, root, v)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"), dsum($"o_totalprice").as("total"),
        sum(($"src" === "update").cast("long")).as("n_updated"))
      .withColumn("version", lit(v))
    (1 to 3).map(stateAt).reduce(_ unionByName _)
      .select($"version", $"o_orderstatus", $"n_rows", $"total", $"n_updated")
      .orderBy($"version", $"o_orderstatus")
  }

  val snapshotReadSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice, 'base' AS src, 0 AS seq
       |  FROM orders WHERE o_orderkey % 2 = 0),
       |upd AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
       |    'update' AS src, 1 AS seq
       |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus = 'F'),
       |fmerged AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY seq DESC) AS rn
       |    FROM (SELECT * FROM base WHERE o_orderstatus = 'F'
       |          UNION ALL SELECT * FROM upd))
       |  WHERE rn = 1),
       |v2 AS (
       |  SELECT o_orderstatus, o_totalprice, src FROM base
       |  WHERE o_orderstatus <> 'F'
       |  UNION ALL
       |  SELECT o_orderstatus, o_totalprice, src FROM fmerged),
       |states AS (
       |  SELECT 1 AS version, o_orderstatus, o_totalprice, src FROM base
       |  UNION ALL SELECT 2, o_orderstatus, o_totalprice, src FROM v2
       |  UNION ALL SELECT 3, o_orderstatus, o_totalprice, src FROM v2)
       |SELECT version, o_orderstatus, COUNT(*) AS n_rows,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  CAST(SUM(CASE WHEN src = 'update' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_updated
       |FROM states GROUP BY version, o_orderstatus
       |ORDER BY version, o_orderstatus""".stripMargin

  /** CDC-style incremental read off the snapshot store: the row-level
    * diff between two committed versions — what a downstream consumer
    * pulls instead of re-reading the table. Updates are keys live in
    * both versions with a changed price (the merged F rows that were in
    * the base); inserts are update-batch keys the base never had (odd
    * multiples of 3 with status F — the merge's last-wins union admits
    * them). This merge deletes nothing, so the diff is exactly
    * insert ∪ update; raw doubles pass through both engines untouched
    * (no aggregation → no decimal detour needed).
    */
  val snapshotDiff: Q = (s, dir) => {
    import s.implicits._
    val root = snapshotOrders(s, dir)
    val v1 = operators.Snapshots.read(s, root, 1)
      .select($"o_orderkey", $"o_totalprice".as("old_price"))
    val v2 = operators.Snapshots.read(s, root, 2)
      .select($"o_orderkey", $"o_totalprice".as("new_price"))
    v2.join(v1, Seq("o_orderkey"), "left")
      .filter($"old_price".isNull || $"old_price" =!= $"new_price")
      .select($"o_orderkey",
        when($"old_price".isNull, "insert").otherwise("update")
          .as("change_type"),
        $"old_price", $"new_price")
      .orderBy($"o_orderkey")
  }

  val snapshotDiffSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
       |upd AS (
       |  SELECT o_orderkey, o_totalprice * 2 AS new_price
       |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus = 'F')
       |SELECT u.o_orderkey,
       |  CASE WHEN b.o_orderkey IS NULL THEN 'insert' ELSE 'update' END
       |    AS change_type,
       |  b.o_totalprice AS old_price, u.new_price
       |FROM upd u LEFT JOIN base b ON u.o_orderkey = b.o_orderkey
       |ORDER BY u.o_orderkey""".stripMargin

  /** Schema EVOLUTION across snapshots: v1 commits the table without
    * any classification column; v2's partition-scoped merge writes the
    * F partition WITH a new `priority_class` column while carrying the
    * other partitions' files — which lack the column — forward
    * untouched. The contract gated here is the add-column evolution
    * every table format sells: v1 stays readable exactly as written
    * (no phantom column — the gate pads it with NULL itself and
    * `n_classified` must be 0 everywhere), and the v2 read null-fills
    * the column for every carried file (classified rows appear ONLY in
    * the rewritten F partition). The mechanics live in
    * [[operators.Snapshots.read]]'s `allowMissingColumns` union — at
    * 1000 executors this is metadata-only schema reconciliation, no
    * data rewrite of old files ever happens.
    */
  private val evoTbl = scala.collection.mutable.Map[String, String]()
  private def evoOrders(s: org.apache.spark.sql.SparkSession,
                        dir: String): String = synchronized {
    evoTbl.getOrElseUpdate(dir, {
      import s.implicits._
      val root = s"${Scratch.dir}/graft_lake_evo_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
      val base = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        .repartition($"o_orderstatus")
      operators.Snapshots.commit(s, root, base, "o_orderstatus")
      val updates = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 3 === 0 && $"o_orderstatus" === "F")
        .select($"o_orderkey", ($"o_totalprice" * 2).as("o_totalprice"),
          $"o_orderstatus")
      val merged = operators.Upsert.lastWins(
        operators.Snapshots.read(s, root, 1)
          .filter($"o_orderstatus" === "F").withColumn("seq", lit(0L))
          .unionByName(updates.withColumn("seq", lit(1L))),
        Seq("o_orderkey"), col("seq")).drop("seq")
        // the evolved column, computed for every row the merge rewrites
        .withColumn("priority_class",
          when($"o_orderkey" % 4 === 0, "high").otherwise("std"))
        .repartition($"o_orderstatus")
      operators.Snapshots.commit(s, root, merged, "o_orderstatus",
        carry = !_.contains("o_orderstatus=F/"))
      root
    })
  }

  val schemaEvolution: Q = (s, dir) => {
    import s.implicits._
    val root = evoOrders(s, dir)
    def stateAt(v: Int) = {
      val raw = operators.Snapshots.read(s, root, v)
      // v1 predates the column: the READ must not invent it (that is
      // the assertion) — the gate pads it so both versions aggregate
      // through one shape, and n_classified pins where values exist
      val df =
        if (raw.columns.contains("priority_class")) raw
        else raw.withColumn("priority_class", lit(null).cast("string"))
      df.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          count($"priority_class").as("n_classified"),
          sum(($"priority_class" === "high").cast("long")).as("n_high"),
          dsum($"o_totalprice").as("total"))
        .withColumn("version", lit(v))
    }
    stateAt(1).unionByName(stateAt(2))
      .select($"version", $"o_orderstatus", $"n_rows", $"n_classified",
        coalesce($"n_high", lit(0L)).as("n_high"), $"total")
      .orderBy($"version", $"o_orderstatus")
  }

  val schemaEvolutionSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice
       |  FROM orders WHERE o_orderkey % 2 = 0),
       |upd AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
       |    1 AS seq
       |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus = 'F'),
       |fmerged AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice,
       |    CASE WHEN o_orderkey % 4 = 0 THEN 'high' ELSE 'std' END AS pc
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY seq DESC) AS rn
       |    FROM (SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS seq
       |          FROM base WHERE o_orderstatus = 'F'
       |          UNION ALL SELECT * FROM upd))
       |  WHERE rn = 1),
       |states AS (
       |  SELECT 1 AS version, o_orderstatus, o_totalprice,
       |    CAST(NULL AS VARCHAR) AS pc FROM base
       |  UNION ALL
       |  SELECT 2, o_orderstatus, o_totalprice, CAST(NULL AS VARCHAR)
       |  FROM base WHERE o_orderstatus <> 'F'
       |  UNION ALL
       |  SELECT 2, o_orderstatus, o_totalprice, pc FROM fmerged)
       |SELECT version, o_orderstatus, COUNT(*) AS n_rows,
       |  COUNT(pc) AS n_classified,
       |  CAST(SUM(CASE WHEN pc = 'high' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_high,
       |  ${sqlDsum("o_totalprice")} AS total
       |FROM states GROUP BY version, o_orderstatus
       |ORDER BY version, o_orderstatus""".stripMargin

  /** Per-file BLOOM index + point-lookup file skipping — the data-
    * skipping layer BEYOND min/max footer stats (which cannot prune
    * point lookups on a high-cardinality key scattered across every
    * file): each file of a 16-way hash layout carries a sidecar bloom
    * bitset over its keys (M = 65536 positions — the raw 16-bit md5
    * prefix, no modulo bias — k = 3 salted hashes), and a point lookup
    * consults ONLY the manifest to pick candidate files, then reads
    * just those partition directories (dynamic pruning off the
    * file-backed candidate table, the `lake_dpp_join` mechanism).
    *
    * The gate probes 5 present and 5 absent keys and reports, per
    * (probe, candidate file), the manifest fill and the EXACT hit count
    * from the pruned read: present keys must surface their home file
    * with hits=1 (blooms cannot false-negative — the md5 bit positions
    * are deterministic), absent keys appear only on false-positive
    * files with hits=0 (fill at the gate corpus: ~3·n/16/65536 ≈ 3% at
    * sf0.1 → fp ≈ 2e-5). At 100 TB the manifest is rows ∝ files and
    * the lookup reads 1 file instead of all of them — the skipping is
    * in the PLAN (PlanSpec pins the dynamicpruning subquery), not a
    * post-hoc filter.
    */
  private def bloomBits(key: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    array((0 until 3).map(i =>
      graft.functions.KeyHash.bucket(s"$i|blf|", key, 65536).cast("int")): _*)

  private val bloomTbl = scala.collection.mutable.Map[String, (String, String)]()
  private def bloomLayout(s: org.apache.spark.sql.SparkSession,
                          dir: String): (String, String) = synchronized {
    bloomTbl.getOrElseUpdate(dir, {
      import s.implicits._
      val dirKey = dir.replaceAll("[^A-Za-z0-9]", "_")
      val lay = s"${Scratch.dir}/graft_bloom_lay_${dirKey}_${Scratch.runToken}"
      val man = s"${Scratch.dir}/graft_bloom_man_${dirKey}_${Scratch.runToken}"
      val ev = Tables(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value")
        .withColumn("fid",
          graft.functions.KeyHash.bucket("blf|", $"event_id", 16).cast("int"))
      ev.write.partitionBy("fid").mode("overwrite").parquet(lay)
      // sidecar manifest: one row per file, the distinct bit positions
      // its keys set — built in the same pass shape a writer would use
      // (scan-local bit hashing, one shuffle on fid)
      ev.select($"fid", explode(bloomBits($"event_id")).as("bit"))
        .groupBy($"fid")
        .agg(array_sort(collect_set($"bit")).as("bits"))
        .write.mode("overwrite").parquet(man)
      (lay, man)
    })
  }

  val bloomIndex: Q = (s, dir) => {
    import s.implicits._
    val (lay, man) = bloomLayout(s, dir)
    val probes = Seq(1L, 2L, 3L, 5L, 8L,
      1000000001L, 1000000002L, 1000000003L, 1000000004L, 1000000005L)
      .toDF("probe_key")
    val manifest = s.read.schema("fid INT, bits ARRAY<INT>").parquet(man)
    // manifest-only candidate selection (16 × 10 rows — no data read);
    // candidates are materialized file-backed WITH the flag so the
    // pruned read below has a selective predicate DPP can derive its
    // partition list from (a local relation would constant-fold away)
    val base = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
    val candPath = s"${Scratch.dir}/graft_bloom_cand_$base"
    val fidPath = s"${Scratch.dir}/graft_bloom_fids_$base"
    manifest.crossJoin(broadcast(probes))
      .withColumn("p", bloomBits($"probe_key"))
      .withColumn("cand",
        (0 until 3).map(i => array_contains($"bits", element_at($"p", i + 1)))
          .reduce(_ && _))
      .select($"probe_key", $"fid", size($"bits").as("n_bits"), $"cand")
      .write.mode("overwrite").parquet(candPath)
    val candF = s.read
      .schema("probe_key BIGINT, fid INT, n_bits INT, cand BOOLEAN")
      .parquet(candPath).filter($"cand")
    // the candidate-FID routing table gets its own file-backed sidecar
    // with an INT selectivity flag compared against a literal: DPP
    // requires a LIKELY-SELECTIVE predicate (a comparison — a bare
    // boolean attribute does not qualify) directly above a file scan on
    // the single-key side; an aggregate like distinct() in between
    // defeats the detection too
    candF.select($"fid").distinct().withColumn("sel", lit(1))
      .write.mode("overwrite").parquet(fidPath)
    val routing = s.read.schema("fid INT, sel INT")
      .parquet(fidPath).filter($"sel" === 1)
    // the pruned read: only candidate files' directories are scanned
    val hits = s.read.parquet(lay)
      .join(broadcast(routing.select($"fid")), Seq("fid"))
      .join(broadcast(candF.select($"probe_key", $"fid")), Seq("fid"))
      .where($"event_id" === $"probe_key")
      .groupBy($"probe_key", $"fid")
      .agg(count(lit(1)).as("hits"))
    candF.select($"probe_key", $"fid", $"n_bits")
      .join(hits, Seq("probe_key", "fid"), "left")
      .select($"probe_key", $"fid", $"n_bits",
        coalesce($"hits", lit(0L)).as("hits"))
      .orderBy($"probe_key", $"fid")
  }

  val bloomIndexSql: String = {
    import graft.functions.KeyHash.sqlBucket
    def pb(i: Int, k: String) = sqlBucket(s"$i|blf|", k, 65536)
    s"""WITH ev AS (
       |  SELECT event_id, ${sqlBucket("blf|", "event_id", 16)} AS fid
       |  FROM events),
       |keybits AS (
       |  SELECT fid, unnest([${pb(0, "event_id")}, ${pb(1, "event_id")},
       |    ${pb(2, "event_id")}]) AS bit
       |  FROM ev),
       |bloom AS (
       |  SELECT fid, list_sort(list_distinct(list(bit))) AS bits
       |  FROM keybits GROUP BY fid),
       |probes AS (
       |  SELECT CAST(unnest([1, 2, 3, 5, 8, 1000000001, 1000000002,
       |    1000000003, 1000000004, 1000000005]) AS BIGINT) AS probe_key),
       |cand AS (
       |  SELECT p.probe_key, b.fid, len(b.bits) AS n_bits
       |  FROM probes p CROSS JOIN bloom b
       |  WHERE list_contains(b.bits, ${pb(0, "p.probe_key")})
       |    AND list_contains(b.bits, ${pb(1, "p.probe_key")})
       |    AND list_contains(b.bits, ${pb(2, "p.probe_key")})),
       |h AS (
       |  SELECT e.event_id AS probe_key, e.fid, COUNT(*) AS hits
       |  FROM ev e JOIN probes p ON e.event_id = p.probe_key
       |  GROUP BY e.event_id, e.fid)
       |SELECT c.probe_key, c.fid, CAST(c.n_bits AS INT) AS n_bits,
       |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits
       |FROM cand c LEFT JOIN h ON c.probe_key = h.probe_key AND c.fid = h.fid
       |ORDER BY c.probe_key, c.fid""".stripMargin
  }

  private val vacInvocation = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Retention under the gate — the vacuum step every time-traveling
    * table format pairs with copy-on-write merges: build the three-
    * version merge history ([[graft.streaming.StreamQueries]]'s lake
    * gate shape: base load, F-partition merge, all-partition merge),
    * then expire everything below version 2. The gate asserts the three
    * halves of the retention contract in one run: (a) files referenced
    * ONLY by expired versions are physically deleted (v1's rewritten F
    * partition — `deleted > 0`); (b) files an expired version SHARES
    * with a retained one survive (v2 still carries v1's non-F
    * partitions — their rows hash below); (c) time travel below the
    * floor fails LOUDLY (the expired manifest is dropped), never reads
    * a partial file set. Output = the retained versions' per-partition
    * states, byte-stable across the delete; the oracle replays the
    * merge history and knows nothing about files — exactly the point.
    */
  /** One merge commit of the vacuum fixture: read the touched
    * partitions of the latest version, last-wins upsert the batch,
    * commit clustered by partition value (carrying untouched
    * partitions forward by reference).
    */
  private[graft] def vacuumMergeIn(s: org.apache.spark.sql.SparkSession, root: String,
      batch: org.apache.spark.sql.DataFrame): Unit = {
    import s.implicits._
    val touched = batch.select($"o_orderstatus").distinct()
      .collect().map(_.getString(0)).toSet
    val latest = operators.Snapshots.latestVersion(root)
    val live = operators.Snapshots.read(s, root, latest)
      .filter($"o_orderstatus".isin(touched.toSeq: _*))
    val merged = operators.Upsert.lastWins(
      live.unionByName(batch), Seq("o_orderkey"), col("seq"))
      .repartition($"o_orderstatus")
    operators.Snapshots.commit(s, root, merged, "o_orderstatus",
      carry = rel => !touched.exists(v => rel.contains(s"o_orderstatus=$v/")))
  }

  /** Build the three-version merge history at `root`: base load (even
    * keys), F-partition merge (u1), all-partition merge (u2). Pure
    * function of the read-only corpus — the vacuum gate copies a
    * memoized build instead of re-committing per invocation.
    */
  private[graft] def vacuumBuildFixture(s: org.apache.spark.sql.SparkSession, dir: String,
      root: String): Unit = {
    import s.implicits._
    val orders = Tables(s, dir, "orders")
    // cluster each status into one write task before every commit (the
    // lake_partition_evolution r13 fix: an unclustered partitionBy write
    // emits tasks×values small files, and every later snapshot read +
    // the vacuum walk pays the file count back)
    val base = orders.filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", $"o_totalprice", lit("base").as("src"),
        lit(0L).as("seq"), $"o_orderstatus")
      .repartition($"o_orderstatus")
    operators.Snapshots.commit(s, root, base, "o_orderstatus")
    val u1 = orders.filter($"o_orderkey" % 3 === 0 && $"o_orderstatus" === "F")
      .select($"o_orderkey", ($"o_totalprice" * 2).as("o_totalprice"),
        lit("u1").as("src"), lit(1L).as("seq"), $"o_orderstatus")
    val u2 = orders.filter($"o_orderkey" % 5 === 0)
      .select($"o_orderkey", ($"o_totalprice" * 3).as("o_totalprice"),
        lit("u2").as("src"), lit(2L).as("seq"), $"o_orderstatus")
    vacuumMergeIn(s, root, u1)
    vacuumMergeIn(s, root, u2)
  }

  private val lakeBaseFixturePaths = new graft.KeyedMemo[String]

  /** The v1 base commit (even orderkeys, 3 columns, status-partitioned)
    * that [[deleteKeys]], [[deletionVectors]] and [[partitionEvolution]]
    * each rebuilt per invocation — r17: built ONCE per (JVM, dir) as a
    * relocation-safe fixture (Snapshots manifests store relative paths)
    * and [[Scratch.copyTree]]-copied per invocation, the r15 vacuum
    * discipline. Billed to bench warm-up (`lake_base_fixture`).
    */
  private[graft] def lakeBaseFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    lakeBaseFixturePaths.getOrBuild(dir) {
      ArtifactCache.publishStaged("lakev1", dir, Seq("orders")) {
        import s.implicits._
        val root = s"${Scratch.dir}/graft_lake_v1fix_" +
          dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
        val base = Tables(s, dir, "orders").filter($"o_orderkey" % 2 === 0)
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          .repartition($"o_orderstatus")
        operators.Snapshots.commit(s, root, base, "o_orderstatus")
        root
      }
    }

  /** A throwaway copy of [[lakeBaseFixture]] under a fresh
    * per-invocation root (the gates MUTATE the tree with further
    * commits/sidecars).
    */
  private def lakeBaseCopy(s: org.apache.spark.sql.SparkSession,
      dir: String, tag: String): String = {
    val root = s"${Scratch.dir}/graft_lake_${tag}_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken + "_" +
      vacInvocation.incrementAndGet()
    Scratch.copyTree(java.nio.file.Paths.get(lakeBaseFixture(s, dir)),
      java.nio.file.Paths.get(root))
    root
  }

  private val vacFixturePaths = new graft.KeyedMemo[String]

  /** The memoized pre-vacuum fixture path — exposed so the bench
    * warm-up can bill the three-commit build explicitly (the codebook
    * treatment) instead of the first gate invocation paying it.
    */
  private[graft] def vacuumFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    vacFixturePaths.getOrBuild(dir) {
      // Snapshots manifests store RELATIVE paths (r15), so the fixture
      // tree is relocation-safe and can live in the cross-JVM cache
      ArtifactCache.publishStaged("vacfix", dir, Seq("orders")) {
        val base = s"${Scratch.dir}/graft_lake_vacfix_" +
          dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken
        vacuumBuildFixture(s, dir, base)
        base
      }
    }

  val vacuumRetention: Q = (s, dir) => {
    import s.implicits._
    val fixture = vacuumFixture(s, dir)
    val root = s"${Scratch.dir}/graft_lake_vac_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + Scratch.runToken + "_" +
      vacInvocation.incrementAndGet()
    Scratch.copyTree(java.nio.file.Paths.get(fixture), java.nio.file.Paths.get(root))
    val (deleted, _) = operators.Snapshots.vacuum(root, retainFrom = 2)
    require(deleted > 0,
      "vacuum must delete the files only expired versions referenced")
    val v1Gone =
      try { operators.Snapshots.read(s, root, 1).count(); false }
      catch { case _: Exception => true }
    require(v1Gone,
      "time travel below the retention floor must fail loudly, not read a partial set")
    def stateAt(v: Int) = operators.Snapshots.read(s, root, v)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"), dsum($"o_totalprice").as("total"),
        sum(($"src" === "u1").cast("long")).as("n_u1"),
        sum(($"src" === "u2").cast("long")).as("n_u2"))
      .withColumn("version", lit(v))
    (2 to 3).map(stateAt).reduce(_ unionByName _)
      .select($"version", $"o_orderstatus", $"n_rows", $"total",
        $"n_u1", $"n_u2")
      .orderBy($"version", $"o_orderstatus")
  }

  val vacuumRetentionSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice, 'base' AS src, 0 AS seq
       |  FROM orders WHERE o_orderkey % 2 = 0),
       |u1 AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
       |    'u1' AS src, 1 AS seq
       |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus = 'F'),
       |u2 AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice * 3 AS o_totalprice,
       |    'u2' AS src, 2 AS seq
       |  FROM orders WHERE o_orderkey % 5 = 0),
       |v2 AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice, src, seq FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY seq DESC) AS rn
       |    FROM (SELECT * FROM base UNION ALL SELECT * FROM u1))
       |  WHERE rn = 1),
       |v3 AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice, src, seq FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY seq DESC) AS rn
       |    FROM (SELECT * FROM v2 UNION ALL SELECT * FROM u2))
       |  WHERE rn = 1),
       |states AS (
       |  SELECT 2 AS version, o_orderstatus, o_totalprice, src FROM v2
       |  UNION ALL SELECT 3, o_orderstatus, o_totalprice, src FROM v3)
       |SELECT version, o_orderstatus, COUNT(*) AS n_rows,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  CAST(SUM(CASE WHEN src = 'u1' THEN 1 ELSE 0 END) AS BIGINT) AS n_u1,
       |  CAST(SUM(CASE WHEN src = 'u2' THEN 1 ELSE 0 END) AS BIGINT) AS n_u2
       |FROM states GROUP BY version, o_orderstatus
       |ORDER BY version, o_orderstatus""".stripMargin

  /** Copy-on-write DELETE on the snapshot store — the remaining CRUD
    * verb beside the merge/compaction/vacuum gates (Delta's `DELETE
    * FROM`): drop every 6th orderkey from the F partition as a new
    * commit that rewrites ONLY the touched partition and carries the
    * rest forward. The gate reads both versions: v2's F partition no
    * longer holds the keys, its other partitions are byte-identical
    * carried files, and v1 still returns the deleted rows — deletion
    * is a new version, not an erasure (the erasure path is
    * [[vacuumRetention]] once v1 expires — together they are the
    * delete-then-forget compliance recipe).
    */
  val deleteKeys: Q = (s, dir) => {
    import s.implicits._
    val root = lakeBaseCopy(s, dir, "del")
    val keptF = operators.Snapshots.read(s, root, 1)
      .filter($"o_orderstatus" === "F" && $"o_orderkey" % 6 =!= 0)
      .repartition($"o_orderstatus")
    operators.Snapshots.commit(s, root, keptF, "o_orderstatus",
      carry = rel => !rel.contains("o_orderstatus=F/"))
    def stateAt(v: Int) = operators.Snapshots.read(s, root, v)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"), dsum($"o_totalprice").as("total"),
        sum(($"o_orderkey" % 6 === 0).cast("long")).as("n_del_keys"))
      .withColumn("version", lit(v))
    (1 to 2).map(stateAt).reduce(_ unionByName _)
      .select($"version", $"o_orderstatus", $"n_rows", $"total", $"n_del_keys")
      .orderBy($"version", $"o_orderstatus")
  }

  val deleteKeysSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice
       |  FROM orders WHERE o_orderkey % 2 = 0),
       |v2 AS (
       |  SELECT * FROM base
       |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 6 = 0)),
       |states AS (
       |  SELECT 1 AS version, o_orderstatus, o_totalprice, o_orderkey FROM base
       |  UNION ALL SELECT 2, o_orderstatus, o_totalprice, o_orderkey FROM v2)
       |SELECT version, o_orderstatus, COUNT(*) AS n_rows,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  CAST(SUM(CASE WHEN o_orderkey % 6 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_del_keys
       |FROM states GROUP BY version, o_orderstatus
       |ORDER BY version, o_orderstatus""".stripMargin

  /** Merge-on-read DELETE via a deletion vector — the modern
    * row-level-delete path (Delta deletion vectors / Iceberg position
    * deletes) beside [[deleteKeys]]'s copy-on-write: the delete writes
    * ONLY a tiny sidecar listing the dead keys (O(deleted) bytes, no
    * data-file rewrite — at 100 TB that is the difference between a
    * kilobyte DV write and rewriting a multi-GB partition), and every
    * read anti-joins the scan against the broadcast DV. Compaction
    * later applies the DV physically (rewrites the touched partition
    * minus the dead keys) and retires it — after which the plain scan
    * and the DV-masked scan must agree.
    *
    * The gate reads all three states: `raw` (v1, DV ignored — the
    * before-image time travel still serves), `dv_applied` (v1 ⋉ DV,
    * the merge-on-read view every query sees after the delete), and
    * `compacted` (v2, DV folded into the files) — with the dead-key
    * count per state proving the mask: present in raw, zero in the
    * other two, totals identical between dv_applied and compacted.
    *
    * Scale shape: the DV is keyed and broadcast (production DVs are
    * per-file bitmaps — same read-side contract: a scan-local mask,
    * never a shuffle); compaction rewrites only the touched partition
    * and carries the rest (the [[operators.Snapshots]] manifest carry).
    */
  val deletionVectors: Q = (s, dir) => {
    import s.implicits._
    val root = lakeBaseCopy(s, dir, "dv")
    val v1 = operators.Snapshots.read(s, root, 1)
    // the DELETE: write the deletion vector sidecar, touch no data file
    val dvPath = root + "/_dv/v00001"
    v1.filter($"o_orderstatus" === "F" && $"o_orderkey" % 6 === 0)
      .select($"o_orderkey").write.mode("overwrite").parquet(dvPath)
    val dv = s.read.parquet(dvPath)
    val masked = v1.join(broadcast(dv), Seq("o_orderkey"), "left_anti")
    // compaction applies the DV: rewrite ONLY the F partition minus the
    // dead keys, carry every other partition's files forward
    operators.Snapshots.commit(s, root,
      masked.filter($"o_orderstatus" === "F").repartition($"o_orderstatus"),
      "o_orderstatus",
      carry = rel => !rel.contains("o_orderstatus=F/"))
    val v2 = operators.Snapshots.read(s, root, 2)
    def summarize(df: org.apache.spark.sql.DataFrame, st: String) =
      df.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum($"o_totalprice").as("total"),
          sum(($"o_orderstatus" === "F" && $"o_orderkey" % 6 === 0)
            .cast("long")).as("n_dv_keys"))
        .withColumn("state", lit(st))
    summarize(v1, "raw")
      .unionByName(summarize(masked, "dv_applied"))
      .unionByName(summarize(v2, "compacted"))
      .select($"state", $"o_orderstatus", $"n_rows", $"total", $"n_dv_keys")
      .orderBy($"state", $"o_orderstatus")
  }

  val deletionVectorsSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice
       |  FROM orders WHERE o_orderkey % 2 = 0),
       |masked AS (
       |  SELECT * FROM base
       |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 6 = 0)),
       |states AS (
       |  SELECT 'raw' AS state, o_orderkey, o_orderstatus, o_totalprice
       |  FROM base
       |  UNION ALL SELECT 'dv_applied', o_orderkey, o_orderstatus,
       |    o_totalprice FROM masked
       |  UNION ALL SELECT 'compacted', o_orderkey, o_orderstatus,
       |    o_totalprice FROM masked)
       |SELECT state, o_orderstatus, COUNT(*) AS n_rows,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 6 = 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dv_keys
       |FROM states GROUP BY state, o_orderstatus
       |ORDER BY state, o_orderstatus""".stripMargin

  /** Partition-spec EVOLUTION — the Iceberg capability that separates a
    * table's logical identity from its physical layout: v1 lands
    * partitioned by `o_orderstatus`, the table's partitioning is then
    * changed, and v2's delta commit writes under the NEW spec
    * (`o_month` from the order date) while carrying every v1 file
    * untouched — old data is NEVER rewritten to the new layout (the
    * whole point: at 100 TB a re-partition rewrite is a multi-day job;
    * spec evolution makes it a metadata change). One read then spans
    * both layouts: each commit dir parses its own hive partition column
    * from its paths and the union null-fills the column the other
    * layout doesn't carry ([[operators.Snapshots.read]]'s
    * commit-granular schema reconciliation).
    *
    * The gate reports per (layout, o_orderstatus): row counts, totals,
    * and the month span — proving v1 rows surface with a null month
    * (their layout never had it), v2 rows carry their month from the
    * path, and the logical table is exactly the union.
    */
  val partitionEvolution: Q = (s, dir) => {
    import s.implicits._
    val root = lakeBaseCopy(s, dir, "pe")
    // the spec change: the delta batch lands month-partitioned;
    // o_orderstatus rides as a DATA column in the new-layout files.
    // The delta is RECENT data (the final order year) — that is what a
    // post-spec-change batch is; a delta spanning the full 6.5-year
    // history would write ~80 month dirs (measured 1.6 s of pure
    // dynamic-partition commit machinery at sf0.1) and misrepresent
    // the operation. Cluster by the NEW partition column before the
    // write (the compactCommit discipline: one file per month).
    val delta = Tables(s, dir, "orders")
      .filter($"o_orderkey" % 2 === 1 && year($"o_orderdate") === 1998)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus",
        expr("(year(o_orderdate) * 100 + month(o_orderdate))")
          .as("o_month"))
      .repartition($"o_month")
    operators.Snapshots.commit(s, root, delta, "o_month",
      carry = _ => true)
    operators.Snapshots.read(s, root, 2)
      .groupBy($"o_orderstatus",
        when($"o_month".isNull, "status_layout").otherwise("month_layout")
          .as("layout"))
      .agg(count(lit(1)).as("n_rows"), dsum($"o_totalprice").as("total"),
        min($"o_month").as("month_lo"), max($"o_month").as("month_hi"))
      .select($"layout", $"o_orderstatus", $"n_rows", $"total",
        $"month_lo", $"month_hi")
      .orderBy($"layout", $"o_orderstatus")
  }

  val partitionEvolutionSql: String =
    s"""WITH both_layouts AS (
       |  SELECT o_orderstatus, o_totalprice,
       |    CAST(NULL AS INTEGER) AS o_month
       |  FROM orders WHERE o_orderkey % 2 = 0
       |  UNION ALL
       |  SELECT o_orderstatus, o_totalprice,
       |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER)
       |  FROM orders
       |  WHERE o_orderkey % 2 = 1 AND year(o_orderdate) = 1998)
       |SELECT CASE WHEN o_month IS NULL THEN 'status_layout'
       |            ELSE 'month_layout' END AS layout,
       |  o_orderstatus, COUNT(*) AS n_rows,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  MIN(o_month) AS month_lo, MAX(o_month) AS month_hi
       |FROM both_layouts GROUP BY 1, 2 ORDER BY layout, o_orderstatus""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "lake_partition_evolution" ->
      (partitionEvolution, Some(partitionEvolutionSql)),
    "lake_deletion_vectors" -> (deletionVectors, Some(deletionVectorsSql)),
    "lake_delete_keys" -> (deleteKeys, Some(deleteKeysSql)),
    "lake_vacuum_retention" -> (vacuumRetention, Some(vacuumRetentionSql)),
    "lake_bloom_index" -> (bloomIndex, Some(bloomIndexSql)),
    "lake_schema_evolution" -> (schemaEvolution, Some(schemaEvolutionSql)),
    "lake_snapshot_diff" -> (snapshotDiff, Some(snapshotDiffSql)),
    "lake_snapshot_read" -> (snapshotRead, Some(snapshotReadSql)),
    "lake_compact_small_files" -> (compactSmallFiles, Some(compactSmallFilesSql)),
    "lake_pruned_scan" -> (prunedScan, Some(prunedScanSql)),
    "lake_dpp_join" -> (dppJoin, Some(dppJoinSql)),
    "lake_zorder_stats" -> (zorderStats, Some(zorderStatsSql)),
    "lake_zorder_skipping" -> (zorderSkipping, Some(zorderSkippingSql)),
    "lake_merge_partition" -> (mergePartition, Some(mergePartitionSql)))
}
