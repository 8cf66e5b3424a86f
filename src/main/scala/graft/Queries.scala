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

  /** Media featurization summary. The JVM decode path (`javax.imageio`) is
    * exercised in MultimodalSpec against real PNG bytes; on the synthetic
    * corpus every payload falls through to the deterministic fallback
    * raster `pixel(i) = byte(i mod len)` over per-id LCG bytes — pure
    * integer arithmetic, and therefore fully DuckDB-expressible (the
    * oracle below reproduces the LCG, the nearest-neighbour 16×16 resize,
    * the 16-bin histogram, and the float32 embedding head bit-for-bit).
    */
  val multimodalPipeline: Q =
    (s, _) => graft.multimodal.Multimodal.pipelineSummary(s, 200)

  /** DuckDB mirror of [[multimodalPipeline]] on the synthetic corpus.
    *
    * 64-bit LCG state is carried as a non-negative HUGEINT mod 2^64
    * (DuckDB BIGINT traps on overflow; Scala Long wraps). The worst-case
    * intermediate `s * A` is < 2^64 * 2^63 < 2^127, inside HUGEINT range.
    * `s >>> 56` becomes integer division by 2^56. Resize indexing matches
    * `Multimodal.Codecs.resize` exactly: small(y,x) = px((y*h/16)*w + x*w/16)
    * with integer division, and px(p) = byte(p mod len).
    */
  val multimodalPipelineSql: String =
    """WITH RECURSIVE ids AS (
      |  SELECT range::BIGINT AS id FROM range(200)
      |),
      |lcg AS (
      |  SELECT id, 0 AS i,
      |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
      |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
      |         (256 + id % 512) AS len
      |  FROM ids
      |  UNION ALL
      |  SELECT id, i + 1,
      |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
      |         len
      |  FROM lcg WHERE i < len - 1
      |),
      |small AS (
      |  SELECT i.id,
      |         ((p.range // 16) * (32 + i.id % 16) // 16) * (32 + i.id % 32)
      |           + (p.range % 16) * (32 + i.id % 32) // 16 AS big_idx,
      |         (256 + i.id % 512) AS len
      |  FROM ids i, range(256) p
      |),
      |vals AS (
      |  SELECT sm.id, (l.s // 72057594037927936)::INT AS b
      |  FROM small sm JOIN lcg l ON l.id = sm.id AND l.i = sm.big_idx % sm.len
      |),
      |agg AS (
      |  SELECT id, CAST(SUM(b) AS BIGINT) AS ssum,
      |         md5(array_to_string(list_value(
      |           COUNT(*) FILTER (WHERE b // 16 = 0),  COUNT(*) FILTER (WHERE b // 16 = 1),
      |           COUNT(*) FILTER (WHERE b // 16 = 2),  COUNT(*) FILTER (WHERE b // 16 = 3),
      |           COUNT(*) FILTER (WHERE b // 16 = 4),  COUNT(*) FILTER (WHERE b // 16 = 5),
      |           COUNT(*) FILTER (WHERE b // 16 = 6),  COUNT(*) FILTER (WHERE b // 16 = 7),
      |           COUNT(*) FILTER (WHERE b // 16 = 8),  COUNT(*) FILTER (WHERE b // 16 = 9),
      |           COUNT(*) FILTER (WHERE b // 16 = 10), COUNT(*) FILTER (WHERE b // 16 = 11),
      |           COUNT(*) FILTER (WHERE b // 16 = 12), COUNT(*) FILTER (WHERE b // 16 = 13),
      |           COUNT(*) FILTER (WHERE b // 16 = 14), COUNT(*) FILTER (WHERE b // 16 = 15)
      |         ), ',')) AS hist_digest
      |  FROM vals GROUP BY id
      |)
      |SELECT id AS media_id,
      |       CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |       (256 + id % 512)::INT AS n_bytes,
      |       round(ssum / 256.0, 6) AS mean_intensity,
      |       256::BIGINT AS hist_sum,
      |       hist_digest,
      |       round(CAST(CAST(ssum / 256.0 / 255.0 AS REAL) AS DOUBLE), 6) AS emb_0
      |FROM agg ORDER BY media_id""".stripMargin

  /** Audio half of the multimodal surface: framed PCM analysis over the
    * synthetic corpus's audio rows (every 3rd id). All features are
    * integer arithmetic over the same LCG bytes as [[multimodalPipeline]],
    * here read as SIGNED 8-bit samples — fully hash-gated.
    */
  val multimodalAudio: Q = (s, _) =>
    graft.multimodal.Multimodal
      .analyzeAudio(graft.multimodal.Multimodal.syntheticCorpus(s, 200), 64)
      .toDF().orderBy("media_id")

  /** DuckDB mirror: the same recursive-CTE LCG as the raster oracle,
    * bytes recentred to signed (v = b − 256 for b ≥ 128), framed by
    * integer division, zero crossings via lag within (id, frame).
    */
  val multimodalAudioSql: String =
    """WITH RECURSIVE ids AS (
      |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 = 1
      |),
      |lcg AS (
      |  SELECT id, 0 AS i,
      |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
      |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
      |         (256 + id % 512) AS len
      |  FROM ids
      |  UNION ALL
      |  SELECT id, i + 1,
      |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
      |         len
      |  FROM lcg WHERE i < len - 1
      |),
      |vals AS (
      |  SELECT id, i, len,
      |         CASE WHEN (s // 72057594037927936) >= 128
      |              THEN (s // 72057594037927936) - 256
      |              ELSE (s // 72057594037927936) END::INT AS v
      |  FROM lcg
      |),
      |fr AS (
      |  SELECT id, i, v, len, i // 64 AS f
      |  FROM vals WHERE i < (len // 64) * 64
      |),
      |zc AS (
      |  SELECT *, CASE WHEN lag(v) OVER (PARTITION BY id, f ORDER BY i) IS NULL THEN 0
      |                 WHEN (v >= 0) <> (lag(v) OVER (PARTITION BY id, f ORDER BY i) >= 0) THEN 1
      |                 ELSE 0 END AS z
      |  FROM fr
      |),
      |fe AS (
      |  SELECT id, f, MAX(len) AS len, CAST(SUM(v::BIGINT * v) AS BIGINT) AS e,
      |         MAX(abs(v)) AS pk, CAST(SUM(z) AS INT) AS zc
      |  FROM zc GROUP BY id, f
      |)
      |SELECT id AS media_id, MAX(len)::INT AS n_samples, COUNT(*)::INT AS n_frames,
      |       CAST(SUM(e) AS BIGINT) AS total_energy, MAX(pk)::INT AS max_peak,
      |       CAST(SUM(zc) AS INT) AS total_zc,
      |       md5(string_agg(CAST(e AS VARCHAR), ',' ORDER BY f)) AS energy_digest
      |FROM fe GROUP BY id ORDER BY media_id""".stripMargin

  /** Voice-activity segmentation over the framed audio energies — the
    * segment-extraction step a speech-data pipeline runs between decode
    * and transcription: frames whose Σv² clears the activity threshold
    * are merged into maximal consecutive runs (gaps-and-islands via
    * `f − row_number`, the events_sessions_30m shape applied to PCM
    * frames). Both windows partition by media_id — per-media frame
    * counts are payload-bounded, so no single-reducer hazard at corpus
    * scale. Threshold 350 000 ≈ the expected frame energy of uniform
    * signed bytes (64·128²/3), so activity splits near the median and
    * segment lengths vary; pure integer comparison, no float hazard.
    */
  val multimodalAudioVad: Q = (s, _) => {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"f")
    val segW = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"f_start")
    graft.multimodal.Multimodal
      .audioFrameEnergies(graft.multimodal.Multimodal.syntheticCorpus(s, 200), 64)
      .toDF()
      .filter($"e" >= 350000L)
      .withColumn("g", $"f" - row_number().over(w))
      .groupBy($"media_id", $"g")
      .agg(min($"f").as("f_start"), max($"f").as("f_end"),
        count(lit(1)).cast("int").as("n_frames"),
        sum($"e").as("seg_energy"))
      .select($"media_id", row_number().over(segW).as("seg_id"),
        $"f_start", $"f_end", $"n_frames", $"seg_energy")
      .orderBy($"media_id", $"seg_id")
  }

  /** DuckDB mirror: the audio oracle's LCG/frame/energy CTEs, then the
    * same islands grouping (`f − row_number`) and per-media segment
    * numbering.
    */
  val multimodalAudioVadSql: String =
    """WITH RECURSIVE ids AS (
      |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 = 1
      |),
      |lcg AS (
      |  SELECT id, 0 AS i,
      |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
      |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
      |         (256 + id % 512) AS len
      |  FROM ids
      |  UNION ALL
      |  SELECT id, i + 1,
      |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
      |         len
      |  FROM lcg WHERE i < len - 1
      |),
      |vals AS (
      |  SELECT id, i, len,
      |         CASE WHEN (s // 72057594037927936) >= 128
      |              THEN (s // 72057594037927936) - 256
      |              ELSE (s // 72057594037927936) END::INT AS v
      |  FROM lcg
      |),
      |fe AS (
      |  SELECT id, i // 64 AS f, CAST(SUM(v::BIGINT * v) AS BIGINT) AS e
      |  FROM vals WHERE i < (len // 64) * 64
      |  GROUP BY id, i // 64
      |),
      |isl AS (
      |  SELECT id, f, e,
      |         f - row_number() OVER (PARTITION BY id ORDER BY f) AS g
      |  FROM fe WHERE e >= 350000
      |),
      |seg AS (
      |  SELECT id, MIN(f) AS f_start, MAX(f) AS f_end,
      |         COUNT(*) AS n_frames, CAST(SUM(e) AS BIGINT) AS seg_energy
      |  FROM isl GROUP BY id, g
      |)
      |SELECT id AS media_id,
      |       CAST(row_number() OVER (PARTITION BY id ORDER BY f_start) AS INTEGER) AS seg_id,
      |       CAST(f_start AS INTEGER) AS f_start, CAST(f_end AS INTEGER) AS f_end,
      |       CAST(n_frames AS INTEGER) AS n_frames, seg_energy
      |FROM seg ORDER BY media_id, seg_id""".stripMargin

  /** Perceptual image dedup by average-hash — the standard fingerprint
    * whose defining property (brightness invariance) the gate proves:
    * each image's 8×8 aHash plus a +16 brightness-shifted twin
    * (clamped at 255), candidate pairs from a 4×16-bit band join on
    * the hash string (never all-pairs), exact Hamming ≤ 8 verdict,
    * per-image best-match rollup. Twins pair with their base at small
    * distance (0 where nothing clamps); random image pairs sit near
    * Hamming 32 and never surface. The oracle replays the LCG raster,
    * the 8×8 nearest-neighbour index arithmetic, the integer mean
    * threshold, the banding, and the rollup in recursive-CTE SQL.
    */
  val multimodalImageAhash: Q = (s, _) => {
    import s.implicits._
    val hashes = graft.CacheTracker.persistTracked(
      graft.multimodal.Multimodal.imageAhashes(
        graft.multimodal.Multimodal.syntheticCorpus(s, 200), 16).toDF())
    val bands = hashes.select($"media_id",
        posexplode(transform(sequence(lit(0), lit(3)),
          k => $"hash".substr(k * 16 + 1, lit(16)))))
      .toDF("media_id", "band", "bkey")
    val cand = bands.alias("a").join(bands.alias("b"), Seq("band", "bkey"))
      .where($"a.media_id" < $"b.media_id")
      .select($"a.media_id".as("ia"), $"b.media_id".as("ib")).distinct()
    val dists = cand
      .join(hashes.select($"media_id".as("ia"), $"hash".as("ha")), "ia")
      .join(hashes.select($"media_id".as("ib"), $"hash".as("hb")), "ib")
      .withColumn("dist", aggregate(
        zip_with(split($"ha", ""), split($"hb", ""),
          (x, y) => when(x === y, 0).otherwise(1)),
        lit(0), (acc, v) => acc + v))
      .filter($"dist" <= 8)
    val sided = dists
      .select($"ia".as("media_id"), $"ib".as("partner"), $"dist")
      .unionByName(dists.select($"ib".as("media_id"), $"ia".as("partner"),
        $"dist"))
    val best = sided.groupBy($"media_id")
      .agg(count(lit(1)).as("n_matches"),
        min(struct($"dist", $"partner")).as("m"))
    hashes
      .join(best, Seq("media_id"), "left")
      .select($"media_id", $"variant", $"hash",
        coalesce($"n_matches", lit(0L)).as("n_matches"),
        $"m.partner".as("best_match_id"), $"m.dist".as("best_dist"))
      .orderBy($"media_id")
  }

  /** DuckDB mirror: the image oracle's LCG CTEs with the 8×8 resize
    * index arithmetic, the clamped brightness twin, string_agg bit
    * rows, the 4-band self-join, and the best-match rollup.
    */
  val multimodalImageAhashSql: String =
    """WITH RECURSIVE ids AS (
      |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 = 0
      |),
      |lcg AS (
      |  SELECT id, 0 AS i,
      |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
      |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
      |         (256 + id % 512) AS len
      |  FROM ids
      |  UNION ALL
      |  SELECT id, i + 1,
      |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
      |         len
      |  FROM lcg WHERE i < len - 1
      |),
      |small AS (
      |  SELECT i.id, p.range AS pos,
      |         ((p.range // 8) * (32 + i.id % 16) // 8) * (32 + i.id % 32)
      |           + (p.range % 8) * (32 + i.id % 32) // 8 AS big_idx,
      |         (256 + i.id % 512) AS len
      |  FROM ids i, range(64) p
      |),
      |px AS (
      |  SELECT sm.id, sm.pos, (l.s // 72057594037927936)::INT AS b
      |  FROM small sm JOIN lcg l ON l.id = sm.id AND l.i = sm.big_idx % sm.len
      |),
      |variants AS (
      |  SELECT id AS media_id, 'base' AS variant, pos, b FROM px
      |  UNION ALL
      |  SELECT id + 1000, 'bright', pos, LEAST(b + 16, 255) FROM px
      |),
      |means AS (
      |  SELECT media_id, CAST(SUM(b) AS BIGINT) // 64 AS m
      |  FROM variants GROUP BY media_id
      |),
      |hashes AS (
      |  SELECT v.media_id, MIN(v.variant) AS variant,
      |         string_agg(CASE WHEN v.b > means.m THEN '1' ELSE '0' END,
      |                    '' ORDER BY v.pos) AS hash
      |  FROM variants v JOIN means ON v.media_id = means.media_id
      |  GROUP BY v.media_id
      |),
      |bands AS (
      |  SELECT media_id, k AS band,
      |         substr(hash, CAST(k * 16 AS INT) + 1, 16) AS bkey
      |  FROM hashes CROSS JOIN range(0, 4) t(k)
      |),
      |cand AS (
      |  SELECT DISTINCT a.media_id AS ia, b2.media_id AS ib
      |  FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bkey = b2.bkey
      |  WHERE a.media_id < b2.media_id
      |),
      |dists AS (
      |  SELECT ia, ib,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> CASE WHEN substring(ha.hash, CAST(i AS INT), 1)
      |                     = substring(hb.hash, CAST(i AS INT), 1)
      |                THEN 0 ELSE 1 END)) AS INT) AS dist
      |  FROM cand JOIN hashes ha ON ia = ha.media_id
      |            JOIN hashes hb ON ib = hb.media_id
      |),
      |pairs AS (SELECT * FROM dists WHERE dist <= 8),
      |sided AS (
      |  SELECT ia AS media_id, ib AS partner, dist FROM pairs
      |  UNION ALL SELECT ib, ia, dist FROM pairs
      |),
      |bestrk AS (
      |  SELECT media_id, partner, dist,
      |    row_number() OVER (PARTITION BY media_id
      |                       ORDER BY dist, partner) AS rk,
      |    COUNT(*) OVER (PARTITION BY media_id) AS nm
      |  FROM sided
      |),
      |best AS (
      |  SELECT media_id, CAST(nm AS BIGINT) AS n_matches, partner, dist
      |  FROM bestrk WHERE rk = 1
      |)
      |SELECT h.media_id, h.variant, h.hash,
      |  COALESCE(b.n_matches, 0) AS n_matches,
      |  b.partner AS best_match_id,
      |  CAST(b.dist AS INT) AS best_dist
      |FROM hashes h LEFT JOIN best b ON h.media_id = b.media_id
      |ORDER BY h.media_id""".stripMargin

  /** Perceptual image dedup by DCT hash (pHash) — aHash's structural
    * sibling: the 63 AC coefficients of an integer 2-D DCT over the
    * 16×16 raster, thresholded at their exact median. The defining
    * property the gate hashes is exact brightness invariance — a
    * constant +16 shift moves only the DC coefficient, so unclamped
    * twins match at Hamming distance 0 (clamping flips a few bits) —
    * while aHash's mean threshold shifts WITH the pixels. Same banded
    * candidate recovery (4×16-bit bands over the hash string, never
    * all-pairs), exact Hamming ≤ 8 verdict, best-match rollup. The
    * oracle replays the LCG raster, the 16×16 resize arithmetic, the
    * fixed-point DCT (basis table rendered as literals from the SAME
    * Scala array — no libm in any per-row path), the 32nd-smallest
    * median, the banding, and the rollup.
    */
  val multimodalImagePhash: Q = (s, _) => {
    import s.implicits._
    val hashes = graft.CacheTracker.persistTracked(
      graft.multimodal.Multimodal.imagePhashes(
        graft.multimodal.Multimodal.syntheticCorpus(s, 200), 16).toDF())
    val bands = hashes.select($"media_id",
        posexplode(transform(sequence(lit(0), lit(3)),
          k => $"hash".substr(k * 16 + 1, lit(16)))))
      .toDF("media_id", "band", "bkey")
    val cand = bands.alias("a").join(bands.alias("b"), Seq("band", "bkey"))
      .where($"a.media_id" < $"b.media_id")
      .select($"a.media_id".as("ia"), $"b.media_id".as("ib")).distinct()
    val dists = cand
      .join(hashes.select($"media_id".as("ia"), $"hash".as("ha")), "ia")
      .join(hashes.select($"media_id".as("ib"), $"hash".as("hb")), "ib")
      .withColumn("dist", aggregate(
        zip_with(split($"ha", ""), split($"hb", ""),
          (x, y) => when(x === y, 0).otherwise(1)),
        lit(0), (acc, v) => acc + v))
      .filter($"dist" <= 8)
    val sided = dists
      .select($"ia".as("media_id"), $"ib".as("partner"), $"dist")
      .unionByName(dists.select($"ib".as("media_id"), $"ia".as("partner"),
        $"dist"))
    val best = sided.groupBy($"media_id")
      .agg(count(lit(1)).as("n_matches"),
        min(struct($"dist", $"partner")).as("m"))
    hashes
      .join(best, Seq("media_id"), "left")
      .select($"media_id", $"variant", $"hash",
        coalesce($"n_matches", lit(0L)).as("n_matches"),
        $"m.partner".as("best_match_id"), $"m.dist".as("best_dist"))
      .orderBy($"media_id")
  }

  val multimodalImagePhashSql: String = {
    val dctRows = graft.multimodal.Multimodal.DctT.zipWithIndex.flatMap {
      case (row, u) => row.zipWithIndex.map { case (t, x) => s"($u, $x, $t)" }
    }.mkString(",\n    ")
    s"""WITH RECURSIVE ids AS (
       |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 = 0
       |),
       |lcg AS (
       |  SELECT id, 0 AS i,
       |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
       |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
       |         (256 + id % 512) AS len
       |  FROM ids
       |  UNION ALL
       |  SELECT id, i + 1,
       |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
       |         len
       |  FROM lcg WHERE i < len - 1
       |),
       |dct(u, x, t) AS (VALUES
       |    $dctRows
       |),
       |small AS (
       |  SELECT i.id, p.range AS pos,
       |         ((p.range // 16) * (32 + i.id % 16) // 16) * (32 + i.id % 32)
       |           + (p.range % 16) * (32 + i.id % 32) // 16 AS big_idx,
       |         (256 + i.id % 512) AS len
       |  FROM ids i, range(256) p
       |),
       |px AS (
       |  SELECT sm.id, sm.pos, (l.s // 72057594037927936)::INT AS b
       |  FROM small sm JOIN lcg l ON l.id = sm.id AND l.i = sm.big_idx % sm.len
       |),
       |variants AS (
       |  SELECT id AS media_id, pos, b FROM px
       |  UNION ALL
       |  SELECT id + 1000, pos, LEAST(b + 16, 255) FROM px
       |),
       |coef AS MATERIALIZED (
       |  SELECT v.media_id, tu.u AS fu, tv.u AS fv,
       |         CAST(SUM(CAST(v.b AS BIGINT) * tu.t * tv.t) AS BIGINT) AS d
       |  FROM variants v
       |  JOIN dct tu ON tu.x = v.pos % 16
       |  JOIN dct tv ON tv.x = v.pos // 16
       |  GROUP BY v.media_id, tu.u, tv.u
       |),
       |ac AS (SELECT media_id, fu, fv, d FROM coef
       |       WHERE NOT (fu = 0 AND fv = 0)),
       |med AS (
       |  SELECT media_id, d AS m FROM (
       |    SELECT media_id, d, row_number() OVER (
       |      PARTITION BY media_id ORDER BY d, fu, fv) AS rk FROM ac)
       |  WHERE rk = 32
       |),
       |hashes AS (
       |  SELECT a.media_id,
       |         CASE WHEN a.media_id >= 1000 THEN 'bright' ELSE 'base' END
       |           AS variant,
       |         string_agg(CASE WHEN a.d > med.m THEN '1' ELSE '0' END,
       |                    '' ORDER BY a.fu, a.fv) AS hash
       |  FROM ac a JOIN med ON a.media_id = med.media_id
       |  GROUP BY a.media_id
       |),
       |bands AS (
       |  SELECT media_id, k AS band,
       |         substr(hash, CAST(k * 16 AS INT) + 1, 16) AS bkey
       |  FROM hashes CROSS JOIN range(0, 4) t(k)
       |),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS ia, b2.media_id AS ib
       |  FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bkey = b2.bkey
       |  WHERE a.media_id < b2.media_id
       |),
       |dists AS (
       |  SELECT ia, ib,
       |    CAST(list_sum(list_transform(range(1, 64),
       |      i -> CASE WHEN substring(ha.hash, CAST(i AS INT), 1)
       |                     = substring(hb.hash, CAST(i AS INT), 1)
       |                THEN 0 ELSE 1 END)) AS INT) AS dist
       |  FROM cand JOIN hashes ha ON ia = ha.media_id
       |            JOIN hashes hb ON ib = hb.media_id
       |),
       |pairs AS (SELECT * FROM dists WHERE dist <= 8),
       |sided AS (
       |  SELECT ia AS media_id, ib AS partner, dist FROM pairs
       |  UNION ALL SELECT ib, ia, dist FROM pairs
       |),
       |bestrk AS (
       |  SELECT media_id, partner, dist,
       |    row_number() OVER (PARTITION BY media_id
       |                       ORDER BY dist, partner) AS rk,
       |    COUNT(*) OVER (PARTITION BY media_id) AS nm
       |  FROM sided
       |),
       |best AS (
       |  SELECT media_id, CAST(nm AS BIGINT) AS n_matches, partner, dist
       |  FROM bestrk WHERE rk = 1
       |)
       |SELECT h.media_id, h.variant, h.hash,
       |  COALESCE(b.n_matches, 0) AS n_matches,
       |  b.partner AS best_match_id,
       |  CAST(b.dist AS INT) AS best_dist
       |FROM hashes h LEFT JOIN best b ON h.media_id = b.media_id
       |ORDER BY h.media_id""".stripMargin
  }

  /** Video leg: uniform-stride frame sampling (stride 2) + per-frame
    * byte-sum/digest features over the synthetic corpus's video rows
    * (every `id % 3 == 2`). Hash-gates the slice arithmetic itself:
    * frameLen = len div n_frames, frame f covers bytes
    * [f·frameLen, (f+1)·frameLen) — a boundary drift of one byte
    * changes every digest.
    */
  val multimodalVideo: Q = (s, _) =>
    graft.multimodal.Multimodal
      .analyzeFrames(graft.multimodal.Multimodal.syntheticCorpus(s, 200), 2)
      .toDF().orderBy("media_id", "frame_idx")

  /** DuckDB mirror: the recursive-CTE LCG again; frames by integer
    * division of the byte index, sampled frames are the even ones.
    */
  val multimodalVideoSql: String =
    """WITH RECURSIVE ids AS (
      |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 = 2
      |),
      |lcg AS (
      |  SELECT id, 0 AS i,
      |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
      |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
      |         (256 + id % 512) AS len
      |  FROM ids
      |  UNION ALL
      |  SELECT id, i + 1,
      |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
      |         len
      |  FROM lcg WHERE i < len - 1
      |),
      |vals AS (
      |  SELECT id, i, len, (s // 72057594037927936)::INT AS b,
      |         (8 + id % 8) AS n_frames,
      |         len // (8 + id % 8) AS frame_len
      |  FROM lcg
      |)
      |SELECT id AS media_id, CAST(i // frame_len AS INT) AS frame_idx,
      |       CAST(COUNT(*) AS INT) AS n_frame_bytes,
      |       CAST(SUM(b) AS BIGINT) AS frame_sum,
      |       md5(string_agg(CAST(b AS VARCHAR), ',' ORDER BY i)) AS frame_digest
      |FROM vals
      |WHERE i < n_frames * frame_len AND (i // frame_len) % 2 = 0
      |GROUP BY id, i // frame_len
      |ORDER BY media_id, frame_idx""".stripMargin

  /** Scene-cut detection over the video frames — the shot-boundary step
    * a video-data pipeline runs before per-scene sampling/captioning:
    * every frame (stride 1) carries its byte-sum feature; a CUT opens
    * where the inter-frame feature jump clears 16·frame_bytes (a pure
    * integer rule — |Δsum| scales with frame length, so the threshold
    * is length-normalized without division); scenes are the runs
    * between cuts (running cut count as the scene id — the VAD islands
    * shape driven by a lag, not a threshold filter). Per scene: frame
    * span, frame count, byte mass.
    *
    * Scale shape: both windows partition by media_id (per-media frame
    * counts are payload-bounded), the scene rollup rides the same
    * keying — one shuffle end to end after the frame map.
    */
  val multimodalSceneCuts: Q = (s, _) => {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"frame_idx")
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"frame_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    graft.multimodal.Multimodal
      .analyzeFrames(graft.multimodal.Multimodal.syntheticCorpus(s, 200), 1)
      .toDF()
      .withColumn("prev", lag($"frame_sum", 1).over(w))
      .withColumn("cut",
        when($"prev".isNotNull &&
          abs($"frame_sum" - $"prev") > lit(16L) * $"n_frame_bytes", 1L)
          .otherwise(0L))
      .withColumn("scene_id", sum($"cut").over(run).cast("int"))
      .groupBy($"media_id", $"scene_id")
      .agg(min($"frame_idx").as("f_start"), max($"frame_idx").as("f_end"),
        count(lit(1)).cast("int").as("n_frames"),
        sum($"frame_sum").as("scene_sum"))
      .orderBy($"media_id", $"scene_id")
  }

  /** DuckDB mirror: the video LCG/frame CTEs at stride 1, the same
    * integer cut rule via lag, running cut count, scene rollup.
    */
  val multimodalSceneCutsSql: String =
    """WITH RECURSIVE ids AS (
      |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 = 2
      |),
      |lcg AS (
      |  SELECT id, 0 AS i,
      |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
      |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
      |         (256 + id % 512) AS len
      |  FROM ids
      |  UNION ALL
      |  SELECT id, i + 1,
      |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
      |         len
      |  FROM lcg WHERE i < len - 1
      |),
      |vals AS (
      |  SELECT id, i, len, (s // 72057594037927936)::INT AS b,
      |         (8 + id % 8) AS n_frames,
      |         len // (8 + id % 8) AS frame_len
      |  FROM lcg
      |),
      |frames AS (
      |  SELECT id AS media_id, CAST(i // frame_len AS INT) AS frame_idx,
      |         CAST(COUNT(*) AS INT) AS n_frame_bytes,
      |         CAST(SUM(b) AS BIGINT) AS frame_sum
      |  FROM vals
      |  WHERE i < n_frames * frame_len
      |  GROUP BY id, i // frame_len
      |),
      |cuts AS (
      |  SELECT *, CASE WHEN lag(frame_sum) OVER
      |      (PARTITION BY media_id ORDER BY frame_idx) IS NOT NULL
      |    AND abs(frame_sum - lag(frame_sum) OVER
      |      (PARTITION BY media_id ORDER BY frame_idx)) > 16 * n_frame_bytes
      |    THEN 1 ELSE 0 END AS cut
      |  FROM frames
      |),
      |scenes AS (
      |  SELECT *, CAST(SUM(cut) OVER (PARTITION BY media_id
      |    ORDER BY frame_idx ROWS UNBOUNDED PRECEDING) AS INT) AS scene_id
      |  FROM cuts
      |)
      |SELECT media_id, scene_id,
      |  CAST(MIN(frame_idx) AS INT) AS f_start,
      |  CAST(MAX(frame_idx) AS INT) AS f_end,
      |  CAST(COUNT(*) AS INT) AS n_frames,
      |  CAST(SUM(frame_sum) AS BIGINT) AS scene_sum
      |FROM scenes GROUP BY media_id, scene_id
      |ORDER BY media_id, scene_id""".stripMargin

  /** Image near-duplicate search over the DECODED multimodal corpus —
    * the media-side analogue of the text/embedding dedup gates, and the
    * composition they imply: decode → resize → 16-bin histogram feature
    * (pure integer, so the verdict needs no decimal detour) → block on
    * the DOMINANT intensity bin (the cheap content key — candidates
    * only within a block, never all-pairs) → integer L1 distance →
    * top-3 neighbours per image. At scale the block key is the shuffle
    * key and per-block membership is bounded by the feature-space
    * granularity, the same shape as every banded-LSH gate.
    */
  val multimodalImageSim: Q = (s, _) => {
    import s.implicits._
    val feats = graft.multimodal.Multimodal.featurize(
      graft.multimodal.Multimodal.syntheticCorpus(s, 200)
        .filter(_.kind == "image"))
    val f = graft.CacheTracker.persistTracked(feats.toDF()
      .select($"media_id", $"histogram")
      .withColumn("blk",
        array_position($"histogram", array_max($"histogram")).cast("int")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"l1", $"nbr_id")
    f.alias("a").join(f.alias("b"),
        $"a.blk" === $"b.blk" && $"a.media_id" =!= $"b.media_id")
      .select($"a.media_id".as("media_id"), $"b.media_id".as("nbr_id"),
        $"a.blk".as("blk"),
        aggregate(zip_with($"a.histogram", $"b.histogram", (x, y) => abs(x - y)),
          lit(0L), (acc, v) => acc + v).as("l1"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .orderBy($"media_id", $"rank")
  }

  /** DuckDB mirror: the recursive-CTE LCG + the exact resize index
    * arithmetic of [[multimodalPipelineSql]], restricted to image ids,
    * histograms kept as integer lists, L1 + ranking replayed verbatim.
    */
  val multimodalImageSimSql: String = {
    val bins = (0 until 16)
      .map(i => s"COUNT(*) FILTER (WHERE b // 16 = $i)").mkString(",\n    ")
    s"""WITH RECURSIVE ids AS (
       |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 = 0
       |),
       |lcg AS (
       |  SELECT id, 0 AS i,
       |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
       |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
       |         (256 + id % 512) AS len
       |  FROM ids
       |  UNION ALL
       |  SELECT id, i + 1,
       |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
       |         len
       |  FROM lcg WHERE i < len - 1
       |),
       |small AS (
       |  SELECT i.id,
       |         ((p.range // 16) * (32 + i.id % 16) // 16) * (32 + i.id % 32)
       |           + (p.range % 16) * (32 + i.id % 32) // 16 AS big_idx,
       |         (256 + i.id % 512) AS len
       |  FROM ids i, range(256) p
       |),
       |vals AS (
       |  SELECT sm.id, (l.s // 72057594037927936)::INT AS b
       |  FROM small sm JOIN lcg l ON l.id = sm.id AND l.i = sm.big_idx % sm.len
       |),
       |hists AS (
       |  SELECT id, list_value(
       |    $bins) AS h
       |  FROM vals GROUP BY id
       |),
       |blocks AS (
       |  SELECT id, h, CAST(list_position(h, list_max(h)) AS INT) AS blk
       |  FROM hists
       |),
       |pairs AS (
       |  SELECT a.id AS media_id, b.id AS nbr_id, a.blk,
       |    CAST(list_sum(list_transform(range(1, 17), i -> abs(a.h[i] - b.h[i])))
       |      AS BIGINT) AS l1
       |  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.id <> b.id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY media_id ORDER BY l1, nbr_id) AS rank
       |  FROM pairs
       |)
       |SELECT media_id, nbr_id, blk, l1, CAST(rank AS INTEGER) AS rank FROM ranked
       |WHERE rank <= 3 ORDER BY media_id, rank""".stripMargin
  }

  /** CROSS-MODAL retrieval over the decoded multimodal corpus — the
    * audio→image nearest-neighbour search a contrastive-pairing pipeline
    * (CLIP-style candidate mining) runs against a shared feature space:
    * both modalities decode to the same 16-bin intensity histogram
    * (pure integer — no decimal detour), images are INDEXED under their
    * dominant bin (the IVF coarse-cell analog), and each audio query
    * PROBES its top-2 bins (nprobe=2 — the recall lever the
    * single-probe `multimodal_image_simjoin` lacks), ranks candidates
    * by integer L1, and keeps the top 3.
    *
    * Scale shape: the probe and index tables shuffle on the bin key —
    * candidates exist only within probed cells, never all-pairs; per-cell
    * membership is bounded by feature-space granularity; the top-3 window
    * partitions by the query id. Top-2 probe selection itself rides a
    * per-query window over 16 exploded bins, engine-parallel.
    */
  val multimodalCrossmodal: Q = (s, _) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val f = graft.CacheTracker.persistTracked(
      graft.multimodal.Multimodal.featurize(
        graft.multimodal.Multimodal.syntheticCorpus(s, 200)
          .filter(m => m.kind == "image" || m.kind == "audio"))
        .toDF().select($"media_id", $"kind", $"histogram"))
    val imgs = f.filter($"kind" === "image")
      .select($"media_id".as("nbr_id"), $"histogram".as("h"),
        array_position($"histogram", array_max($"histogram")).cast("int")
          .as("blk"))
    val wp = Window.partitionBy($"qid").orderBy($"v".desc, $"blk")
    val probes = f.filter($"kind" === "audio")
      .select($"media_id".as("qid"), posexplode($"histogram").as(Seq("p0", "v")))
      .withColumn("blk", ($"p0" + 1).cast("int"))
      .withColumn("pr", row_number().over(wp))
      .filter($"pr" <= 2)
      .select($"qid", $"blk")
    val wk = Window.partitionBy($"media_id").orderBy($"l1", $"nbr_id")
    probes
      .join(f.filter($"kind" === "audio")
        .select($"media_id".as("qid"), $"histogram".as("qh")), "qid")
      .join(imgs, "blk")
      .select($"qid".as("media_id"), $"nbr_id", $"blk",
        aggregate(zip_with($"qh", $"h", (x, y) => abs(x - y)),
          lit(0L), (acc, v) => acc + v).as("l1"))
      .withColumn("rank", row_number().over(wk))
      .filter($"rank" <= 3)
      .orderBy($"media_id", $"rank")
  }

  /** DuckDB mirror: the LCG/resize/histogram CTEs of
    * [[multimodalImageSimSql]] over BOTH modalities (ids ≢ 2 mod 3),
    * dominant-bin index, per-query top-2 probe ranks, L1 + top-3.
    */
  val multimodalCrossmodalSql: String = {
    val bins = (0 until 16)
      .map(i => s"COUNT(*) FILTER (WHERE b // 16 = $i)").mkString(",\n    ")
    s"""WITH RECURSIVE ids AS (
       |  SELECT range::BIGINT AS id FROM range(200) WHERE range % 3 IN (0, 1)
       |),
       |lcg AS (
       |  SELECT id, 0 AS i,
       |         ((((id::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
       |            * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
       |         (256 + id % 512) AS len
       |  FROM ids
       |  UNION ALL
       |  SELECT id, i + 1,
       |         (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616,
       |         len
       |  FROM lcg WHERE i < len - 1
       |),
       |small AS (
       |  SELECT i.id,
       |         ((p.range // 16) * (32 + i.id % 16) // 16) * (32 + i.id % 32)
       |           + (p.range % 16) * (32 + i.id % 32) // 16 AS big_idx,
       |         (256 + i.id % 512) AS len
       |  FROM ids i, range(256) p
       |),
       |vals AS (
       |  SELECT sm.id, (l.s // 72057594037927936)::INT AS b
       |  FROM small sm JOIN lcg l ON l.id = sm.id AND l.i = sm.big_idx % sm.len
       |),
       |hists AS (
       |  SELECT id, list_value(
       |    $bins) AS h
       |  FROM vals GROUP BY id
       |),
       |imgs AS (
       |  SELECT id AS nbr_id, h,
       |    CAST(list_position(h, list_max(h)) AS INT) AS blk
       |  FROM hists WHERE id % 3 = 0
       |),
       |abins AS (
       |  SELECT id AS qid, h AS qh, t.k AS blk, h[t.k] AS v
       |  FROM hists CROSS JOIN range(1, 17) t(k)
       |  WHERE id % 3 = 1
       |),
       |probes AS (
       |  SELECT qid, qh, CAST(blk AS INT) AS blk FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY qid ORDER BY v DESC, blk) AS pr
       |    FROM abins)
       |  WHERE pr <= 2
       |),
       |cand AS (
       |  SELECT p.qid AS media_id, i.nbr_id, p.blk,
       |    CAST(list_sum(list_transform(range(1, 17),
       |      j -> abs(p.qh[j] - i.h[j]))) AS BIGINT) AS l1
       |  FROM probes p JOIN imgs i ON p.blk = i.blk
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY media_id ORDER BY l1, nbr_id) AS rank
       |  FROM cand
       |)
       |SELECT media_id, nbr_id, blk, l1, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 3 ORDER BY media_id, rank""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = {
    val modules: Seq[Map[String, (Q, Option[String])]] = Seq(
      Map(
        "q1_pricing_summary" -> (q1PricingSummary, Some(q1PricingSummarySql)),
        "multimodal_pipeline" -> (multimodalPipeline, Some(multimodalPipelineSql)),
        "multimodal_video_frames" -> (multimodalVideo, Some(multimodalVideoSql)),
        "multimodal_video_scene_cuts" ->
          (multimodalSceneCuts, Some(multimodalSceneCutsSql)),
        "multimodal_audio_frames" -> (multimodalAudio, Some(multimodalAudioSql)),
        "multimodal_audio_vad" -> (multimodalAudioVad, Some(multimodalAudioVadSql)),
        "multimodal_image_ahash" -> (multimodalImageAhash, Some(multimodalImageAhashSql)),
        "multimodal_image_phash" -> (multimodalImagePhash, Some(multimodalImagePhashSql)),
        "multimodal_image_simjoin" -> (multimodalImageSim, Some(multimodalImageSimSql)),
        "multimodal_crossmodal_ann" ->
          (multimodalCrossmodal, Some(multimodalCrossmodalSql))),
      RefQueries.all, TpchQueries.all, EventQueries.all, LakeQueries.all,
      AdvancedJoins.all, RelationalExtras.all, SqlQueries.all,
      graft.text.TextQueries.all, graft.text.Utf8Queries.all,
      graft.text.HtmlQueries.all,
      graft.text.BpeQueries.all, graft.text.UnigramQueries.all,
      graft.text.WordpieceQueries.all,
      graft.text.ClassifierQueries.all,
      graft.text.DedupQueries.all,
      graft.vector.SimilarityQueries.all,
      graft.pipeline.CurationQueries.all,
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
