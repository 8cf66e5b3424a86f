package graft

/** Deployment-facing sizing knobs for the sketch/LSH operators,
  * env-overridable like SPARK_GRAFT_CPUS. The defaults are the values
  * derived for the gate corpus; the derivations live with the use sites
  * (occupancy math in [[graft.vector.SimilarityQueries]], banding math
  * in [[graft.text.DedupQueries]]).
  *
  * Sizing rule of thumb for banded LSH at a different corpus size n:
  * with background per-bit agreement p₀, candidate pairs ≈
  * b·(n²/2)·p₀^r — pick r ≈ log_{1/p₀}(b·n²/(2·target_candidates))
  * (r grows with log n), then pick b so twin recall 1-(1-p₁^r)^b hits
  * the target for the similarity floor p₁ you must not miss. The
  * signature width the native expressions take is b·r, so these knobs
  * fully determine the plan — same shape at 10⁴ or 10¹⁰ rows, only the
  * constants move.
  *
  * Both the Spark query AND its DuckDB oracle SQL are built from the
  * same vals at object init, so an override keeps the gate coherent.
  */
object Tuning {
  private def envInt(name: String, default: Int): Int =
    sys.env.get(name).map(_.trim.toInt).getOrElse(default)

  /** MinHash sketch width (permutations). */
  val minhashK: Int = envInt("SPARK_GRAFT_MINHASH_K", 8)
  /** MinHash LSH: bands of r hashes (AND within a band, OR across). */
  val minhashBands: Int = envInt("SPARK_GRAFT_MINHASH_BANDS", 4)
  val minhashR: Int = envInt("SPARK_GRAFT_MINHASH_R", 2)

  /** Hot-band overflow cap for MinHash LSH: a (band, key) group larger
    * than this is dropped from candidate generation instead of joined.
    * A boilerplate-heavy corpus (the same header/footer on millions of
    * docs) collapses those docs onto ONE band key, and the candidate
    * self-join goes quadratic in the group size — one hot group of g
    * docs is g·(g-1)/2 pairs, unbounded by any of the banding math
    * below. Groups at the cap are near-certain exact duplicates of each
    * other (all r hashes agree in EVERY band they collide in), which is
    * the exact-dedup fingerprint gate's job, not near-dup's — dropping
    * them loses nothing the pipeline doesn't already catch, and keeps
    * per-band candidates ≤ n_groups·cap·(cap-1)/2. Size to the largest
    * legitimate near-dup cluster you expect (default 32 ≫ the gate
    * corpus's max group of 3).
    */
  val lshBandCap: Int = envInt("SPARK_GRAFT_LSH_BAND_CAP", 32)

  /** Hot-cell pair window for semantic dedup: within each k-means cell,
    * members are ranked by exact distance-to-centroid and only pairs
    * within this many RANKS of each other are screened (the classic
    * sorted-neighborhood blocking key — near-dup twins sit at
    * near-identical distance to their cell's centroid, so they are
    * rank-adjacent by construction). For a cell at or under the window
    * this is EXACTLY the all-pairs screen (every pair is within the
    * window); past it, candidates are hard-bounded at 2·|cell|·window —
    * the `lshBandCap` analogue for the embedding-space dedup layer,
    * closing the |cell|²/2 blow-up one skewed cell would otherwise cost
    * (one dense boilerplate region at 100 TB ⇒ a cell with millions of
    * members). The occupancy-scaled-k alternative (k ∝ n/target) only
    * bounds the EXPECTED cell size; this bounds the worst case. Size to
    * the largest cluster whose internal pairs you must rank exhaustively
    * (default 512 ≫ the ~400-member cells the sf0.1 gate produces, so
    * the driver gate runs the all-pairs-identical regime; the planted
    * hot-cell gate pins the capped regime at an explicit window of 64).
    */
  val semCellCap: Int = envInt("SPARK_GRAFT_SEM_CELL_CAP", 512)

  /** Sign-LSH near-dup banding (embedding twins). */
  val ndBands: Int = envInt("SPARK_GRAFT_ND_BANDS", 4)
  val ndR: Int = envInt("SPARK_GRAFT_ND_R", 24)

  /** Sign-LSH ANN banding (lower-similarity neighbors → shorter bands). */
  val annBands: Int = envInt("SPARK_GRAFT_ANN_BANDS", 3)
  val annR: Int = envInt("SPARK_GRAFT_ANN_R", 6)

  /** IVF cells probed per query (reads ~replicas·probes/k of the corpus). */
  val ivfProbes: Int = envInt("SPARK_GRAFT_IVF_PROBES", 4)
  /** Lloyd rounds refining the IVF coarse quantizer from label-mean seeds. */
  val ivfLloyd: Int = envInt("SPARK_GRAFT_IVF_LLOYD", 2)
  /** Cells each corpus vector is indexed under (IVF replication — the
    * boundary-loss answer on weakly clustered data: recall@p=4 measured
    * 0.76 single-assignment vs 0.92 with replicas=2 on this corpus).
    */
  val ivfReplicas: Int = envInt("SPARK_GRAFT_IVF_REPLICAS", 2)
  /** IVF-PQ composed read path: ADC shortlist depth per query before the
    * exact rescore (FAISS's `k_factor·k` rerank budget; k_factor=10 for
    * the gate's top-5). Sized by a measured sweep on the gate corpus:
    * the compressed-domain ranking error must stay inside the shortlist,
    * and composed recall@5 vs exact was 0.76 at depth 25, 0.80 at 40,
    * ≥0.88 at 50 — the spec floor (0.85) sits under the 50 measurement,
    * with IVF probing alone at 0.92 as the ceiling.
    */
  val ivfpqRerank: Int = envInt("SPARK_GRAFT_IVFPQ_RERANK", 50)

  /** State-store partitions for the driver-gated streaming queries.
    * Every stateful operator runs one state store per shuffle partition
    * per micro-batch, each paying open/commit file IO — at the gate
    * corpus's row counts that overhead dwarfs the data (measured: a
    * 4-batch stream-stream join spent ~70 task-seconds per batch across
    * 32 partitions on state machinery). Size this to throughput × key
    * cardinality in production; 4 is ample for the gate (measured r9:
    * 8 → 4 cut the 13-gate stream subtotal ~15% with identical hashes —
    * the stores are commit-bound, not compute-bound, at gate scale).
    */
  val streamStatePartitions: Int = envInt("SPARK_GRAFT_STREAM_PARTITIONS", 4)
}
