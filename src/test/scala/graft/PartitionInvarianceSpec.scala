package graft

/** Partition-count invariance for the four r15 gates: the whole oracle
  * contract rests on a 1000-executor run hashing identically to
  * local[32], so every new gate runs here at sf0.001 under two
  * deliberately awkward shuffle-partition settings (3 and 17 — neither
  * the session default nor each other's divisor) and must produce
  * row-identical output. The older surface carries this property via
  * the ScaleStress replication tests; these four gates landed r15.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val gates = Seq("text_kneser_ney_bigram", "events_holt_winters",
    "dedup_cdc_chunks", "agg_kmv_intersect", "dedup_substring_spans",
    "curate_decontaminate_ngrams", "text_phrase_search",
    "curate_length_batching", "dedup_edit_distance",
    "multimodal_crossmodal_ann")

  test("r15/r16 gates are row-identical under shuffle partitions 3 and 17") {
    gates.foreach { g =>
      def run(parts: String): Seq[String] =
        Confs.withConf(spark, "spark.sql.shuffle.partitions" -> parts) {
          val rows = Queries.queries(g)(spark, sf0001).collect()
            .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
          graft.CacheTracker.releaseAll()
          rows
        }
      val a = run("3")
      val b = run("17")
      assert(a == b, s"$g diverged between 3 and 17 shuffle partitions")
      assert(a.nonEmpty, s"$g returned no rows at sf0.001")
    }
  }
}
