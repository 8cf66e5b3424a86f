package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary: at most `m` (word, count) pairs,
  * words kept sorted so the per-token fast path is a binary search.
  * Parallel arrays keep the buffer a flat product type — fully
  * codegen-encodable, no kryo (the [[TopKBuf]] discipline).
  */
final case class MgSummary(words: Array[String], counts: Array[Long])

/** Mergeable Misra-Gries sketch as a typed Aggregator — the bounded-
  * memory first pass of the two-pass heavy-hitter pattern (sketch the
  * candidate set, then exact-count only the candidates). Input is a
  * WEIGHTED item (word, weight): a weight-`k` update is equivalent to
  * `k` unit inserts for the guarantee (it IS a merge with a 1-entry
  * summary), so pre-weighted streams — map-side combined partials, a
  * replication factor carried as a column — sketch without being
  * materialized row-per-unit. The summary holds at most `m` counters;
  * inserting past capacity subtracts the (m+1)-th largest count from
  * every counter and drops the non-positive ones (for a unit insert
  * that is the classic decrement step), and MERGING two summaries sums
  * counts of the union then compresses the same way — the construction
  * of Agarwal et al.'s mergeable summaries, which keeps the guarantee
  * under ANY partitioning / combine tree, in TOTAL WEIGHT W:
  *
  *   true(w) − W/(m+1)  ≤  est(w)  ≤  true(w)
  *
  * so every w with true weight > W/(m+1) survives in the summary no
  * matter how Spark splits and combines the scan. The candidate SET is
  * therefore deterministic-enough for a gate that exact-rescores: the
  * final output depends only on the guarantee, not on intra-partition
  * order. Property-tested against exact counts under random
  * repartitionings and random weights in HeavyHittersSpec.
  *
  * Scale shape: map-side partial aggregation reduces each partition to
  * one ≤m-entry summary, the shuffle moves ≤m rows per partition, and
  * the exact second pass touches only candidate keys — the heavy-hitter
  * plan that survives a 100 TB token stream where an exact global
  * group-by of the full vocabulary would not.
  */
class MisraGries(m: Int)
    extends Aggregator[(String, Long), MgSummary, MgSummary] {
  require(m >= 1, s"capacity must be positive, got $m")

  override def zero: MgSummary = MgSummary(Array.empty, Array.empty)

  /** Sort by word; if over capacity, subtract the (m+1)-th largest
    * count from all and keep the strictly positive remainders.
    */
  private def compact(pairs: Seq[(String, Long)]): MgSummary = {
    val kept =
      if (pairs.size <= m) pairs
      else {
        val pivot = pairs.map(_._2).sorted(Ordering[Long].reverse)(m)
        pairs.collect { case (w, c) if c > pivot => (w, c - pivot) }
      }
    val s = kept.sortBy(_._1)
    MgSummary(s.map(_._1).toArray, s.map(_._2).toArray)
  }

  override def reduce(b: MgSummary, t: (String, Long)): MgSummary = {
    val (w, wt) = t
    require(wt > 0, s"weights must be positive, got $wt for $w")
    val i = java.util.Arrays.binarySearch(
      b.words.asInstanceOf[Array[AnyRef]], w)
    if (i >= 0) {
      val c = b.counts.clone(); c(i) += wt; MgSummary(b.words, c)
    } else compact(b.words.zip(b.counts).toSeq :+ (w -> wt))
  }

  override def merge(a: MgSummary, b: MgSummary): MgSummary =
    compact((a.words.zip(a.counts) ++ b.words.zip(b.counts)).toSeq
      .groupMapReduce(_._1)(_._2)(_ + _).toSeq)

  override def finish(b: MgSummary): MgSummary = b

  override def bufferEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
