package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass top-k aggregator (SURVEY.md §7: the one `Aggregator`
  * the extended surface warrants).
  *
  * Why not orderBy(...).limit(k) / row_number? Those are fine per-query,
  * but rank-per-group via a window SORTS every group's full candidate set
  * after a shuffle. This aggregator keeps only k rows per group at every
  * stage — map-side partial aggregation bounds the shuffle to k rows per
  * (group × partition) — which is the shape that survives groups with
  * millions of candidates. Order is total (score desc, then id asc), so
  * the result is deterministic and equals the window-rank formulation —
  * letting the same DuckDB oracle check both.
  */
final case class ScoredId(q_id: Long, vec_id: Long, score: Double)

/** Sorted parallel arrays (score desc, id asc tiebreak), at most k long.
  * Arrays keep the buffer a flat product type — fully codegen-encodable,
  * no kryo.
  */
final case class TopKBuf(ids: Array[Long], scores: Array[Double])

class TopKByScore(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  private def trim(ids: Array[Long], scores: Array[Double]): TopKBuf = {
    val order = ids.indices.sortBy(i => (-scores(i), ids(i))).take(k)
    TopKBuf(order.map(ids).toArray, order.map(scores).toArray)
  }

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
    // below the current kth score (full buffer): drop without resorting
    if (b.ids.length >= k) {
      val kthScore = b.scores(k - 1)
      val kthId = b.ids(k - 1)
      if (a.score < kthScore || (a.score == kthScore && a.vec_id > kthId))
        return b
    }
    trim(b.ids :+ a.vec_id, b.scores :+ a.score)
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    trim(b1.ids ++ b2.ids, b1.scores ++ b2.scores)

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
