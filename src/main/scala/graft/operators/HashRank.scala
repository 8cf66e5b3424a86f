package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group rank in (md5(salt ++ id), id) order, computed with
  * BOUNDED windows — the two-phase distributed rank that replaces a
  * `row_number` window keyed on a low-cardinality group, which would
  * drag every group's full membership onto one reducer and sort it
  * there (with 10 labels over a 100 TB corpus, ten reducers each sort
  * a tenth of the corpus).
  *
  * Phase 1 buckets each row by the LEADING BYTE of its order hash —
  * because the bucket is the hash's most significant component,
  * (bucket asc, hash asc, id asc) is exactly (hash asc, id asc), so
  * ranks composed per bucket equal the global per-group ranks
  * bit-for-bit (lowercase hex compares like its numeric value).
  * Phase 2 turns the per-(group, bucket) counts — at most 256 rows per
  * group — into running offsets with a TINY window, and each row's
  * rank is its bucket offset plus its within-bucket `row_number`,
  * whose partitions hold ~|group|/256 rows each. Same output as the
  * naive window (HashRankProps pins it), shuffle-bounded plan.
  */
object HashRank {

  private def twoPhase(df: DataFrame, groupCol: String, idCol: String,
      salt: String, perBucket: org.apache.spark.sql.Column,
      within: org.apache.spark.sql.expressions.WindowSpec =>
        org.apache.spark.sql.Column,
      out: String): DataFrame = {
    // (structure shared by rank and cumSum; see the object scaladoc)
    val h = md5(concat(lit(salt), col(idCol).cast("string")))
    val withB = df.withColumn("_h", h)
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val offsets = withB.groupBy(col(groupCol), col("_b"))
      .agg(perBucket.as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("_b"), col("_off"))
    val wIn = Window.partitionBy(col(groupCol), col("_b"))
      .orderBy(col("_h"), col(idCol))
    withB.join(offsets, Seq(groupCol, "_b"))
      .withColumn(out, col("_off") + within(wIn))
      .drop("_h", "_b", "_off")
  }

  /** Adds `rk` (1-based rank within `groupCol` under the salted-md5
    * order) to `df`. `idCol` must be unique per group — it is the tie
    * break and the hash input.
    */
  def rank(df: DataFrame, groupCol: String, idCol: String,
      salt: String): DataFrame =
    twoPhase(df, groupCol, idCol, salt, count(lit(1)),
      w => row_number().over(w).cast("long"), "rk")

  /** Adds `cum` (the INCLUSIVE running sum of `valueCol` within
    * `groupCol` under the salted-md5 order) — the distributed
    * sequence-packing cumsum: same two-phase shape as [[rank]] with
    * per-bucket SUMS as the offsets.
    */
  def cumSum(df: DataFrame, groupCol: String, idCol: String,
      salt: String, valueCol: String): DataFrame =
    twoPhase(df, groupCol, idCol, salt, sum(col(valueCol)),
      w => sum(col(valueCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), "cum")
}
