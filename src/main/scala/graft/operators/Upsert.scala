package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed last-write-wins upsert — the relational core of the reference's
  * `INSERT ... ON CONFLICT (locid) DO UPDATE` sink (O6 in SURVEY.md §2;
  * `internal/db/db.go:43-80`).
  *
  * The reference's semantics are nondeterministic for duplicate keys across
  * chunks (10 unordered workers, `internal/writer/writer.go:53-68`) and it
  * FAILS outright on duplicates within one chunk (Postgres "cannot affect
  * row a second time"). This port upgrades both (SURVEY.md §1.4): last-wins
  * is defined by an explicit, caller-supplied sequence column, making the
  * merge deterministic at any parallelism.
  *
  * Scale: one shuffle on the key (the minimum possible for a keyed merge);
  * `row_number` is a single pass within each hash partition. No driver-side
  * state — this is the same plan shape at 1k rows or 100 TB. For repeated
  * incremental merges into a table, bucketing the stored table by the key
  * removes even that shuffle on the existing side.
  */
object Upsert {

  /** Keep exactly one row per key: the one with the highest `seq`
    * (ties broken by `tiebreak` desc to stay total, hence deterministic).
    *
    * If the caller supplies no tiebreak, every ORDERABLE non-key column
    * is appended as an implicit tiebreak so the window order is total:
    * equal `seq` values would otherwise let `row_number` pick a
    * partition-order-dependent (nondeterministic) winner. Unorderable
    * columns (maps) are skipped — rows identical on seq and every
    * orderable column remain tied, and which wins is undefined.
    */
  def lastWins(df: DataFrame, keys: Seq[String], seq: Column,
               tiebreak: Seq[Column] = Nil): DataFrame = {
    val keySet = keys.toSet
    val totalOrder =
      if (tiebreak.nonEmpty) tiebreak
      else df.schema.fields
        .filterNot(f => keySet(f.name))
        .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType))
        .map(f => col(f.name)).toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((seq.desc +: totalOrder.map(_.desc)): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** `existing` merged with `incoming`; incoming wins per key; within
    * incoming, the row with the highest `incomingSeq` wins.
    * Requires identical schemas (use unionByName semantics upstream).
    *
    * `incomingSeq` must be >= 0 (existing rows sit at sequence 0 and any
    * incoming row must outrank them; negative values would let existing
    * rows win and Long.MaxValue would overflow the +1 offset). Violations
    * fail the job at execution rather than silently mis-merging.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             incomingSeq: Column): DataFrame = {
    val seq = incomingSeq.cast("long")
    val checked = when(seq.isNull || seq < 0L || seq === Long.MaxValue,
        raise_error(concat(lit("Upsert.upsert: incomingSeq out of range [0, Long.MaxValue): "),
          seq.cast("string"))))
      .otherwise(seq + 1L)
    val tagged = existing.withColumn("__graft_seq", lit(0L))
      .unionByName(incoming.withColumn("__graft_seq", checked))
    lastWins(tagged, keys, col("__graft_seq")).drop("__graft_seq")
  }
}
