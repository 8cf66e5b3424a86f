package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.{Queries, RefQueries}
import graft.model.Schemas
import graft.operators.Upsert
import graft.sources.Gen

/** Driver-gated Structured Streaming query: the reference's flagship
  * ingest path (CSV files → keyed last-write-wins upsert,
  * `internal/writer/writer.go:40-129`) run THROUGH the streaming engine
  * (`readStream` → `foreachBatch` → parquet) and oracle-checked against
  * the same DuckDB SQL as the batch twin `ref_ingest_dedup` — a green
  * hash row here proves batch/stream equivalence under the gate, not
  * just in unit tests.
  */
object StreamQueries {
  import Queries.Q

  /** locations + the explicit sequence column the upsert orders on. */
  private val seqSchema: StructType =
    StructType(Schemas.locations.fields :+ StructField("seq", LongType))

  /** Distinct scratch dirs per invocation: a rerun in the same JVM must
    * not hit a checkpoint that says the input files were already done.
    */
  private val invocation = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stage a DataFrame as ONE named CSV file inside the stream's input
    * dir (the file-stream source discovers loose files, not the
    * directory-per-write layout `DataFrameWriter.csv` produces).
    */
  private def stageCsv(df: org.apache.spark.sql.DataFrame, inDir: String,
                       name: String): Unit = {
    val staging = s"$inDir/_staging_$name"
    Gen.writeCsv(df.coalesce(1), staging)
    val listing = Files.list(Paths.get(staging))
    val part =
      try listing.toArray.map(_.toString).filter(p => p.endsWith(".csv")).head
      finally listing.close()
    Files.move(Paths.get(part), Paths.get(s"$inDir/$name.csv"))
  }

  /** Same corpus and same expected result as `ref_ingest_dedup`, but the
    * rows travel as CSV files through a streaming query: two files (base
    * batch seq=1, duplicate-key batch seq=2) land in a watched dir, the
    * stream runs to completion with `Trigger.AvailableNow`, each
    * micro-batch upserts into parquet, and the final read merges the
    * accumulated batches. Because per-batch winners keep their data
    * `seq`, the result is identical whether the source saw one batch or
    * ten — the property that makes the plan replay-safe at scale.
    */
  val streamIngestDedup: Q = (s, _) => {
    val root = s"${graft.Scratch.dir}/graft_stream_" +
      s"${RefQueries.runToken}_${invocation.incrementAndGet()}"
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
    Files.createDirectories(Paths.get(in))
    stageCsv(Gen.locations(s, 1000).withColumn("seq", lit(1L)), in, "b1")
    stageCsv(Gen.locations(s, 200)
      .withColumn("business", concat(lit("DUP_"), col("business")))
      .withColumn("seq", lit(2L)), in, "b2")
    Streams.csvUpsertAvailableNow(s, in, out, ck, seqSchema,
      Seq("locid"), "seq").awaitTermination()
    Upsert.lastWins(s.read.schema(seqSchema).parquet(out),
      Seq("locid"), col("seq")).orderBy("locid")
  }

  val all: Map[String, (Q, Option[String])] = Map(
    // the batch twin's oracle IS the contract: stream result == batch result
    "stream_ingest_dedup" -> (streamIngestDedup, Some(RefQueries.ingestDedupSql))
  )
}
