package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Location, Schemas}

/** CSV ingestion with the reference's by-name header binding
  * (O1-O3 in SURVEY.md §2; `internal/writer/writer.go:74-99`).
  *
  * Semantics preserved from the reference:
  *   - binding is by exact (case-sensitive) header NAME — column order in
  *     the file is irrelevant (`writer.go:86-90`);
  *   - extra, unknown columns are silently ignored (`writer.go:94-98` reads
  *     only the five expected headers);
  *   - ragged rows abort the import (Go csv.Reader's uniform field count;
  *     `writer.go:83`) — mapped to Spark's FAILFAST mode.
  *
  * Divergence by design (SURVEY.md §7.4): a MISSING expected header makes
  * the reference silently read column 0 (`ms["X"]` zero-value). This port
  * fails fast with the list of missing headers instead.
  *
  * Scale: `spark.read.csv` splits large files by range and parses
  * per-partition — the reference's single-goroutine parse becomes N parallel
  * scan tasks, and there is no 120k-row channel bottleneck (O5); Spark's
  * scheduler provides the backpressure.
  */
object CsvIngest {

  /** Read a CSV directory/file binding `header -> canonical` columns by
    * name. Fails fast if any required header is absent.
    */
  def readByName(
      spark: SparkSession,
      path: String,
      binding: Map[String, String],
      order: Seq[String]): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)
    val present = raw.columns.toSet
    val missing = binding.keys.filterNot(present).toSeq.sorted
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"missing required CSV headers: ${missing.mkString(", ")} " +
          s"(present: ${raw.columns.sorted.mkString(", ")})")
    val canonicalToHeader = binding.map(_.swap)
    raw.select(order.map(c => col(canonicalToHeader(c)).as(c)): _*)
  }

  /** The reference's `locations` CSV shape, as a typed Dataset. */
  def readLocations(spark: SparkSession, path: String): Dataset[Location] = {
    import spark.implicits._
    readByName(spark, path, Schemas.headerToCanonical,
      Schemas.locations.fieldNames.toIndexedSeq).as[Location]
  }
}
