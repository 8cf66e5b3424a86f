package graft.model

import org.apache.spark.sql.types._

/** The reference's single record type.
  *
  * Mirrors `internal/model/model.go:5-12` of elijah688/file-stream-import:
  * a UUID surrogate id plus five TEXT business columns keyed by `locid`
  * (UNIQUE, `internal/db/db.go:86`). The surrogate id is generated at write
  * time (`gen_random_uuid()`, `db.go:85`) and is deliberately NOT part of
  * this case class: the import path never supplies it (`db.go:48`), and it
  * must stay out of oracle-checked output (nondeterministic).
  */
final case class Location(
    locid: String,
    loctimezone: String,
    country: String,
    locname: String,
    business: String
)

object Schemas {

  /** Canonical lower-case business schema of the `locations` table
    * (`internal/db/db.go:83-91`, minus the surrogate `id`).
    */
  val locations: StructType = StructType(Seq(
    StructField("locid", StringType, nullable = false),
    StructField("loctimezone", StringType),
    StructField("country", StringType),
    StructField("locname", StringType),
    StructField("business", StringType)
  ))

  /** Exact upper-case CSV header the reference emits and binds by name
    * (`cmd/gen_file/main.go:38`, `internal/writer/writer.go:86-99`).
    * Binding is by header NAME, order-independent; extra columns ignored.
    */
  val csvHeader: Seq[String] =
    Seq("LOCID", "LOCTIMEZONE", "COUNTRY", "LOCNAME", "BUSINESS")

  /** header (uppercase) -> canonical column name */
  val headerToCanonical: Map[String, String] =
    csvHeader.map(h => h -> h.toLowerCase).toMap
}
