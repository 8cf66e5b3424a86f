package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic `locations` data generator — the Spark-native counterpart of the
  * reference's parallel CSV generator (`cmd/gen_file/main.go:13-91`, O14 in
  * SURVEY.md §2).
  *
  * The reference spawns 5 goroutines, each seeded with wall-clock time, and
  * batches 30 000 rows through a channel to a single CSV writer. On Spark the
  * parallelism is free: `spark.range` is already a distributed, splittable
  * source, and the CSV writer runs one task per partition — no hand-rolled
  * worker pool, no single-writer bottleneck (the reference serializes all
  * output through one goroutine; at 100 TB that single writer IS the
  * pipeline, so this design writes one file per partition instead).
  *
  * Divergence by design (SURVEY.md §7.4): the reference's picks are
  * `rand.Intn`-based and irreproducible run-to-run (`gen_file/main.go:50`).
  * Here every "random" pick is a pure function of the row id, so output is
  * deterministic, oracle-checkable, and identical at any parallelism.
  */
object Gen {

  // Dictionaries observed from the reference (`cmd/gen_file/main.go:21-24`).
  val timezones: Seq[String] = Seq(
    "America/New_York", "Europe/London", "Asia/Tokyo",
    "Australia/Sydney", "America/Los_Angeles", "Europe/Berlin")
  val countries: Seq[String] = Seq(
    "USA", "UK", "Japan", "Australia", "Germany", "Canada")
  val locnames: Seq[String] = Seq(
    "Springfield", "Rivertown", "Lakeside", "Hillview", "Bayport", "Meadowfield")
  val businesses: Seq[String] = Seq(
    "TechCorp", "CoffeeCo", "MarketPlace", "MediHealth", "EduWise", "GreenBuild")

  import org.apache.spark.sql.Column

  private def pick(dict: Seq[String], idx: Column): Column =
    element_at(array(dict.map(lit): _*), (idx % 6).cast("int") + 1)

  /** Deterministic locations table of `n` rows, keyed `LOC%012d` like the
    * reference (`gen_file/main.go:59`). Different columns cycle with
    * different integer-division strides so they are not mutually correlated.
    */
  def locations(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(1, n + 1).select(
      format_string("LOC%012d", $"id").as("locid"),
      pick(timezones, $"id").as("loctimezone"),
      pick(countries, floor($"id" / 7)).as("country"),
      format_string("%s_%d", pick(locnames, floor($"id" / 11)), $"id" % 1000)
        .as("locname"),
      format_string("%s_%d", pick(businesses, floor($"id" / 13)), ($"id" * 7) % 1000)
        .as("business"))
  }

  /** DuckDB SQL producing exactly [[locations]](n) — used as the oracle. */
  def locationsSql(n: Long): String = {
    def l(d: Seq[String]) = d.mkString("['", "', '", "']")
    s"""SELECT printf('LOC%012d', i) AS locid,
       |  (${l(timezones)})[CAST(i % 6 AS INT) + 1] AS loctimezone,
       |  (${l(countries)})[CAST((i // 7) % 6 AS INT) + 1] AS country,
       |  printf('%s_%d', (${l(locnames)})[CAST((i // 11) % 6 AS INT) + 1], i % 1000) AS locname,
       |  printf('%s_%d', (${l(businesses)})[CAST((i // 13) % 6 AS INT) + 1], (i * 7) % 1000) AS business
       |FROM range(1, ${n + 1}) t(i)""".stripMargin
  }

  /** Surrogate UUID primary key (O8 in SURVEY.md §2): the reference lets
    * Postgres default it per row (`gen_random_uuid()`,
    * `internal/db/db.go:85`); Spark-side the same surrogate is the
    * `uuid()` expression. Nondeterministic by nature — MUST stay out of
    * oracle-checked output (SURVEY.md §7.4); tests assert format and
    * uniqueness instead.
    */
  def withSurrogateId(df: DataFrame): DataFrame =
    df.withColumn("id", expr("uuid()"))

  /** CSV sink with the reference's exact header (`gen_file/main.go:38`).
    * One file per partition — scales the write instead of funneling through
    * a single writer goroutine.
    */
  def writeCsv(df: DataFrame, path: String): Unit = {
    val upper = df.columns.map(c => col(c).as(c.toUpperCase))
    df.select(upper.toIndexedSeq: _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }
}
