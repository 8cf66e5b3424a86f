package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.Location

class CsvIngestSpec extends SparkSpec {

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_csv_test")
    Files.writeString(dir.resolve("part.csv"), lines.mkString("\n"))
    dir.toString
  }

  test("binds columns by header name, independent of column order") {
    // Header order differs from the canonical LOCID,LOCTIMEZONE,... order.
    val path = writeCsv(
      "COUNTRY,LOCID,BUSINESS,LOCNAME,LOCTIMEZONE",
      "USA,LOC1,TechCorp_1,Springfield_1,UTC")
    val got = CsvIngest.readLocations(spark, path).collect().toSeq
    assert(got === Seq(Location("LOC1", "UTC", "USA", "Springfield_1", "TechCorp_1")))
  }

  test("extra unknown columns are ignored") {
    val path = writeCsv(
      "LOCID,LOCTIMEZONE,COUNTRY,LOCNAME,BUSINESS,UNKNOWN_EXTRA",
      "LOC1,UTC,USA,Springfield_1,TechCorp_1,garbage")
    val got = CsvIngest.readLocations(spark, path).collect().toSeq
    assert(got === Seq(Location("LOC1", "UTC", "USA", "Springfield_1", "TechCorp_1")))
  }

  test("missing required header fails fast (reference silently misbinds)") {
    val path = writeCsv(
      "LOCID,LOCTIMEZONE,LOCNAME,BUSINESS", // COUNTRY absent
      "LOC1,UTC,Springfield_1,TechCorp_1")
    val e = intercept[IllegalArgumentException] {
      CsvIngest.readLocations(spark, path)
    }
    assert(e.getMessage.contains("COUNTRY"))
  }

  test("header match is exact — lowercase headers do not bind") {
    val path = writeCsv(
      "locid,loctimezone,country,locname,business",
      "LOC1,UTC,USA,Springfield_1,TechCorp_1")
    intercept[IllegalArgumentException] {
      CsvIngest.readLocations(spark, path)
    }
  }

  test("empty file (header only) yields zero rows") {
    val path = writeCsv("LOCID,LOCTIMEZONE,COUNTRY,LOCNAME,BUSINESS")
    assert(CsvIngest.readLocations(spark, path).count() === 0)
  }
}
