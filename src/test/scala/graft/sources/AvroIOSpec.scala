package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroIOSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"${graft.Scratch.dir}/avro_spec_${graft.Scratch.runToken}_$name"

  private val st = StructType(Seq(
    StructField("l", LongType, nullable = true),
    StructField("i", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("nts", TimestampNTZType, nullable = true)))

  test("full type surface round-trips value-exactly, including nulls") {
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456")
    val ntz = java.time.LocalDateTime.of(1999, 12, 31, 23, 59, 59, 999999000)
    val rows = Seq(
      Row(1L, 2, 3.5, 4.25f, true, "héllo", ts, ntz),
      Row(null, null, null, null, null, null, null, null),
      Row(Long.MinValue, Int.MaxValue, -0.0, Float.NaN, false, "", ts, ntz))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), st)
    val path = tmp("types")
    AvroIO.write(df, path)
    val back = AvroIO.read(spark, path)
    assert(back.schema == st, s"schema drifted: ${back.schema}")
    val got = back.collect().sortBy(r => if (r.isNullAt(0)) Long.MaxValue
      else r.getLong(0))
    val want = rows.sortBy(r => if (r.get(0) == null) Long.MaxValue
      else r.getLong(0))
    // NaN != NaN under ==; compare via string form of each cell
    assert(got.map(_.toString).toSeq == want.map(_.toString),
      s"values drifted:\n${got.mkString("\n")}\nvs\n${want.mkString("\n")}")
  }

  test("empty partitions keep the schema on read-back") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, 1, 1.0, 1.0f, true, "x",
        null, null)), 4), st) // 4 partitions, 1 row: 3 header-only files
    val path = tmp("empty")
    AvroIO.write(df, path)
    val back = AvroIO.read(spark, path)
    assert(back.schema == st)
    assert(back.count() == 1)
  }

  test("re-writing with fewer partitions leaves no stale files behind") {
    val path = tmp("rewrite")
    def frame(ids: Seq[Long], parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.map(i => Row(i, 1, 1.0, 1.0f, true, "x", null, null)), parts), st)
    AvroIO.write(frame(1L to 8L, 8), path)
    AvroIO.write(frame(Seq(42L), 1), path) // fewer partitions: 1 file
    val back = AvroIO.read(spark, path)
    assert(back.count() == 1, "stale part files re-read as duplicate rows")
    assert(back.collect().head.getLong(0) == 42L)
  }

  test("write(read(path)...) back to the SAME path is safe (two-phase commit)") {
    val path = tmp("selfwrite")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 6L).map(i => Row(i, 1, 1.0, 1.0f, true, "x", null, null)), 3),
      st)
    AvroIO.write(df, path)
    // the lazy job reads the existing .avro files while writing .tmp;
    // the old set is only swapped out after the job succeeds
    AvroIO.write(AvroIO.read(spark, path).filter("l % 2 = 0"), path)
    val back = AvroIO.read(spark, path).collect().map(_.getLong(0)).sorted
    assert(back.toSeq == Seq(2L, 4L, 6L), s"self-rewrite corrupted: ${back.toSeq}")
  }

  test("zero-partition frame still writes a schema-bearing file") {
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], st) // 0 partitions
    assert(df.rdd.getNumPartitions == 0)
    val path = tmp("zeropart")
    AvroIO.write(df, path)
    val back = AvroIO.read(spark, path)
    assert(back.schema == st)
    assert(back.count() == 0)
  }

  test("orphaned .tmp files from a FAILED write are never committed as data") {
    val path = tmp("orphan")
    def frame(ids: Seq[Long], parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.map(i => Row(i, 1, 1.0, 1.0f, true, "x", null, null)), parts), st)
    AvroIO.write(frame(1L to 4L, 4), path)
    // simulate a failed 8-partition write that died mid-job: its tmps are
    // on disk, commit never ran — copy a real container file under tmp
    // names so the bytes would decode if ever (wrongly) renamed in
    val dir = new java.io.File(path)
    val donor = dir.listFiles().filter(_.getName.endsWith(".avro")).head
    (5 to 7).foreach { pid =>
      java.nio.file.Files.copy(donor.toPath,
        new java.io.File(dir, f"part-$pid%05d-of-00008-g00009.avro.tmp").toPath)
    }
    // a later SUCCESSFUL 1-partition write must not resurrect them
    AvroIO.write(frame(Seq(42L), 1), path)
    val back = AvroIO.read(spark, path).collect().map(_.getLong(0)).toSeq
    assert(back == Seq(42L), s"orphan tmps leaked back as rows: $back")
    assert(!dir.listFiles().exists(_.getName.endsWith(".avro.tmp")),
      "orphan tmps survived the next write")
  }

  test("crash mid-commit: an INCOMPLETE newer generation is ignored on read") {
    val path = tmp("midcommit")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 3L).map(i => Row(i, 1, 1.0, 1.0f, true, "x", null, null)), 3), st)
    AvroIO.write(df, path)
    // simulate a crash between rename k=0 and k=1 of a 2-partition commit:
    // one file of generation 99 exists, its sibling never landed
    val dir = new java.io.File(path)
    val donor = dir.listFiles().filter(_.getName.endsWith(".avro")).head
    java.nio.file.Files.copy(donor.toPath,
      new java.io.File(dir, "part-00000-of-00002-g00099.avro").toPath)
    val back = AvroIO.read(spark, path).collect().map(_.getLong(0)).sorted.toSeq
    assert(back == Seq(1L, 2L, 3L),
      s"read picked an incomplete generation: $back")
  }

  test("legacy fallback never mixes in a crash-torn partial generation") {
    val path = tmp("legacymix")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 3L).map(i => Row(i, 1, 1.0, 1.0f, true, "x", null, null)), 1), st)
    AvroIO.write(df, path)
    val dir = new java.io.File(path)
    val generated = dir.listFiles().filter(_.getName.endsWith(".avro")).head
    // legacy unnumbered layout + a partial (never-completed) generation
    java.nio.file.Files.copy(generated.toPath,
      new java.io.File(dir, "legacy-part-0.avro").toPath)
    java.nio.file.Files.move(generated.toPath,
      new java.io.File(dir, "part-00000-of-00002-g00007.avro").toPath)
    val back = AvroIO.read(spark, path).collect().map(_.getLong(0)).sorted.toSeq
    assert(back == Seq(1L, 2L, 3L),
      s"fallback mixed a torn generation into legacy data: $back")
  }

  test("a torn FIRST generation with no prior data fails loudly") {
    val path = tmp("tornfirst")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, 1, 1.0, 1.0f, true, "x", null, null)), 1), st)
    AvroIO.write(df, path)
    val dir = new java.io.File(path)
    val generated = dir.listFiles().filter(_.getName.endsWith(".avro")).head
    // leave ONLY an incomplete generation behind
    java.nio.file.Files.move(generated.toPath,
      new java.io.File(dir, "part-00000-of-00002-g00001.avro").toPath)
    val e = intercept[IllegalArgumentException](AvroIO.read(spark, path))
    assert(e.getMessage.contains("INCOMPLETE generation"), e.getMessage)
  }

  test("unsupported types fail loudly at write time") {
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(1, 2)))),
      StructType(Seq(StructField("a", ArrayType(IntegerType)))))
    val e = intercept[IllegalArgumentException] {
      AvroIO.write(bad, tmp("bad"))
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
