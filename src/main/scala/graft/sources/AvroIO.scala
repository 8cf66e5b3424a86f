package graft.sources

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal Avro container-file source/sink over the Avro core library.
  *
  * The `spark-avro` connector module is not on this deployment's
  * classpath (only `avro`/`avro-mapred` ship with the distribution), so
  * the remaining mainstream lake format rides a small purpose-built
  * pair: a per-partition `DataFileWriter` sink and a file-parallel
  * `binaryFiles` → `DataFileStream` source. Both sides go through the
  * Hadoop FileSystem API, so any Hadoop-visible store works.
  *
  * Scale shape: the sink writes one container file per Spark partition
  * (embarrassingly parallel, no driver funnel); the source parallelizes
  * at FILE granularity — the Avro container's sync-marker sub-file
  * splitting is intentionally not reimplemented here, so a deployment
  * sizes files to ~shuffle-partition volume (the standard
  * one-file-per-partition layout this sink produces does exactly that).
  *
  * Type surface (the engine's corpus types): long/int/double/float/
  * boolean/string plus TIMESTAMP as the Avro `timestamp-micros` logical
  * type — Spark's own internal representation, so the round-trip is
  * value-exact with no calendar arithmetic. Nullable fields map to
  * `union(null, T)`. Nested types are out of scope (the reference
  * format matrix is flat rows).
  */
object AvroIO {

  private[graft] def avroSchemaFor(st: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case TimestampType =>
        val s = Schema.create(Schema.Type.LONG)
        org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
      case TimestampNTZType =>
        val s = Schema.create(Schema.Type.LONG)
        org.apache.avro.LogicalTypes.localTimestampMicros().addToSchema(s)
      case other =>
        throw new IllegalArgumentException(s"AvroIO: unsupported type $other")
    }
    val fields = st.fields.map { f =>
      val base = prim(f.dataType)
      val sch =
        if (f.nullable) Schema.createUnion(
          java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Spark TimestampType micros (the engine's internal clock) from the
    * external java.sql.Timestamp row value — millis + sub-milli nanos.
    */
  private def toMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** TIMESTAMP_NTZ external value (java.time.LocalDateTime) ↔ micros. */
  private def ntzToMicros(ldt: java.time.LocalDateTime): Long =
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      ldt.getNano / 1000L

  private def ntzFromMicros(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  /** Generation-numbered part-file name: `part-PPPPP-of-NNNNN-gGGGGG.avro`.
    * Carrying the partition COUNT in every name makes a generation's
    * completeness checkable from the listing alone (all N pids present),
    * and the generation number orders writes without any clock.
    */
  private val PartName = raw"part-(\d+)-of-(\d+)-g(\d+)\.avro".r

  private def partName(pid: Int, n: Int, gen: Int): String =
    f"part-$pid%05d-of-$n%05d-g$gen%05d.avro"

  /** One Avro container file per partition under `path` (a directory).
    * Empty partitions still emit a (header-only) file so a round-trip of
    * an empty frame keeps its schema; a ZERO-partition frame gets one
    * driver-written header-only file for the same reason.
    *
    * Crash-safe generational commit: the job writes the next generation
    * as `*.avro.tmp`, and only after it SUCCEEDS does the driver rename
    * exactly this generation's files in and then delete the older
    * generations. [[read]] picks the newest COMPLETE generation (all
    * `NNNNN` pids present), so every crash window is covered:
    *   - mid-job failure: commit never runs, old generation intact;
    *   - crash mid-rename: new generation incomplete → read still picks
    *     the old one (its deletes haven't started);
    *   - crash mid-delete: both generations complete → read picks the new
    *     (higher) one; leftovers are swept by the next write's commit.
    * Orphaned `*.avro.tmp` files from a failed job are deleted at the
    * START of the next write (tmps are never live data), so they can
    * never be renamed in as phantom rows by a later commit.
    * Re-writing with fewer partitions cannot leave stale files, and
    * write(read(path).transform(...), path) is safe — the old
    * generation is still present while the lazy job reads it.
    */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st, "row").toString
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    val dirPath = new Path(path)
    // sweep orphaned tmps from any previously FAILED write before this
    // job starts — they are dead data and must never reach a commit
    if (fs.exists(dirPath))
      fs.listStatus(dirPath).map(_.getPath)
        .filter(_.getName.endsWith(".avro.tmp"))
        .foreach(p => fs.delete(p, false))
    // next generation = 1 + highest generation present (legacy unnumbered
    // part files count as generation 0)
    val gen: Int = (if (fs.exists(dirPath))
      fs.listStatus(dirPath).map(_.getPath.getName).collect {
        case PartName(_, _, g) => g.toInt
      }.foldLeft(0)(math.max)
    else 0) + 1
    def commit(n: Int): Unit = {
      // phase 1: rename exactly THIS job's files in (pid 0 until n)
      (0 until n).foreach { pid =>
        val src = new Path(dirPath, partName(pid, n, gen) + ".tmp")
        val dest = new Path(dirPath, partName(pid, n, gen))
        require(fs.rename(src, dest), s"AvroIO: rename $src -> $dest failed")
      }
      // phase 2 (the new generation is now complete): delete every older
      // .avro — prior generations, legacy names, partials of crashed runs
      fs.listStatus(dirPath).map(_.getPath)
        .filter { p =>
          p.getName.endsWith(".avro") && (p.getName match {
            case PartName(_, _, g) => g.toInt != gen
            case _ => true
          })
        }
        .foreach(p => fs.delete(p, false))
    }
    val rdd = df.rdd
    if (rdd.getNumPartitions == 0) {
      val schema = new Schema.Parser().parse(schemaJson)
      val out = fs.create(new Path(path, partName(0, 1, gen) + ".tmp"), true)
      new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema)).create(schema, out)
        .close()
      commit(1)
      return
    }
    val nParts = rdd.getNumPartitions
    rdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fs = FileSystem.get(
        new java.net.URI(path), new Configuration())
      val out = fs.create(new Path(path, partName(pid, nParts, gen) + ".tmp"), true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema)).create(schema, out)
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < st.length) {
          val v = row.get(i)
          rec.put(i,
            if (v == null) null
            else st.fields(i).dataType match {
              case TimestampType => toMicros(v.asInstanceOf[java.sql.Timestamp])
              case TimestampNTZType =>
                ntzToMicros(v.asInstanceOf[java.time.LocalDateTime])
              case _ => v
            })
          i += 1
        }
        w.append(rec)
      } finally w.close()
      Iterator.empty
    }.count()
    commit(nParts)
  }

  /** File-parallel read of a [[write]]-produced directory: the newest
    * COMPLETE generation (see [[write]]'s commit protocol). The schema
    * comes from the first container file's own header (every file
    * embeds it), mapped back to the StructType; files decode
    * independently, one task each.
    */
  def read(s: SparkSession, path: String): DataFrame = {
    val conf = new Configuration()
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val avros = fs.listStatus(new Path(path)).map(_.getPath)
      .filter(_.getName.endsWith(".avro"))
    val byGen = avros.flatMap { p =>
      p.getName match {
        case PartName(pid, n, g) => Some((g.toInt, n.toInt, pid.toInt, p))
        case _ => None
      }
    }.groupBy(_._1)
    val complete = byGen.filter { case (_, fsOfGen) =>
      val n = fsOfGen.head._2
      fsOfGen.map(_._3).distinct.length == n
    }
    // fallback must read ONLY legacy unnumbered files: a crash-torn
    // partial generation (present in byGen but never complete) is NOT
    // data — mixing it with legacy rows (or returning it alone on a
    // fresh directory) would silently serve duplicates/partials. If
    // generation-numbered files exist but no generation is complete
    // and no legacy set exists, the directory holds no consistent
    // snapshot — fail loudly.
    val legacy =
      avros.filter(p => !PartName.pattern.matcher(p.getName).matches())
    val parts: Array[Path] =
      if (complete.nonEmpty)
        complete.maxBy(_._1)._2.sortBy(_._3).map(_._4)
      else legacy.sortBy(_.getName) // legacy unnumbered layout only
    require(parts.nonEmpty,
      if (byGen.nonEmpty)
        s"AvroIO.read: only an INCOMPLETE generation exists under $path " +
          "(crash before the first commit finished) — no consistent " +
          "snapshot to read"
      else s"AvroIO.read: no .avro files under $path")
    val first = new DataFileStream[GenericRecord](
      fs.open(parts.head), new GenericDatumReader[GenericRecord]())
    val avroSchema = try first.getSchema finally first.close()
    val st = StructType(avroSchema.getFields.asScala.map { f =>
      def dt(sch: Schema): (DataType, Boolean) = sch.getType match {
        case Schema.Type.UNION =>
          val nonNull = sch.getTypes.asScala
            .filter(_.getType != Schema.Type.NULL)
          (dt(nonNull.head)._1, true)
        case Schema.Type.LONG
          if sch.getLogicalType != null &&
            sch.getLogicalType.getName == "timestamp-micros" =>
          (TimestampType, false)
        case Schema.Type.LONG
          if sch.getLogicalType != null &&
            sch.getLogicalType.getName == "local-timestamp-micros" =>
          (TimestampNTZType, false)
        case Schema.Type.LONG => (LongType, false)
        case Schema.Type.INT => (IntegerType, false)
        case Schema.Type.DOUBLE => (DoubleType, false)
        case Schema.Type.FLOAT => (FloatType, false)
        case Schema.Type.BOOLEAN => (BooleanType, false)
        case Schema.Type.STRING => (StringType, false)
        case other =>
          throw new IllegalArgumentException(s"AvroIO: unsupported $other")
      }
      val (t, n) = dt(f.schema())
      StructField(f.name(), t, n)
    }.toArray)
    val stJson = st.json
    val rows = s.sparkContext.binaryFiles(parts.map(_.toString).mkString(","))
      .flatMap { case (_, pds) =>
        val st = DataType.fromJson(stJson).asInstanceOf[StructType]
        val in = new DataFileStream[GenericRecord](
          pds.open(), new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = in.hasNext
            if (!h) in.close()
            h
          }
          def next(): Row = {
            val rec = in.next()
            Row.fromSeq(st.fields.indices.map { i =>
              val v = rec.get(i)
              if (v == null) null
              else st.fields(i).dataType match {
                case StringType => v.toString
                case TimestampType => fromMicros(v.asInstanceOf[Long])
                case TimestampNTZType => ntzFromMicros(v.asInstanceOf[Long])
                case _ => v
              }
            })
          }
        }
      }
    s.createDataFrame(rows, st)
  }
}
