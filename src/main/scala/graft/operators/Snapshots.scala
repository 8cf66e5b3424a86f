package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal manifest-based snapshot store — time travel for a
  * partitioned parquet table without a table format. The idea every
  * production format (Delta/Iceberg/Hudi) shares, stripped to its
  * smallest shape: data files are IMMUTABLE once written, and a
  * version is nothing but a manifest listing which files are live.
  *
  * Layout under one table root:
  * {{{
  *   root/data/c00001/<part=k>/part-*.parquet   — commit 1's new files
  *   root/data/c00002/<part=k>/part-*.parquet   — commit 2's new files
  *   root/_manifests/v00001.txt                  — file list of version 1
  *   root/_manifests/v00002.txt                  — ... (paths rel. to data/)
  * }}}
  *
  * A MERGE that touches only some partitions writes its output as a new
  * commit dir and carries the untouched partitions' file entries forward
  * from the previous manifest — copy-on-write without ever deleting, so
  * every prior version stays readable. COMPACTION is just another
  * commit: rewrite the live file set small-file-free into a new commit
  * dir and publish a manifest of only those files — old versions keep
  * pointing at the old files (removal is a separate vacuum policy, not
  * implemented here: the point of time travel is that cleanup is
  * DECOUPLED from rewrites).
  *
  * Manifest publication is write-temp + atomic rename, so a concurrent
  * reader sees either version N or N+1, never a torn list — the
  * single-atomic-object trick that gives snapshot isolation per table.
  * (Writers are not coordinated here: two concurrent committers could
  * both target v(N+1); production formats arbitrate that rename with a
  * CAS/lock service, which a local filesystem cannot express.)
  *
  * Reads go through one `spark.read.parquet(files*)` per commit dir
  * (each with `basePath` = its commit root so hive partition columns
  * survive explicit-file reads), unioned — at 1000 executors this is
  * the same distributed scan a directory read plans, minus the listing
  * of dead files.
  */
object Snapshots {

  private def manifestDir(root: String): Path = Paths.get(root, "_manifests")
  private def dataDir(root: String): Path = Paths.get(root, "data")

  private def manifestPath(root: String, v: Int): Path =
    manifestDir(root).resolve(f"v$v%05d.txt")

  /** Latest committed version, 0 if none. */
  def latestVersion(root: String): Int = {
    val md = manifestDir(root)
    if (!Files.isDirectory(md)) 0
    else {
      val s = Files.list(md)
      try s.iterator.asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("v\\d{5}\\.txt") =>
          n.substring(1, 6).toInt }
        .foldLeft(0)(math.max)
      finally s.close()
    }
  }

  /** The live file list of a version, paths relative to `root/data`. */
  def manifest(root: String, v: Int): Seq[String] =
    Files.readAllLines(manifestPath(root, v)).asScala.toSeq.filter(_.nonEmpty)

  /** Publish `files` as version `v` — temp write + atomic rename, so a
    * reader never observes a torn manifest.
    */
  private def publish(root: String, v: Int, files: Seq[String]): Unit = {
    Files.createDirectories(manifestDir(root))
    val tmp = manifestDir(root).resolve(f".v$v%05d.txt.tmp")
    Files.write(tmp, files.sorted.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
  }

  /** All parquet files under a commit dir, relative to `root/data`. */
  private def commitFiles(root: String, commit: String): Seq[String] = {
    val base = dataDir(root)
    val s = Files.walk(base.resolve(commit))
    try s.iterator.asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => base.relativize(p).toString)
      .toSeq
    finally s.close()
  }

  /** Write `df` hive-partitioned by `partCol` as the next commit,
    * keeping every entry of the previous manifest for which `carry`
    * holds (relative path → keep). Returns the new version number.
    * `carry = _ => false` is a full snapshot (initial load, or a
    * compaction rewriting the whole live set); a partition-scoped merge
    * passes `carry = !_.contains(s"$partCol=$touchedValue/")`.
    */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      partCol: String, carry: String => Boolean = _ => false): Int = {
    val prev = latestVersion(root)
    val v = prev + 1
    val commitName = f"c$v%05d"
    df.write.partitionBy(partCol).mode("overwrite")
      .parquet(dataDir(root).resolve(commitName).toString)
    val carried = if (prev == 0) Nil else manifest(root, prev).filter(carry)
    publish(root, v, carried ++ commitFiles(root, commitName))
    v
  }

  /** Read one version: the manifest's files, grouped per commit dir so
    * each group's `basePath` lets Spark parse the hive partition column
    * out of the path segment, unioned by name.
    *
    * `allowMissingColumns = true` is the SCHEMA-EVOLUTION seam: a later
    * commit may add a column the carried-forward files never had (or a
    * full-history read may union commits from before and after the
    * addition), and the union null-fills the absent side — exactly the
    * add-column evolution contract of the production table formats.
    * Files within ONE commit dir always share a schema (single write),
    * so the fill only ever happens at commit granularity.
    */
  def read(spark: SparkSession, root: String, v: Int): DataFrame = {
    val base = dataDir(root)
    val files = manifest(root, v)
    // a commit of an empty DataFrame writes no parquet files and can carry
    // nothing — fail as loudly as the missing-manifest case instead of
    // letting the reduce below throw an opaque UnsupportedOperationException
    if (files.isEmpty)
      throw new IllegalStateException(
        s"snapshot version $v of $root has an empty manifest (no data files);" +
          " cannot infer a schema for an empty-version read")
    files
      .groupBy(_.takeWhile(_ != '/'))
      .toSeq.sortBy(_._1)
      .map { case (commitName, files) =>
        spark.read
          .option("basePath", base.resolve(commitName).toString)
          .parquet(files.map(f => base.resolve(f).toString): _*)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Retention: delete every data file not referenced by any manifest
    * with version ≥ `retainFrom`, and drop the expired manifests so a
    * time-travel read below the retention floor fails LOUDLY (missing
    * manifest) instead of silently reading a partial file set. This is
    * the vacuum step every table format pairs with time travel — the
    * deletes that merges and compactions deliberately never do.
    * Returns (files deleted, files kept). Safe relative to readers of
    * retained versions: their manifests' files are never touched.
    */
  def vacuum(root: String, retainFrom: Int): (Int, Int) = {
    val latest = latestVersion(root)
    require(retainFrom >= 1 && retainFrom <= latest,
      s"retainFrom $retainFrom outside committed range [1, $latest]")
    val live = (retainFrom to latest).flatMap(v => manifest(root, v)).toSet
    val base = dataDir(root)
    val walk = Files.walk(base)
    val all =
      try walk.iterator.asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => base.relativize(p).toString)
        .toSeq
      finally walk.close()
    val dead = all.filterNot(live)
    dead.foreach(f => Files.delete(base.resolve(f)))
    (1 until retainFrom).foreach(v =>
      Files.deleteIfExists(manifestPath(root, v)))
    // prune directories the deletes emptied (bottom-up: deepest first)
    val dirs = Files.walk(base)
    try dirs.iterator.asScala
      .filter(p => Files.isDirectory(p) && p != base)
      .toSeq.sortBy(-_.getNameCount)
      .foreach { d =>
        val s = Files.list(d)
        val empty = try !s.iterator.hasNext finally s.close()
        if (empty) Files.delete(d)
      }
    finally dirs.close()
    (dead.size, live.size)
  }

  /** Compaction as a commit: rewrite the whole live set of the latest
    * version to one file per partition value and publish it as a full
    * snapshot. `repartition(partCol)` hash-clusters each value into
    * exactly one task (tasks run partition-parallel), so the
    * partitioned write emits one file per value. Values are invariant;
    * every older version remains readable because nothing is deleted.
    */
  def compactCommit(spark: SparkSession, root: String,
      partCol: String): Int = {
    val live = read(spark, root, latestVersion(root))
      .repartition(org.apache.spark.sql.functions.col(partCol))
    commit(spark, root, live, partCol)
  }
}
