package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Small-file compaction for a hive-partitioned parquet layout — the
  * nightly maintenance op every 100 TB table runs: streaming/incremental
  * writers leave partitions as swarms of tiny files, every subsequent
  * scan pays per-file open/footer/schedule overhead, and the fix is to
  * rewrite each partition's data into ceil(bytes / targetBytes) files
  * without changing a single row.
  *
  * Scale shape: the per-partition rewrite is a distributed read +
  * coalesce + write; only the partition-directory walk is driver-side,
  * and partition COUNT (not data size) bounds it. Rewrites swap files
  * within the partition directory, so concurrent readers of other
  * partitions are never touched — the same touched-partitions-only
  * discipline as the copy-on-write merge (`LakeQueries.mergedOrders`).
  */
object Compaction {

  /** Parquet data files directly under `dir` (no dot-files, no _SUCCESS). */
  def dataFiles(dir: Path): Seq[Path] = {
    val st = Files.list(dir)
    try st.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    finally st.close()
  }

  /** Hive-style `col=value` partition directories under `root`. */
  def partitionDirs(root: Path): Seq[Path] = {
    val st = Files.list(root)
    try st.iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      .toSeq
    finally st.close()
  }

  private def delete(p: Path): Unit = {
    // also drop the LocalFileSystem checksum sibling, if any
    val crc = p.resolveSibling("." + p.getFileName.toString + ".crc")
    Files.deleteIfExists(crc)
    Files.deleteIfExists(p)
  }

  /** Compact every partition of the layout at `root` whose file count
    * exceeds its byte-derived target; partitions already at or under
    * target are left untouched (their files are not rewritten).
    *
    * @return (files before, files after) across all partitions.
    */
  def compactPartitioned(spark: SparkSession, root: String,
      targetBytes: Long): (Int, Int) = {
    var (before, after) = (0, 0)
    partitionDirs(Paths.get(root)).foreach { pd =>
      val files = dataFiles(pd)
      before += files.size
      val bytes = files.map(Files.size(_)).sum
      val k = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (files.size > k) {
        // Rewrite into a sibling temp dir, then stage the new files
        // INTO the partition under dot-prefixed names (invisible to
        // dataFiles and to parquet readers) BEFORE touching the old
        // set, so the visible swap is a handful of same-directory
        // metadata renames — not the distributed rewrite. A concurrent
        // reader of THIS partition can still catch the rename window
        // (each move is atomic; the multi-file swap is not); other
        // partitions are never touched. True snapshot isolation needs
        // a manifest layer above the directory listing.
        val tmp = pd.resolveSibling(pd.getFileName.toString + ".compact_tmp")
        spark.read.parquet(pd.toString).coalesce(k)
          .write.mode("overwrite").parquet(tmp.toString)
        val staged = dataFiles(tmp).map { f =>
          val s = pd.resolve("." + f.getFileName.toString + ".staged")
          Files.move(f, s, StandardCopyOption.ATOMIC_MOVE)
          s -> pd.resolve(f.getFileName.toString)
        }
        files.foreach(delete)
        staged.foreach { case (src, dst) =>
          Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
        }
        val st = Files.walk(tmp)
        try st.iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
        finally st.close()
      }
      after += dataFiles(pd).size
    }
    (before, after)
  }
}
