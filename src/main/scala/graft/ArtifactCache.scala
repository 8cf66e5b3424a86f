package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Persistent, cross-JVM cache for expensive deterministic index
  * artifacts, keyed on a CONTENT fingerprint of the corpus files they
  * derive from.
  *
  * The NN-descent graph builds are the bench warm-up's critical path
  * (~35-50 s each at sf0.1) and are pure functions of the read-only
  * embeddings table — at deployment they are the index tables a vector
  * stack maintains and REUSES across jobs; rebuilding them per process
  * models a stack that throws its index away on every restart. Entries
  * live under `target/graft_artifact_cache/<name>_<fingerprint>` so a
  * fresh JVM on unchanged testdata reads parquet instead of rebuilding,
  * while a regenerated corpus (the driver reshuffles testdata between
  * rounds) changes the fingerprint and the stale entry is swept.
  *
  * Publication is build-into-temp + atomic rename on the same
  * filesystem, so concurrent processes race safely: the first rename
  * wins, the loser deletes its temp and reads the winner's entry.
  * Set SPARK_GRAFT_ARTIFACT_CACHE=0 to force per-process scratch builds
  * (the pre-r15 behavior).
  */
object ArtifactCache {

  private val fps = new KeyedMemo[String]

  /** Content fingerprint of the named tables under `dir`: md5 over each
    * table name + file bytes (directory tables hash every file in
    * sorted relative order). Memoized per (dir, tables) — the corpus is
    * read-only for the life of the process.
    */
  def fingerprint(dir: String, tables: Seq[String]): String =
    fps.getOrBuild(dir + "|" + tables.sorted.mkString(",")) {
      val md = java.security.MessageDigest.getInstance("MD5")
      tables.sorted.foreach { t =>
        md.update(t.getBytes("UTF-8"))
        val p = Paths.get(dir, s"$t.parquet")
        if (Files.isRegularFile(p)) md.update(Files.readAllBytes(p))
        else if (Files.isDirectory(p)) {
          import scala.jdk.CollectionConverters._
          val walk = Files.walk(p)
          val files =
            try walk.iterator().asScala
              .filter(Files.isRegularFile(_)).toSeq
              .sortBy(f => p.relativize(f).toString)
            finally walk.close()
          files.foreach { f =>
            md.update(p.relativize(f).toString.getBytes("UTF-8"))
            md.update(Files.readAllBytes(f))
          }
        }
      }
      md.digest().map("%02x".format(_)).mkString.take(16)
    }

  private def enabled: Boolean =
    !sys.env.get("SPARK_GRAFT_ARTIFACT_CACHE").contains("0")

  private def cacheRoot: Path =
    Paths.get(sys.props.getOrElse("user.dir", "."),
      "target", "graft_artifact_cache")

  private val Marker = "_GRAFT_COMPLETE"

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory && !Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** A readable path for artifact `name` derived from `tables` under
    * `dir`: the cached entry if one exists for the current corpus
    * fingerprint, else `build(tmpPath)` runs, the completed temp is
    * atomically published, and stale entries of the same (name, dir)
    * slot (older fingerprints — i.e. regenerated testdata) are swept.
    * The slot carries the CORPUS DIR: entries for sf0.01 and sf0.1
    * coexist (both corpora are live), and the sweep matches the exact
    * `name_dirkey_<16-hex>` shape so `nng`'s sweep can never eat
    * `nng_ins`'s entries (the r15 prefix-collision bug: the first
    * bench after a Verify at another SF rebuilt all three graphs).
    * With the cache disabled the build lands in per-process scratch
    * exactly as before.
    *
    * `version` is a bump-on-change tag for the BUILDER code: the cache
    * outlives the JVM, so an edited build procedure must change the
    * entry name or a rerun silently reuses the stale artifact (and the
    * mismatch surfaces later as a confusing oracle failure). It is
    * hashed into the fingerprint suffix, so a version bump both misses
    * the old entry and sweeps it as stale.
    */
  def getOrBuild(name: String, dir: String, tables: Seq[String],
      version: String = "1")(build: String => Unit): String = {
    if (!enabled) {
      val p = s"${Scratch.dir}/graft_art_${Scratch.runToken}_$name"
      build(p)
      return p
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update((fingerprint(dir, tables) + "|v" + version).getBytes("UTF-8"))
    val fp = md.digest().map("%02x".format(_)).mkString.take(16)
    val dirKey = dir.replaceAll("[^A-Za-z0-9]", "").takeRight(12)
    val slot = s"${name}_$dirKey"
    val dest = cacheRoot.resolve(s"${slot}_$fp")
    if (Files.exists(dest.resolve(Marker))) return dest.toString
    Files.createDirectories(cacheRoot)
    // sweep only this slot's older-fingerprint entries (exact shape),
    // plus orphaned temp dirs a crashed/thrown build left behind (the
    // tmp name embeds a per-process runToken, so no later process would
    // ever reuse or rename them — without this they leak forever). The
    // 2h-idle guard (Scratch's convention) keeps a CONCURRENT process's
    // live build untouched.
    val stale = s"^${java.util.regex.Pattern.quote(slot)}_[0-9a-f]{16}$$".r
    val orphanCutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    Option(cacheRoot.toFile.listFiles()).foreach(_.foreach { f =>
      if ((stale.matches(f.getName) &&
        f.getName != dest.getFileName.toString) ||
        (f.getName.startsWith(".tmp_") &&
          !f.getName.contains(Scratch.runToken) &&
          f.lastModified() < orphanCutoff))
        deleteRecursively(f)
    })
    val tmp = cacheRoot.resolve(s".tmp_${Scratch.runToken}_${slot}_$fp")
    deleteRecursively(tmp.toFile)
    try build(tmp.toString)
    catch {
      case e: Throwable =>
        deleteRecursively(tmp.toFile)
        throw e
    }
    Files.write(tmp.resolve(Marker), Array.empty[Byte])
    try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException |
           _: java.nio.file.FileSystemException =>
        // a concurrent process published first — use its entry
        deleteRecursively(tmp.toFile)
        require(Files.exists(dest.resolve(Marker)),
          s"artifact cache race left no complete entry at $dest")
    }
    dest.toString
  }

  /** [[getOrBuild]] for builders that STAGE into scratch first (the
    * Lloyd trainers materialize per-round intermediates and only the
    * final round is the artifact): `stage` runs only on a cache miss
    * (or with the cache disabled, reproducing the per-process scratch
    * behavior exactly) and returns the finished scratch tree, which is
    * copied into the published entry. Keeps each builder's existing
    * body untouched — the adapter is the only cache-aware line.
    */
  def publishStaged(name: String, dir: String, tables: Seq[String],
      version: String = "1")(stage: => String): String =
    if (!enabled) stage
    else getOrBuild(name, dir, tables, version) { tmp =>
      Scratch.copyTree(Paths.get(stage), Paths.get(tmp))
    }
}
