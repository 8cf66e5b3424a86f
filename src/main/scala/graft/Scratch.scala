package graft

/** Scratch-space root for roundtrip temp files and Spark local dirs.
  *
  * This host's disk is IO-throttled (bench runs showed load-average
  * spikes with 97% idle CPU and rising iowait — shuffle-heavy queries
  * degraded 10× while compute-bound ones didn't). Routing scratch
  * traffic to tmpfs decouples the engine's measurements from disk
  * contention; on hosts without /dev/shm it falls back to the normal
  * tmpdir.
  */
object Scratch {

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  val dir: String = {
    val root =
      if (new java.io.File("/dev/shm").isDirectory)
        new java.io.File("/dev/shm/graft-scratch")
      else new java.io.File(System.getProperty("java.io.tmpdir"))
    root.mkdirs()
    // tmpfs is RAM: without cleanup every harness JVM leaks its
    // token-suffixed roundtrip files forever. Two layers: (a) this JVM
    // removes its own graft_* dirs on exit; (b) on startup, sweep
    // entries a crashed JVM left behind — but only ones idle > 2h, so a
    // concurrently running harness process is never touched.
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    Option(root.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith("graft") && f.lastModified() < cutoff)
        deleteRecursively(f)
    })
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      Option(root.listFiles()).foreach(_.foreach { f =>
        if (f.getName.contains(RefQueries.runToken)) deleteRecursively(f)
      })))
    root.getAbsolutePath
  }
}
