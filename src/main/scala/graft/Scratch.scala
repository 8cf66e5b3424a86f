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
  val dir: String =
    if (new java.io.File("/dev/shm").isDirectory) {
      val d = new java.io.File("/dev/shm/graft-scratch")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
}
