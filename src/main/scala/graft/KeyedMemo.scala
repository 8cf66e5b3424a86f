package graft

/** Per-key build-once memo with double-checked locking. The model-artifact
  * builders (IVF/PQ codebooks, pair tables, k-NN graphs) were memoized as
  * `synchronized { map.getOrElseUpdate }` on one object — correct, but the
  * OBJECT lock serializes independent builds, so the bench warm-up could
  * not overlap them. This holds a lock per key instead: concurrent callers
  * of DIFFERENT artifacts build in parallel; concurrent callers of the SAME
  * artifact still build exactly once and share the result.
  *
  * CONTRACT for concurrent callers: the builders behind these memos toggle
  * SESSION confs around their eager actions (`Confs.withConf`, e.g. AQE
  * off for Lloyd loops). The old object lock incidentally serialized those
  * toggles; per-key locks do NOT. Concurrent builds of different keys are
  * therefore only safe when each caller drives its OWN SparkSession —
  * `warmTraining` hands every branch a `newSession()` child for exactly
  * this reason. Do not fan builders out over one shared session (the
  * save/set/restore pairs interleave and a foreign conf value can be
  * "restored" permanently). Sequential callers — the gates, Verify, the
  * serially-executed test suites — are unaffected.
  */
final class KeyedMemo[V] {
  private val vals = new java.util.concurrent.ConcurrentHashMap[String, V]()
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def getOrBuild(key: String)(build: => V): V = {
    val v = vals.get(key)
    if (v != null) v
    else locks.computeIfAbsent(key, _ => new Object).synchronized {
      val v2 = vals.get(key)
      if (v2 != null) v2
      else {
        val r = build
        vals.put(key, r)
        r
      }
    }
  }
}
