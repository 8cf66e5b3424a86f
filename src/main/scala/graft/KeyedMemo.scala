package graft

/** Per-key build-once memo with double-checked locking. The model-artifact
  * builders (IVF/PQ codebooks, pair tables, k-NN graphs) were memoized as
  * `synchronized { map.getOrElseUpdate }` on one object — correct, but the
  * OBJECT lock serializes independent builds, so the bench warm-up could
  * not overlap them. This holds a lock per key instead: concurrent callers
  * of DIFFERENT artifacts build in parallel; concurrent callers of the SAME
  * artifact still build exactly once and share the result.
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
