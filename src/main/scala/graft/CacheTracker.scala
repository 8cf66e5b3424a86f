package graft

import org.apache.spark.sql.Dataset

/** Registry of DataFrames a query persisted, so the harness can release
  * them once the query's action has completed. Queries are lazy — they
  * can't unpersist inside their own builder (the cache must live until
  * the caller's action runs) — so across a 60-query Verify/Bench session
  * the caches would otherwise pile up and only LRU pressure reclaims
  * them. Verify/Bench call [[releaseAll]] after each query's action.
  */
object CacheTracker {

  private val tracked = scala.collection.mutable.ArrayBuffer[Dataset[_]]()

  /** Persist `ds` and remember it for the next [[releaseAll]]. */
  def persistTracked[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked += ds.persist()
    ds
  }

  /** Unpersist everything tracked since the last call (non-blocking). */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(ds => try ds.unpersist(false) catch { case _: Throwable => () })
    tracked.clear()
  }
}
