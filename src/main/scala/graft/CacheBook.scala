package graft

import org.apache.spark.sql.Dataset

/** Lifecycle registry for the DataFrames operators cache INTERNALLY
  * (the shared-intermediate caches of `Aggregates.fineRollup`,
  * `Dedup.minhashLshPairs` / `ngramJaccardPairs`, ...): each internal
  * `.cache()` goes through [[cached]] so a long-lived session — a verify
  * or bench loop over many queries, `SqlSurface` re-registration over
  * several directories, a `foreachBatch` micro-batch loop — can drop
  * every accumulated entry with one [[release]] call instead of leaking
  * cache entries unboundedly (each entry pins executor storage memory).
  *
  * Release points are deliberately COARSE: end of a verify/bench run,
  * start of a SqlSurface re-registration, end of a micro-batch. Within a
  * run the entries stay live so Spark's cache manager keeps plan-deduping
  * repeated derivations across queries (q10 reads q09's cached rollup).
  * `unpersist` on a live plan is always safe — a later consumer just
  * recomputes.
  */
object CacheBook {

  private val entries = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Cache `ds` and register it for the next [[release]]. */
  def cached[T](ds: Dataset[T]): Dataset[T] = {
    val c = ds.cache()
    entries.add(c)
    c
  }

  /** Unpersist every registered entry (non-blocking) and clear the book. */
  def release(): Unit = {
    var d = entries.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = entries.poll()
    }
  }

  /** Number of currently registered entries (test visibility). */
  def size: Int = entries.size()
}
