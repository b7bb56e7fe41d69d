package graft.core

import org.apache.spark.sql.SparkSession

/** Explicit release of query-scoped cached state.
  *
  * Several operators materialize an intermediate once per invocation
  * (eager `localCheckpoint` of sketch/LSH indexes, the CC engine's
  * per-round truncation) because multiple consumers of the subplan would
  * otherwise recompute it. Those blocks live OUTSIDE the CacheManager, so
  * nothing pins them — but reclamation is ContextCleaner-driven, i.e. it
  * waits for a JVM GC to notice the dropped RDD reference. On a large heap
  * GC is rare, so a harness that runs hundreds of queries back-to-back
  * accumulates dead storage blocks that compete with execution memory in
  * Spark's unified manager: later queries pay eviction/spill for earlier
  * queries' garbage (round-4 driver bench: o3_topk_global 6.1 s on the
  * driver vs 1.0 s isolated — the o-family runs right after the
  * checkpoint-heavy l-family in alphabetical order).
  *
  * `releaseAll` frees both layers deterministically. It is safe ONLY at a
  * quiescent point — no in-flight query may depend on a localCheckpointed
  * RDD (its lineage is truncated; unpersisting mid-use is unrecoverable).
  * Sequential harnesses (Bench, Verify) call it between queries; the
  * long-lived server intentionally does NOT (steps dispatch
  * asynchronously), relying on ContextCleaner GC instead.
  */
object Caches {
  // Cross-query DataFrame memos (Graphs.coOccurrenceEdges) hold
  // checkpoint-backed frames whose blocks the RDD sweep below destroys;
  // a memo serving such a frame afterwards hands out an unrecomputable
  // plan ("checkpoint block not found"). Owners register their clear()
  // here so release keeps the two layers consistent.
  private val memos = new java.util.concurrent.CopyOnWriteArrayList[() => Unit]
  def registerMemo(clear: () => Unit): Unit = memos.add(clear)

  def releaseAll(s: SparkSession): Unit = {
    memos.forEach(_.apply())
    // Dataset.persist entries (strongly held by the CacheManager)
    s.catalog.clearCache()
    // RDD-level blocks: localCheckpoints and raw RDD persists. Blocking:
    // call sites are quiescent by construction, and async removal would
    // let block-cleanup churn land inside the NEXT query's timed window.
    s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
