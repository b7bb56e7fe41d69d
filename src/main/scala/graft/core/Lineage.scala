package graft.core

import org.apache.spark.sql.DataFrame

/** Dual-posture lineage cut for an intermediate read by MULTIPLE
  * consumers in one query (iteration base tables, a shared aggregate
  * feeding two branches): without a cut each consumer re-executes the
  * upstream subplan — only the shuffle files are reused, the post-shuffle
  * work runs once per consumer.
  *
  *  - checkpoint dir set (cluster): reliable `checkpoint` — recomputation
  *    after executor loss bottoms out at files, never replays the
  *    multi-consumer lineage.
  *  - no checkpoint dir (local / test): `localCheckpoint` — blocks live
  *    outside the CacheManager, reclaimed by [[Caches.releaseAll]] at the
  *    harness's quiescent points (or ContextCleaner GC on the server
  *    path), never pinned for the JVM lifetime.
  */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
