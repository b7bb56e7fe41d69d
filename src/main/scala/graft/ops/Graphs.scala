package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the shared engine under every dedup
  * CLUSTERING operator (shingle-Jaccard l5e, embedding-cosine l6b): given
  * an id universe and an undirected pair list, label each id with the
  * smallest id reachable from it.
  *
  * Algorithm: iterative hash-to-min label propagation. Every id starts as
  * its own label; each round every id takes the minimum label in its
  * neighborhood; converged when no label changes. Rounds are O(graph
  * diameter) (near-dup components are shallow), each round one shuffle on
  * the id — the standard large-scale CC loop, all DataFrame ops. Lineage
  * is truncated every third round: reliable checkpoint when the context
  * has a checkpoint dir (executor-loss recovery at cluster scale),
  * localCheckpoint as the zero-setup local fallback.
  */
object Graphs {

  /** @param ids   one column `id` — the full vertex universe (singletons
    *              keep their own id as component)
    * @param pairs two columns `da`, `db` — undirected edges
    * @return columns `id`, `component` (= min reachable id) */
  def connectedComponents(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val s = ids.sparkSession
    val edges = pairs.select(col("da"), col("db")).unionByName(
      pairs.select(col("db").as("da"), col("da").as("db"))).persist()
    var labels = ids.select(col("id"), col("id").as("component")).persist()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      val neighborMin = edges
        .join(labels.select(col("id").as("db"), col("component").as("nc")), Seq("db"))
        .groupBy(col("da")).agg(min(col("nc")).as("nmin"))
      var next = labels
        .join(neighborMin.select(col("da").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
      next = if (round % 3 == 0) {
        if (s.sparkContext.getCheckpointDir.isDefined) next.checkpoint(eager = true)
        else next.localCheckpoint(eager = true)
      } else next.persist()
      changed = next.join(labels.select(col("id"), col("component").as("old")), Seq("id"))
        .where(col("component") =!= col("old")).count()
      labels.unpersist(blocking = false)
      labels = next
    }
    edges.unpersist(blocking = false)
    // the final labels STAY cached: their lineage is the whole iteration
    // chain, and the caller's action would otherwise replay every round
    labels
  }
}
