package graft

import java.nio.file.Files

/** Exercises the connected-components engine's RELIABLE-checkpoint posture
  * — the cluster-mode path (`Graphs.truncate`: persist per round, reliable
  * checkpoint every 3rd, final-round checkpoint move) that the other specs
  * never reach because no checkpoint dir is set in local test sessions.
  *
  * NOTE: SparkContext has no unset for the checkpoint dir, so after this
  * suite runs, concurrently/later CC invocations in this JVM also take the
  * reliable path — semantics are identical (the property spec's
  * union-find equivalence holds for both postures), only the
  * materialization medium changes. */
class GraphsReliableSpec extends SparkSpec {
  test("connected components under a checkpoint dir: chain forces the cadence") {
    val ckptRoot = Files.createTempDirectory("graft_cc_ckpt")
    spark.sparkContext.setCheckpointDir(ckptRoot.toString)
    import spark.implicits._
    // a 12-node chain propagates the min ONE hop per hash-to-min round →
    // ~11 rounds: crosses the every-3rd reliable-checkpoint cadence
    // several times and ends on a non-multiple round, exercising the
    // final checkpoint move + cache unpersist
    val n = 12L
    val ids = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("da", "db")
    val got = graft.ops.Graphs.connectedComponents(ids, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(_ -> 0L).toMap, got.toSeq.sorted.take(5))
    // evidence the reliable path engaged: checkpoint data under the dir
    val walk = Files.walk(ckptRoot)
    val entries = try walk.count() finally walk.close()
    assert(entries > 1, "expected reliable checkpoint files under the dir")
  }
}
