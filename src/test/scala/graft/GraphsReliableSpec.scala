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

  test("pageRank: exact values on a hand-computed chain, mass and base-rank properties") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a → b → c (unit weights), d=0.85, 3 iterations, pr0 = 1/3:
    //   a never receives: pr(a) = 0.15/3 = 0.05 after every iteration
    //   b: it1 0.05+0.85/3, it2 0.05+0.85·0.05 = 0.0925, it3 same = 0.0925
    //   c: it3 0.05+0.85·0.0925 = 0.128625
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val got = graft.ops.Graphs.pageRank(edges, 0.85, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 0.05) < 1e-9, got.toString)
    assert(math.abs(got("b") - 0.0925) < 1e-9, got.toString)
    assert(math.abs(got("c") - 0.128625) < 1e-9, got.toString)
    // declared graph: mass stays in (1-d, 1] (dangling suppliers leak
    // mass through the damping term only), sources sit at the base rank
    val pr = graft.ops.Graphs.l26PageRank(spark, sfDir)
    val mass = pr.agg(sum(col("pr"))).head().getDouble(0)
    assert(mass > 0.15 && mass <= 1.0 + 1e-6, s"PageRank mass $mass out of range")
    val nN = pr.count()
    val base = pr.where(col("node").startsWith("c"))
      .agg(max(abs(col("pr") - lit(0.15) / nN))).head().getDouble(0)
    assert(base < 1e-8, s"customers (no in-edges) must sit at the base rank: $base")
  }

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
