// Exploded-broadcast trap sweep (VERDICT r15 #1): loop over EVERY declared
// query, build its DataFrame, and inspect the STATIC (pre-execution) physical
// plan for a BroadcastExchange whose subtree reaches a GenerateExec without
// passing through an aggregate. That is the r15 DecadeRehearsal trap class:
// Catalyst's logical size estimate does not grow through Generate/explode, so
// the static planner broadcasts an exploded side whose true size is corpus-
// scale (l5 measured 343 s broadcast vs 129 s shuffled at 100x; OOM at real
// corpus scale). Runtime (AQE) broadcast conversions are NOT flagged — those
// run off the real exchanged byte size and self-correct at scale — which is
// why the static initial plan, not the final executed plan, is what's swept.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.TrapSweep /root/testdata/sf0.001'
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

object TrapSweep {
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    // QueryStageExec, ReusedExchangeExec, and InMemoryTableScanExec are
    // leaves that HIDE a subtree — recurse into each, or a broadcast above
    // a reused shuffle / cached plan is invisible (ADVICE r16)
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(c.relation.cachedPlan)
      case _ => p.children ++ p.subqueries
    }
    p +: kids.flatMap(collectAll)
  }

  /** A Generate is reachable from here without an intervening aggregate —
    * i.e. the broadcast's size estimate is the pre-explode lie. */
  private def rawExplodeReachable(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => false
    case _: GenerateExec => true
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      rawExplodeReachable(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      rawExplodeReachable(r.child)
    case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      rawExplodeReachable(c.relation.cachedPlan)
    case _ => p.children.exists(rawExplodeReachable)
  }

  def staticTraps(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // initial plan pre-run
      case p => p
    }
    collectAll(plan).collect {
      case b: BroadcastExchangeExec if rawExplodeReachable(b.child) => b
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var hits = List.empty[String]
    var errs = List.empty[String]
    for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val t0 = System.nanoTime()
        val traps = staticTraps(q(spark, sfDir))
        val ms = (System.nanoTime() - t0) / 1e6
        if (traps.nonEmpty) {
          hits ::= name
          println(f"TRAP $name (${traps.size} broadcast(s), $ms%.0f ms)")
          traps.foreach(t => println(t.toString.linesIterator.take(12)
            .map("    " + _).mkString("\n")))
        } else println(f"ok   $name ($ms%.0f ms)")
      } catch {
        case e: Throwable =>
          errs ::= name
          println(s"ERR  $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"SWEEP DONE traps=${hits.sorted.mkString(",")} errs=${errs.sorted.mkString(",")}")
    spark.stop()
    if (hits.nonEmpty || errs.nonEmpty) sys.exit(1)
  }
}
