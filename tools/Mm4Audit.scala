// mm4 rare-set join audit at 10x/100x (VERDICT r15 #5): mm4's frame table
// is explode→distinct, so every join input sits above an aggregate's
// shuffle boundary — the static through-Generate estimate never directly
// feeds a broadcast (TrapSweep is clean on mm4). The open question was the
// `rare` semi join and the pair self-join at scale: if a broadcast build
// side is chosen off RUNTIME stats (AQE re-optimization after the
// aggregate stage materializes), it self-corrects as the corpus grows; if
// off the static estimate, it's the l5 trap. This prints, per tier, the
// FINAL executed joins with their build-side stage shapes plus wall time,
// so the answer is an artifact instead of an argument.
//   SPARK_DRIVER_MEM=64g sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//     'runMain graft.tools.Mm4Audit /tmp/graft_sf1 /tmp/graft_sf100'
package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

object Mm4Audit {
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children ++ p.subqueries
    }
    p +: kids.flatMap(collectAll)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/tmp/graft_sf1", "/tmp/graft_sf100")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    dirs.zip(Seq(32, 320)).foreach { case (d, np) =>
      spark.conf.set("spark.sql.shuffle.partitions", np)
      val df = graft.ops.MultiModal.mm4FrameDup(spark, d)
      val t0 = System.nanoTime()
      // collect(), NOT count(): count() builds its own QueryExecution, so
      // df.queryExecution would still hold the UNEXECUTED static plan and
      // the join dump would show the pre-AQE shapes (first r16 run did)
      val n = df.collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      println(f"== mm4 at $d (partitions=$np): $dt%.2f s, $n rows")
      if (sys.env.contains("GRAFT_MM4_FULLPLAN")) println(plan.toString)
      collectAll(plan).foreach {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          // a ShuffleQueryStage under the broadcast exchange = the size
          // AQE decided on was MEASURED (a completed shuffle's runtime
          // stats), not the static through-Generate estimate
          val stageBacked = collectAll(build).exists {
            case _: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => true
            case _ => false
          }
          println(s"  BroadcastHashJoin(${j.joinType}) runtimeStatsBacked=$stageBacked " +
            s"build=${build.toString.linesIterator.next().take(90)}")
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          println(s"  ShuffledHashJoin(${j.joinType})")
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          println(s"  SortMergeJoin(${j.joinType})")
        case _ => ()
      }
      graft.core.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
