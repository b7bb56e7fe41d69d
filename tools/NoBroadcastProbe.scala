// Non-broadcast regime probe (VERDICT r14 #6): with
// spark.sql.autoBroadcastJoinThreshold=-1 — the posture a 100 TB
// out-weight table forces — time l26's pageRank with the contribEdges
// hoist ON vs OFF (the measurement-only sys-prop override in
// graft.ops.Graphs.contribEdges), and count the shuffle exchanges in the
// final executed plan. The claim under test: the hoisted, checkpoint-
// preserved src partitioning removes the per-iteration edge-scale
// exchange that the composed (lazy) join re-pays every round.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.NoBroadcastProbe /root/testdata/sf0.1 /tmp/graft_sf1'
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

object NoBroadcastProbe {
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => p.children ++ p.subqueries
    }
    p +: kids.flatMap(collectAll)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def run(d: String, mode: String): (Double, Int) = {
      sys.props("graft.graphs.contrib") = mode
      def one(): (Double, Int) = {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries("l26_pagerank")(spark, d)
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val nx = collectAll(plan).count(_.isInstanceOf[ShuffleExchangeExec])
        graft.core.Caches.releaseAll(spark)
        (dt, nx)
      }
      val (t1, x1) = one(); val (t2, _) = one()
      (math.min(t1, t2), x1)
    }

    val rows = dirs.flatMap { d =>
      Seq("hoist", "lazy").map { m =>
        val (t, nx) = run(d, m)
        println(f"$d%-24s contrib=$m%-5s  t=$t%6.2f s  final-plan exchanges=$nx%d")
        f""""${Paths.get(d).getFileName}:$m":{"t":$t%.2f,"exchanges":$nx%d}"""
      }
    }
    sys.props.remove("graft.graphs.contrib")
    Files.writeString(Paths.get("tools/nobroadcast.json"),
      rows.mkString("""{"autoBroadcastJoinThreshold":-1,"runs":{""", ",", "}}\n"))
    println("wrote tools/nobroadcast.json")
    spark.stop()
  }
}
