// Round-22 optimization evidence: dump `.explain("formatted")` for the
// queries under optimization into plans/r22/<name>_<tag>.txt. Run via:
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.R22Plans before q1,q2,...'
// Batch queries only — a streaming query's Q function executes the replay
// at construction time and returns a memory-sink table, so its "plan" here
// would just be a LocalTableScan (those are discussed in OPTIMIZATION_r22.md
// prose instead).
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

object R22Plans {
  /** Pseudo-queries: named internal frames whose build plan a declared
    * query hides behind an eager localCheckpoint (the explain of the
    * declared query shows only the checkpoint scan). */
  private val internal: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("cooccur_edges" -> ((s, d) => graft.ops.Graphs.coOccurrenceAdjPlan(s, d)))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R22Plans <tag> <q1,q2,...>")
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val s = graft.core.Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get("plans/r22"))
    names.foreach { n =>
      val df = internal.get(n)
        .map(f => f(s, d))
        .getOrElse(graft.SparkEntry.queries(n)(s, d))
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"plans/r22/${n}_$tag.txt"), plan)
      println(s"wrote plans/r22/${n}_$tag.txt (${plan.length} chars)")
      graft.core.Caches.releaseAll(s)
    }
    s.stop()
  }
}
