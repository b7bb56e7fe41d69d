package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the library surface): times the
  * stages of l5 pair generation to direct optimization. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.core.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    @volatile var stages = List.empty[(Int, Int, Long)] // id, tasks, ms
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        stages ::= ((i.stageId, i.numTasks, ms))
      }
    })
    def t(name: String)(f: => Long): Unit = {
      stages = Nil
      val t0 = System.nanoTime(); val n = f
      val tot = (System.nanoTime() - t0) / 1e9
      val st = stages.reverse.map { case (id, nt, ms) => s"$id(${nt}t ${ms}ms)" }.mkString(" ")
      System.err.println(f"[prof] $name%-22s $tot%7.3f s rows=$n%-8d stages=${stages.size} $st")
    }
    graft.ops.TextOps.queries("l3_word_freq")(s, d).count() // warm-up
    for (_ <- 1 to 2) {
      t("l5 full") { graft.ops.TextOps.queries("l5_jaccard_pairs")(s, d).count() }
      t("l5e full") { graft.ops.TextOps.queries("l5e_dedup_groups")(s, d).count() }
    }
    s.stop()
  }
}
