package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Debug probe (test scope — never ships in the production jar): run a
  * named subset of SparkEntry.queries and print pass/fail + the first
  * exception lines. `sbt "Test/runMain graft.tools.JudgeProbe <sfDir> [q ...]"` */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: JudgeProbe <sfDir> [queryName ...]  (no names = all)")
      sys.exit(2)
    }
    val sfDir = args.head
    val names = if (args.tail.nonEmpty) args.tail.toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(s"PROBE $n OK rows=$c secs=${(System.nanoTime()-t0)/1e9}")
      } catch { case NonFatal(e) =>
        println(s"PROBE $n FAIL ${e.getClass.getName}: ${String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ")}")
      }
      graft.core.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
