package graft.tools

import org.apache.spark.sql.SparkSession

/** Judge-round probe: run a named subset of SparkEntry.queries and print
  * pass/fail + the first exception line. Deleted after the round. */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.core.Sessions.tune(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(s"PROBE $n OK rows=$c secs=${(System.nanoTime()-t0)/1e9}")
      } catch { case e: Throwable =>
        println(s"PROBE $n FAIL ${e.getClass.getName}: ${String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ")}")
      }
      graft.core.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
