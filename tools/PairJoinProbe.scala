// Stage-level profile of the l5 inverted-index pair join at one dir —
// the DecadeRehearsal/DedupProbe r15 finding: candidate volume is exactly
// linear (sum df^2: 27.9M at 10x -> 279M at 100x, max df 25 at both) yet
// wall time grows 36x for 10x data. This prints per-stage duration,
// shuffle read/write, and SPILL so the pathology names itself.
//   SPARK_DRIVER_MEM=64g sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//     'runMain graft.tools.PairJoinProbe /tmp/graft_sf100'
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object PairJoinProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf100")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", "320").toInt
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    // runtime-settable (Sessions.tune pins 32MB at build time); "keep"
    // leaves the session default in place
    sys.env.get("SPARK_GRAFT_PROBE_BROADCAST").filter(_ != "keep")
      .foreach(v => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        def mb(v: Long) = f"${v / 1048576.0}%.0fMB"
        println(f"  stage ${i.stageId}%3d ${i.numTasks}%4d tasks " +
          f"${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0}%7.1fs" +
          s"  in=${mb(m.inputMetrics.bytesRead)}" +
          s" sr=${mb(m.shuffleReadMetrics.totalBytesRead)}" +
          s" sw=${mb(m.shuffleWriteMetrics.bytesWritten)}" +
          s" memSpill=${mb(m.memoryBytesSpilled)} diskSpill=${mb(m.diskBytesSpilled)}" +
          s"  [${i.name.takeWhile(_ != '\n').take(60)}]")
      }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    println(s"== pair join at $d (shuffle.partitions=$parts)")
    val t0 = System.nanoTime()
    val n = graft.ops.TextOps.l5JaccardPairs(spark, d).count()
    println(f"total ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
    spark.stop()
  }
}
