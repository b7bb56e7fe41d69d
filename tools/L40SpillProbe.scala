// l40 100x spill attribution (VERDICT r16 #3): decade_attrib measured ~7 GB
// of spill for l40_label_prop at the 100x tier (320 partitions, one 64 GB
// JVM) with e2_pure 1.16 — plausibly single-JVM memory pressure, but that
// run can't separate "cluster memory scales" (a real deployment has ~10x
// the aggregate executor memory at 100x the data, so the spill never
// happens) from "the per-round (node,label) aggregate needs a smaller key
// space per task" (a plan defect partitioning must fix). The separating
// experiment: rerun the SAME 100x tier at 640 shuffle partitions — per-task
// aggregate state halves. If spill collapses and the time recovers toward
// linear, the term is per-task memory pressure that horizontal scale (more
// tasks or more memory) absorbs; if spill persists, the aggregate itself
// has a growing term. Writes tools/l40_spill.json.
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L40SpillProbe
package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object L40SpillProbe {
  def main(args: Array[String]): Unit = {
    val d100 = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new AtomicLong; val peakSpill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val s = m.memoryBytesSpilled + m.diskBytesSpilled
        spill.addAndGet(s)
        peakSpill.accumulateAndGet(s, Math.max(_, _))
      }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    val fn = graft.SparkEntry.queries("l40_label_prop")
    def once(np: Int): (Double, Long, Long) = {
      spark.conf.set("spark.sql.shuffle.partitions", np)
      spill.set(0); peakSpill.set(0)
      val t0 = System.nanoTime()
      fn(spark, d100).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(spark)
      (dt, spill.get, peakSpill.get)
    }
    var done = List.empty[String]
    Seq(320, 640).foreach { np =>
      val a = once(np); val b = once(np)
      val r = if (a._1 <= b._1) a else b
      println(f"l40@$np%-4d t=${r._1}%8.2f s  spill=${r._2 / 1048576}%d MB" +
        f"  peak_stage_spill=${r._3 / 1048576}%d MB")
      done ::= (f""""p$np":{"t":${r._1}%.2f,"spill_mb":${r._2 / 1048576},""" +
        f""""peak_stage_spill_mb":${r._3 / 1048576}}""")
    }
    Files.writeString(Paths.get("tools/l40_spill.json"),
      done.reverse.mkString(s"""{"dir":"$d100","cells":{""", ",", "}}\n"))
    println("wrote tools/l40_spill.json")
    spark.stop()
  }
}
