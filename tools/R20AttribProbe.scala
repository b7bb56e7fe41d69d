// r20 second-decade exponent attribution for the four CONFIRMED flags the
// breadth pass surfaced (each re-measured once per the standing rule and
// STAYED above 1.05): l5_jaccard_pairs 1.22→1.15, l28_containment
// 1.18→1.32, l33_edit_dedup 1.59→1.22, t3_session_window 1.40→1.27.
//
// Question (the l28b/l34 question, third time around): is a PLAN term
// growing faster than the data, or is it the one-JVM tier environment?
// Method (L28bPhaseProbe receipts, generalized): run each flagged query at
// the SAME 320-partition setting on the 10x and 100x tiers — one dir per
// JVM invocation, min-of-2 — and record wall + executor CPU + GC + spill +
// shuffle-write from a stage listener, PLUS the deterministic
// candidate-volume counts the pair family's cost is driven by:
//   pair_volume = Σ_shingle C(df, 2)  over the SAME hashed 3-gram stream
//   all three text queries block on (TextOps.shingleRows over
//   documentsWide), and blocked_pairs(>=5 shared) for l33's gate.
// Linear CPU + linear candidates + superlinear wall = environment (the
// l28b_gc.json verdict class); superlinear CPU or candidates names a real
// plan term.
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.R20AttribProbe /tmp/graft_sf1 320 10x
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.R20AttribProbe /tmp/graft_sf100 320 100x
package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object R20AttribProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val np = args.lift(1).getOrElse("320").toInt
    val label = args.lift(2).getOrElse("tier")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new AtomicLong; val shW = new AtomicLong
    val gcMs = new AtomicLong; val cpuNs = new AtomicLong; val runMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        shW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        gcMs.addAndGet(m.jvmGCTime)
        cpuNs.addAndGet(m.executorCpuTime)
        runMs.addAndGet(m.executorRunTime)
      }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    spark.conf.set("spark.sql.shuffle.partitions", np)

    var out = List.empty[String]
    def timed(name: String): Unit = {
      val fn = graft.SparkEntry.queries(name)
      case class R(dt: Double, n: Long, spillMb: Long, shWMb: Long,
        gcS: Double, cpuS: Double, runS: Double)
      def once(): R = {
        spill.set(0); shW.set(0); gcMs.set(0); cpuNs.set(0); runMs.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        R(dt, n, spill.get / 1048576, shW.get / 1048576,
          gcMs.get / 1e3, cpuNs.get / 1e9, runMs.get / 1e3)
      }
      val a = once(); val b = once()
      val m = if (a.dt <= b.dt) a else b
      println(f"$name%-22s wall=${m.dt}%7.2f s  rows=${m.n}%9d  cpu=${m.cpuS}%8.1f s " +
        f"run=${m.runS}%8.1f s  gc=${m.gcS}%6.1f s  spill=${m.spillMb}%6d MB  shW=${m.shWMb}%6d MB" +
        f"  (other run ${math.max(a.dt, b.dt)}%.2f s)")
      out ::= (f""""$name":{"wall":${m.dt}%.2f,"wall_other":${math.max(a.dt, b.dt)}%.2f,""" +
        f""""rows":${m.n},"cpu_s":${m.cpuS}%.1f,"run_s":${m.runS}%.1f,"gc_s":${m.gcS}%.1f,""" +
        s""""spill_mb":${m.spillMb},"shuffle_write_mb":${m.shWMb}}""")
    }

    // deterministic candidate volumes (one pass each, not timed):
    // the shared 3-gram hashed stream all three text flags block on
    val sh = graft.ops.TextOps.shingleRows(
      graft.core.Tables.documentsWide(spark, d), n = 3)
    val pairVol = sh.groupBy(col("s")).agg(count(lit(1)).as("n"))
      .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")).as("pv")).head().getLong(0)
    graft.core.Caches.releaseAll(spark)
    val events = spark.read.parquet(s"$d/events.parquet").count()
    println(s"pair_volume(sum C(df,2))=$pairVol  events=$events")

    Seq("l5_jaccard_pairs", "l28_containment", "l33_edit_dedup",
      "t3_session_window").foreach(timed)

    Files.writeString(Paths.get(s"tools/r20_attrib_$label.json"),
      out.reverse.mkString(
        s"""{"dir":"$d","partitions":$np,"pair_volume":$pairVol,"events":$events,"queries":{""",
        ",", "}}\n"))
    println(s"wrote tools/r20_attrib_$label.json")
    spark.stop()
  }
}
