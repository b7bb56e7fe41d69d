// Second-decade exponent ATTRIBUTION probe (VERDICT r15 #3): the r15
// DecadeRehearsal measured e2 ~ 1.07-1.12 for the window/CC-family picks
// (l49, l5f, l46b, l40) — mildly superlinear from 10x to 100x. But that e2
// was computed across a PARTITION-SETTING change: the 10x tier ran at the
// production 32 shuffle partitions, the 100x tier at 320 (32 OOMs there).
// This probe isolates the variable: re-time the 10x tier at BOTH 32 and
// 320 partitions, and the 100x tier at 320, then report
//   e2_mixed = ln(t100@320 / t10@32)  / ln 10   (what DecadeRehearsal prints)
//   e2_pure  = ln(t100@320 / t10@320) / ln 10   (same setting both tiers)
// plus per-run spill totals (a SparkListener sum) — if e2_pure ~ 1.0 and
// t10@320 > t10@32, the "superlinear" term is the 320-partition fixed
// overhead per round (tasks x iterations), not a growing data term; if
// spill appears only at 100x, it's memory pressure instead.
// Writes tools/decade_attrib.json.
//   SPARK_DRIVER_MEM=64g sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//     'runMain graft.tools.DecadeAttrib'
package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object DecadeAttrib {
  def main(args: Array[String]): Unit = {
    val d10 = args.headOption.getOrElse("/tmp/graft_sf1")
    val d100 = args.lift(1).getOrElse("/tmp/graft_sf100")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new AtomicLong; val shuffleW = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val picks: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "l49_dedup_keep_best" -> graft.SparkEntry.queries("l49_dedup_keep_best"),
      "l5f_dedup_apply" -> graft.SparkEntry.queries("l5f_dedup_apply"),
      "l46b_kcore_deep" -> graft.SparkEntry.queries("l46b_kcore_deep"),
      "l40_label_prop" -> graft.SparkEntry.queries("l40_label_prop"))
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    // (dir, partitions) cells; min-of-2 like DecadeRehearsal
    val cells = Seq((d10, 32), (d10, 320), (d100, 320))
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        d: String): (Double, Long, Long) = {
      spill.set(0); shuffleW.set(0)
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(spark)
      (dt, spill.get, shuffleW.get)
    }
    var done = List.empty[String]
    def flush(): Unit = Files.writeString(Paths.get("tools/decade_attrib.json"),
      done.reverse.mkString("""{"cells":["10x@32","10x@320","100x@320"],"queries":{""",
        ",", "}}\n"))
    picks.foreach { case (name, fn) =>
      val rs = cells.map { case (d, np) =>
        spark.conf.set("spark.sql.shuffle.partitions", np)
        val a = time(fn, d); val b = time(fn, d)
        if (a._1 <= b._1) a else b
      }
      def e(tb: Double, ts: Double) = math.log(tb / ts) / math.log(10.0)
      val eMixed = e(rs(2)._1, rs(0)._1); val ePure = e(rs(2)._1, rs(1)._1)
      println(f"$name%-22s t10@32=${rs(0)._1}%7.2f t10@320=${rs(1)._1}%7.2f " +
        f"t100@320=${rs(2)._1}%8.2f  e2_mixed=$eMixed%5.2f e2_pure=$ePure%5.2f" +
        f"  spill(MB)=${rs.map(_._2 / 1048576).mkString("/")}")
      done ::= (f""""$name":{"t":[${rs(0)._1}%.2f,${rs(1)._1}%.2f,${rs(2)._1}%.2f],""" +
        s""""spill_mb":[${rs.map(_._2 / 1048576).mkString(",")}],""" +
        s""""shuffle_write_mb":[${rs.map(_._3 / 1048576).mkString(",")}],""" +
        f""""e2_mixed":$eMixed%.2f,"e2_pure":$ePure%.2f}""")
      flush()
    }
    println("wrote tools/decade_attrib.json")
    spark.stop()
  }
}
