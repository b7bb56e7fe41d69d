// l34_source_overlap second-decade attribution (VERDICT r16 #4): the only
// pair-family member never individually probed. The r17 fresh-JVM-per-cell
// rehearsal measured e2_pure = 1.39 at fixed 320 partitions (3.4 s at 10x
// -> 84 s at 100x), so the growth is NOT the JVM-age or partition-setting
// artifact — something in the plan grows faster than the data. The plan's
// phases: tokenize -> 3-gram shingle explode -> join doc source ->
// DISTINCT (source, h) -> self-join on h -> source-pair count. This times
// each cumulative prefix at the SAME fixed setting on one dir, with
// per-phase spill/shuffle-write totals from a stage listener, so the
// growing term names itself. Run once per dir in its own JVM:
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L34PhaseProbe /tmp/graft_sf1 320
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L34PhaseProbe /tmp/graft_sf100 320
package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object L34PhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val np = args.lift(1).getOrElse("320").toInt
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new AtomicLong; val shW = new AtomicLong
    // gc/cpu/run: if wall grows superlinearly while task CPU stays linear,
    // the term is the one-JVM environment (GC, memory-bandwidth, scheduler
    // stalls) — exactly what a cluster with proportional resources doesn't
    // pay; if CPU itself grows superlinearly, the plan has a real term
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
    def t(label: String)(body: => Long): Unit = {
      // min-of-2 like the rehearsal cells
      case class R(dt: Double, n: Long, spill: Long, shW: Long,
        gcS: Double, cpuS: Double, runS: Double)
      def once(): R = {
        spill.set(0); shW.set(0); gcMs.set(0); cpuNs.set(0); runMs.set(0)
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        R(dt, n, spill.get, shW.get, gcMs.get / 1e3, cpuNs.get / 1e9,
          runMs.get / 1e3)
      }
      val a = once(); val b = once()
      val r = if (a.dt <= b.dt) a else b
      println(f"  $label%-30s ${r.dt}%8.2f s  rows=${r.n}%-10d " +
        f"spill=${r.spill / 1048576}%5d MB  shuffleW=${r.shW / 1048576}%5d MB" +
        f"  gc=${r.gcS}%7.1f s  cpu=${r.cpuS}%8.1f s  run=${r.runS}%8.1f s")
    }
    println(s"== l34 phases at $d (shuffle.partitions=$np)")
    val docs = graft.core.Tables.documentsWide(spark, d)
    // inline twins of the TextOps private helpers (tokenize + 3-shingle)
    def tokd = docs.withColumn("t", split(col("text"), " "))
    def shingled = tokd.select(col("doc_id"), explode(expr(
      "CASE WHEN size(t) >= 3 THEN array_distinct(transform(" +
        "sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))" +
        " ELSE array(array_join(t, ' ')) END")).as("s"))
    def ss = shingled
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), xxhash64(col("s")).as("h")).distinct()
    t("scan+tokenize (sum tokens)")(
      tokd.select(sum(size(col("t"))).as("n")).head().getLong(0))
    t("+shingle explode")(shingled.count())
    t("+source join +distinct (ss)")(ss.count())
    t("+self-join on h +pair agg") {
      ss.select(col("source").as("sa"), col("h"))
        .join(ss.select(col("source").as("sb"), col("h")), Seq("h"))
        .where(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_shared")).count()
    }
    t("full l34 declared")(graft.ops.TextOps.l34SourceOverlap(spark, d).count())
    spark.stop()
  }
}
