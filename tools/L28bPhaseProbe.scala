// l28b_containment_dedup second-decade attribution (r18): the first decade
// row for l28b measured e2_pure = 1.30 at fixed 320 partitions (7.4 s at
// 10x -> 146.5 s at 100x, fresh JVM per cell, multi-file fixture) — the
// table's only exponent above 1.01 after the r17 fixture fix, so the l34
// question repeats: is a term of THIS plan growing faster than the data,
// or is it the one-JVM environment again? Candidate volume is linear by
// construction (token salting keeps copies' shingle spaces disjoint, so
// cross-copy candidates are zero and within-copy structure repeats), and
// l28b — unlike l5 — runs the containment self-join with NO df cap, so the
// within-copy hot-shingle df² term is the prime suspect: constant per copy,
// but its join buckets all land in ONE JVM's hash tables here.
//
// Method (the L34PhaseProbe pattern): time each cumulative prefix of the
// plan at the SAME fixed setting, min-of-2, with per-phase spill /
// shuffle-write / GC / CPU / run totals from a stage listener. Linear CPU +
// superlinear wall = environment; superlinear CPU names the plan term.
// Run once per dir in its own JVM:
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L28bPhaseProbe /tmp/graft_sf1 320
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L28bPhaseProbe /tmp/graft_sf100 320
package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

object L28bPhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val np = args.lift(1).getOrElse("320").toInt
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
    def t(label: String)(body: => Long): Unit = {
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
      println(f"  $label%-34s ${r.dt}%8.2f s  rows=${r.n}%-12d " +
        f"spill=${r.spill / 1048576}%5d MB  shuffleW=${r.shW / 1048576}%5d MB" +
        f"  gc=${r.gcS}%7.1f s  cpu=${r.cpuS}%8.1f s  run=${r.runS}%8.1f s")
    }
    println(s"== l28b phases at $d (shuffle.partitions=$np)")
    val docs = graft.core.Tables.documentsWide(spark, d)
    // inline twins of the TextOps private helpers: tokenize + 3-gram
    // shingles (array_distinct per doc, short-doc fallback) + xxhash64 key,
    // exactly shingleRows' shape; each phase RE-materializes the checkpoint
    // the way containmentPairsFrames does, so phase deltas include its cost
    def sh = docs.withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(t) >= 3 THEN array_distinct(transform(" +
          "sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))" +
          " ELSE array(array_join(t, ' ')) END")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    // every body is SELF-CONTAINED (plan constructed inside): min-of-2 ends
    // each run with Caches.releaseAll, which drops localCheckpoint blocks —
    // a frame shared across runs dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
    // (the L7IndexProbe lesson, re-learned here on the first attempt)
    def pairsOf(src: org.apache.spark.sql.DataFrame) = src
      .select(col("doc_id").as("da"), col("s"))
      .join(src.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .where(col("da") =!= col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    def withTau(src: org.apache.spark.sql.DataFrame) = {
      val sizes = src.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      pairsOf(src)
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
        .where(col("inter") / col("na") >= 0.6)
    }
    t("scan+tokenize+shingle+hash")(sh.count())
    t("+localCheckpoint (materialize)")(
      sh.localCheckpoint(eager = true).count())
    t("ckpt: self-join +(da,db) agg")(
      pairsOf(sh.localCheckpoint(eager = true)).count())
    t("ckpt: +sizes joins +tau (pairs)")(
      withTau(sh.localCheckpoint(eager = true)).count())
    // the l5 posture twin: ONE s-keyed exchange reused by all consumers —
    // shuffle files instead of 26M deserialized row objects in the heap
    t("repart(s): self-join +agg")(
      pairsOf(sh.repartition(col("s"))).count())
    t("repart(s): +sizes +tau (pairs)")(
      withTau(sh.repartition(col("s"))).count())
    t("full l28b (declared)")(
      graft.SparkEntry.queries("l28b_containment_dedup")(spark, d).count())
    spark.stop()
  }
}
