// A/B for the r17 packed-long LPA argmax experiment — REJECTED on its own
// measurement (tools/l40_argmax.json; the scaladoc on Graphs.lpaRound
// records the outcome).
//
// Hypothesis: the plan read behind the experiment found l40's per-round
// argmax `max(struct(c, -label))` planned as a SortAggregate (a struct max
// is not hash-aggregable), so each LPA round pays a partial sort + final
// sort over the (node, label, count) rows; embedding the same
// (count desc, label asc) order into ONE signed long
// (`(c << labelBits) | (mask - label)` for non-negative integral ids)
// makes the argmax a codegen'd HashAggregate and was expected to cut the
// 100x tier's sort/agg cost and spill.
//
// Measured (fresh JVM per cell, 320 partitions, /tmp/graft_sf100): the
// STRUCT path won all three pairs — struct 307/124/201 s vs packed
// 347/178/288 s (packed +13%/+43%/+43% within-pair), and packed spilled
// MORE (5.2-5.5 GB vs 3.8-5.1 GB). sf0.1 was a wash (struct 4.57/3.40 vs
// packed 3.61/3.80). The sort was never the bottleneck: the SortAggregate
// consumes its sorted input streaming with bounded memory and hands the
// next round's node-keyed merge join already-sorted output, while the
// hash map adds state on top of already memory-pressured stages and
// forfeits the order. Kept so the rejected posture stays re-measurable.
//
// Method: ONE cell per JVM invocation (the pairjoin.json rule — same-JVM
// sequences invert comparisons), mode and dir from argv, partitions from
// SPARK_GRAFT_PROBE_PARTITIONS. The struct mode is the DECLARED l40 query;
// the packed mode is a twin built here (the rejected path does not live in
// src/). Prints one `CELL {...}` line.
//   SPARK_DRIVER_MEM=64g SPARK_GRAFT_PROBE_PARTITIONS=320 \
//     tools/run.sh graft.tools.L40ArgmaxProbe /tmp/graft_sf100 packed
package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object L40ArgmaxProbe {

  /** The packed-long twin of Graphs.labelPropagation (rounds = 3): same
    * bidirected edge build, same neighbor-label join and (u, label) count,
    * but the per-node argmax packs (count, label) into one BIGINT so it
    * plans as a HashAggregate. Bit budget: ids are non-negative integrals
    * (l40's partkeys), labels stay in the node-id space, counts are
    * neighbor-list sizes ≤ 2·|edges| — verified to fit 63 bits below. */
  private def packedLpa(edges: DataFrame, rounds: Int): DataFrame = {
    val bi = edges.select(col("sa").as("u"), col("sb").as("v"))
      .unionByName(edges.select(col("sb").as("u"), col("sa").as("v")))
      .repartition(col("v"))
      .localCheckpoint(eager = true)
    val r = edges.agg(
      min(least(col("sa"), col("sb")).cast("long")),
      max(greatest(col("sa"), col("sb")).cast("long")),
      count(lit(1))).head()
    require(!r.isNullAt(0) && r.getLong(0) >= 0, "packed twin needs non-negative ids")
    val labelBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(r.getLong(1), 1L))
    val countBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(2 * r.getLong(2), 1L))
    require(labelBits + countBits <= 63, s"bit budget blown: $labelBits + $countBits")
    val mask = (1L << labelBits) - 1
    var labels = bi.select(col("u").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to rounds) {
      labels = bi
        .join(labels.select(col("node").as("v"), col("lab").as("nlab")), Seq("v"))
        .groupBy(col("u"), col("nlab")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(shiftleft(col("c"), labelBits)
          .bitwiseOR(lit(mask) - col("nlab").cast("long"))).as("m"))
        .select(col("u").as("node"),
          (lit(mask) - col("m").bitwiseAND(lit(mask))).as("lab"))
    }
    labels.select(col("node"), col("lab").as("community"))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("struct") // struct (declared) | packed
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_PROBE_PARTITIONS")
      .foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p.toInt))
    val spill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    // same warmup as every probe: JIT + parquet footer caches off the clock
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    // co-occurrence build off the clock for BOTH modes (memoized eager
    // checkpoint); each mode pays its own bidirected-edge materialization
    // inside the timed section, symmetrically
    val edges = graft.ops.Graphs.coOccurrenceEdges(spark, d)
    spill.set(0)
    val t0 = System.nanoTime()
    val n =
      if (mode == "packed") packedLpa(edges, rounds = 3).count()
      else graft.SparkEntry.queries("l40_label_prop")(spark, d).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"""CELL {"dir":"$d","mode":"$mode","partitions":${
      spark.conf.get("spark.sql.shuffle.partitions")},"sec":$dt%.2f,""" +
      f""""spill_mb":${spill.get / 1048576},"rows":$n}""")
    spark.stop()
  }
}
