// Two-decade scale rehearsal (r15): the 10x growth table answers "does
// the plan survive one order of magnitude"; this tool answers the harder
// question the 100 TB posture actually rests on — is the growth EXPONENT
// STABLE across decades, or does a fixed cost that dominated at 10x hide
// a super-linear term that only shows at 100x? Runs a representative
// subset of the most expensive batch operators at sf0.1, the 10x dir,
// and the 100x dir (both ScaleFixture-synthesized), and records per-tier
// wall times plus per-decade exponents e1 = ln(t10/t1)/ln(10),
// e2 = ln(t100/t10)/ln(10) to tools/growth_decades.json (DumpPlans
// renders it into PLANS.md next to the single-decade table).
//   SPARK_DRIVER_MEM=32g sbt \
//     'set Compile/unmanagedSourceDirectories += file("tools")' \
//     'runMain graft.tools.DecadeRehearsal /root/testdata/sf0.1 /tmp/graft_sf1 /tmp/graft_sf100'
// (build the dirs first with graft.tools.ScaleFixture, factors 10 / 100)
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

object DecadeRehearsal {
  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      args.headOption.getOrElse("/root/testdata/sf0.1"),
      args.lift(1).getOrElse("/tmp/graft_sf1"),
      args.lift(2).getOrElse("/tmp/graft_sf100"))
    // per-tier shuffle-partition sizing — the knob a real deployment turns
    // as data grows, and the first 100x lesson this tool taught: at 32
    // partitions the 100x LPA aggregate concentrates ~7.5M groups per
    // task and dies with AGGREGATE_OUT_OF_MEMORY in a 32 GB JVM; at 320,
    // per-task state shrinks 10x and AQE coalesces whatever is surplus.
    // The 1x and 10x tiers run at the production setting (32): the first
    // r15 run used 96 at 10x and DOUBLED l26/l35 there (24.96 s vs the
    // 32-partition ScaleRehearsal's ~13.9 s) — localCheckpoint blocks
    // keep their partition count, so over-partitioning the small tiers
    // distorts the very exponents this tool measures.
    val tierPartitions = Seq(32, 32, 320)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    // the highest-exponent graph unrolls + the dedup family's heavy
    // hitters — the operators whose 100 TB claims lean hardest on the
    // growth evidence (the full 11-pick set stays with ScaleRehearsal;
    // this subset is what a second decade is affordable for)
    // cheapest-first so a late-pick JVM freeze (the 100x graph unrolls
    // are the GC-heavy ones) loses the least; the artifact is rewritten
    // after every pick for the same reason
    val picks: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      // the pair-join family, post r16 shuffle_hash sweep — the second-
      // decade exponents of the very operators the exploded-broadcast
      // fix re-planned (VERDICT r15 #6); cheapest-first like the rest
      "l5b_minhash_lsh" -> graft.SparkEntry.queries("l5b_minhash_lsh"),
      "l34_source_overlap" -> graft.SparkEntry.queries("l34_source_overlap"),
      "l45_prefix_join" -> graft.SparkEntry.queries("l45_prefix_join"),
      "l49_dedup_keep_best" -> graft.SparkEntry.queries("l49_dedup_keep_best"),
      "l5f_dedup_apply" -> graft.SparkEntry.queries("l5f_dedup_apply"),
      "l5c_simhash_pairs" -> ((s: SparkSession, d: String) =>
        graft.ops.TextOps.l5cSimhash(s, d)),
      "l35_triangles" -> graft.SparkEntry.queries("l35_triangles"),
      "l46b_kcore_deep" -> graft.SparkEntry.queries("l46b_kcore_deep"),
      "l26_pagerank" -> graft.SparkEntry.queries("l26_pagerank"),
      "l40_label_prop" -> graft.SparkEntry.queries("l40_label_prop"))
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        d: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(spark)
      (dt, n)
    }
    def e(tb: Double, ts: Double): Double = math.log(tb / ts) / math.log(10.0)
    var done = List.empty[String]
    def flush(): Unit = Files.writeString(Paths.get("tools/growth_decades.json"),
      done.reverse.mkString("""{"tiers":[1,10,100],"queries":{""", ",", "}}\n"))
    picks.foreach { case (name, fn) =>
      // min of two runs per tier, like Bench/ScaleRehearsal; a tier that
      // throws records -1 (and poisons the exponents to -1) instead of
      // killing the whole rehearsal
      val tiers = dirs.zip(tierPartitions).map { case (d, np) =>
        spark.conf.set("spark.sql.shuffle.partitions", np)
        try {
          val a = time(fn, d); val b = time(fn, d)
          (math.min(a._1, b._1), a._2)
        } catch { case ex: Throwable =>
          graft.core.Caches.releaseAll(spark)
          println(s"$name FAILED at $d: ${ex.getClass.getSimpleName}")
          (-1.0, -1L)
        }
      }
      val ts = tiers.map(_._1)
      val (e1, e2) = (
        if (ts(0) > 0 && ts(1) > 0) e(ts(1), ts(0)) else -1.0,
        if (ts(1) > 0 && ts(2) > 0) e(ts(2), ts(1)) else -1.0)
      println(f"$name%-22s t=${ts(0)}%6.2f / ${ts(1)}%7.2f / ${ts(2)}%8.2f s" +
        f"  rows=${tiers(0)._2}%d/${tiers(1)._2}%d/${tiers(2)._2}%d" +
        f"  e1=$e1%5.2f e2=$e2%5.2f")
      done ::= (f""""$name":{"t":[${ts(0)}%.2f,${ts(1)}%.2f,${ts(2)}%.2f],""" +
        s""""rows":[${tiers.map(_._2).mkString(",")}],""" +
        f""""e1":$e1%.2f,"e2":$e2%.2f}""")
      flush()
    }
    println("wrote tools/growth_decades.json")
    spark.stop()
  }
}
