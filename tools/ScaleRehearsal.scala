// sf1 scale rehearsal (VERDICT r9 #7): run the most expensive batch
// queries at sf0.1 and at the ScaleFixture-synthesized 10× dir, measure
// wall times, and record the growth exponent e = ln(t_big/t_small)/ln(S)
// to tools/growth.json (DumpPlans injects it into PLANS.md). e ≈ 1 is
// linear scaling; e < 1 means fixed costs still dominate at sf0.1;
// anything well above each plan's documented bound is a scale bug.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.ScaleRehearsal /root/testdata/sf0.1 /tmp/graft_sf1 10'
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/graft_sf1")
    val scaleF = args.lift(2).map(_.toDouble).getOrElse(10.0)
    val spark = graft.core.Sessions.local()
    // the 10 most expensive BATCH queries of the round-10 bench (streaming
    // replays staged micro-batches — different harness, not rehearsed);
    // l5c runs the PAIR operator, not the declared verification summary,
    // whose brute sample twin is deliberately quadratic in the audit knob
    val picks: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "l35_triangles" -> graft.SparkEntry.queries("l35_triangles"),
      "l46_kcore" -> graft.SparkEntry.queries("l46_kcore"),
      // the k=75 variant actually REMOVES nodes each round (r14), so its
      // 10x exponent measures peeling work, not just the no-op fixpoint
      "l46b_kcore_deep" -> graft.SparkEntry.queries("l46b_kcore_deep"),
      "l40_label_prop" -> graft.SparkEntry.queries("l40_label_prop"),
      "l5c_simhash_pairs" -> ((s: SparkSession, d: String) =>
        graft.ops.TextOps.l5cSimhash(s, d)),
      "l45_prefix_join" -> graft.SparkEntry.queries("l45_prefix_join"),
      "l38_group_split" -> graft.SparkEntry.queries("l38_group_split"),
      "l5f_dedup_apply" -> graft.SparkEntry.queries("l5f_dedup_apply"),
      "l28b_containment_dedup" -> graft.SparkEntry.queries("l28b_containment_dedup"),
      "l26_pagerank" -> graft.SparkEntry.queries("l26_pagerank"),
      "l49_dedup_keep_best" -> graft.SparkEntry.queries("l49_dedup_keep_best"))
    // warm-up: classloading/codegen out of the timed window
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
    val rows = picks.map { case (name, fn) =>
      // min of two runs per side, like Bench — JIT/first-shuffle jitter out
      val s1 = time(fn, small); val s2 = time(fn, small)
      val b1 = time(fn, big); val b2 = time(fn, big)
      val ts = math.min(s1._1, s2._1); val tb = math.min(b1._1, b2._1)
      val e = math.log(tb / ts) / math.log(scaleF)
      println(f"$name%-24s small=$ts%6.2fs (${s1._2}%d rows)  " +
        f"big=$tb%7.2fs (${b1._2}%d rows)  exponent=$e%5.2f")
      f""""$name":{"t_small":$ts%.2f,"t_big":$tb%.2f,"rows_small":${s1._2}%d,"rows_big":${b1._2}%d,"exponent":$e%.2f}"""
    }
    val json = rows.mkString(s"""{"scale_factor":$scaleF,"queries":{""", ",", "}}")
    Files.writeString(Paths.get("tools/growth.json"), json + "\n")
    println("wrote tools/growth.json")
    spark.stop()
  }
}
