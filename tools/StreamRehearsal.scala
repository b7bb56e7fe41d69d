// Streaming 10x scale rehearsal (VERDICT r11 #2): run the stateful
// streaming gates on sf0.1 events and on the ScaleFixture-replicated 10x
// events, and record BOTH wall-time growth exponents and peak state-store
// footprint (StateOperatorProgress.memoryUsedBytes / numRowsTotal, read
// off the finished query's progress stream via StreamingOps.stateMetrics).
// Wall time shows throughput scaling; state bytes show whether watermarks
// actually BOUND state as the stream grows — the claim every stateful
// operator's scaladoc argues and this tool measures.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.StreamRehearsal /root/testdata/sf0.1 /tmp/graft_sf1 10'
// (build /tmp/graft_sf1 first with graft.tools.ScaleFixture)
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

object StreamRehearsal {
  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/graft_sf1")
    val scaleF = args.lift(2).map(_.toDouble).getOrElse(10.0)
    // optional: args(3) = comma-separated pick filter, args(4) = out path —
    // r20 runs the 10x → 100x tier PAIR for the session-window cell
    // without overwriting the sf0.1 → 10x artifact
    val outPath = args.lift(4).getOrElse("tools/stream_growth.json")
    val spark = graft.core.Sessions.local()
    // the three r11-asked gates plus the two heaviest remaining stateful
    // shapes: stream-stream join (two bounded stores), foreachBatch CDC
    // (state lives in versioned parquet, stores N/A), watermarked
    // freshness agg, dropDuplicates state, mapGroupsWithState DFA;
    // t3's session-window store joined in r20 (the decade flag)
    val allPicks: Seq[(String, Seq[String])] = Seq(
      "t9_stream_stream_join" -> Seq("t9_sink"),
      "t12_stream_upsert" -> Nil, // foreachBatch: no state store by design
      "t17_stream_freshness" -> Seq("t17_sink", "t17_hours_sink"),
      "t5_stream_dedup" -> Seq("t5_sink"),
      "t16_stream_pattern" -> Seq("t16_sink"),
      "t3_session_window" -> Seq("t3_sink"))
    val picks = args.lift(3).filter(_.nonEmpty)
      .map(_.split(",").toSet)
      .fold(allPicks.filter(_._1 != "t3_session_window"))(ks =>
        allPicks.filter(p => ks(p._1)))
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    def run(name: String, d: String, sinks: Seq[String]): (Double, Long, Long, Long, Int) = {
      val fn = graft.SparkEntry.queries(name)
      sinks.foreach(graft.ops.StreamingOps.stateMetrics.remove)
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(spark)
      val ms = sinks.flatMap(graft.ops.StreamingOps.stateMetrics.get)
      (dt, n,
        if (ms.isEmpty) -1L else ms.map(_.peakStateBytes).sum,
        if (ms.isEmpty) -1L else ms.map(_.peakStateRows).sum,
        if (ms.isEmpty) -1 else ms.map(_.batches).max)
    }
    val rows = picks.map { case (name, sinks) =>
      // min wall of two runs per side; state metrics from the min-wall run
      // are batch-count-identical across runs (same source file set), so
      // either run's peak is THE peak
      val s1 = run(name, small, sinks); val s2 = run(name, small, sinks)
      val b1 = run(name, big, sinks); val b2 = run(name, big, sinks)
      // Sanity gate (VERDICT r12 #1): a big-side run that streams zero
      // rows, or a stateful gate whose sinks recorded no state metrics,
      // means the source staging silently fed the stream NOTHING — refuse
      // to write a growth artifact built on that.
      require(b1._2 > 0 && s1._2 > 0,
        s"$name streamed 0 rows (small=${s1._2}, big=${b1._2}): " +
          "source staging is broken, growth numbers would be garbage")
      require(sinks.isEmpty || (s1._4 > 0 && b1._4 > 0),
        s"$name recorded no state metrics for sinks $sinks: " +
          "stateful run did not report state, growth numbers would be garbage")
      val ts = math.min(s1._1, s2._1); val tb = math.min(b1._1, b2._1)
      val e = math.log(tb / ts) / math.log(scaleF)
      println(f"$name%-24s small=$ts%6.2fs (${s1._2}%d rows, state=${s1._3}%d B" +
        f"/${s1._4}%d rows, ${s1._5}%d batches)")
      println(f"${""}%-24s big  =$tb%7.2fs (${b1._2}%d rows, state=${b1._3}%d B" +
        f"/${b1._4}%d rows, ${b1._5}%d batches)  exponent=$e%5.2f")
      f""""$name":{"t_small":$ts%.2f,"t_big":$tb%.2f,"rows_small":${s1._2}%d,""" +
        f""""rows_big":${b1._2}%d,"exponent":$e%.2f,""" +
        f""""state_bytes_small":${s1._3}%d,"state_bytes_big":${b1._3}%d,""" +
        f""""state_rows_small":${s1._4}%d,"state_rows_big":${b1._4}%d,""" +
        f""""batches_small":${s1._5}%d,"batches_big":${b1._5}%d}"""
    }
    val json = rows.mkString(
      s"""{"scale_factor":$scaleF,"small":"$small","big":"$big","queries":{""",
      ",", "}}")
    Files.writeString(Paths.get(outPath), json + "\n")
    println(s"wrote $outPath")
    spark.stop()
  }
}
