// Stage-level profile of the inverted-index pair-join family at one dir —
// the DecadeRehearsal/DedupProbe r15 finding: candidate volume is exactly
// linear (sum df^2: 27.9M at 10x -> 279M at 100x, max df 25 at both) yet
// wall time grew 36x for 10x data until the static-broadcast-of-an-exploded-
// side trap was fixed. Prints per-stage duration, shuffle read/write, and
// SPILL so the pathology names itself, and records per-query totals to
// tools/pairjoin.json (the auditable artifact behind the comments' numbers,
// VERDICT r15 #7).
//
// Queries: l5 (inverted-index Jaccard) and l45 (prefix-filtered PPJoin) by
// default; `trap` re-measures l5 with the shuffle_hash hint ELIDED (via the
// package-private l5JaccardCapped trap parameter) — the rejected
// static-broadcast posture.
//   SPARK_DRIVER_MEM=64g sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//     'runMain graft.tools.PairJoinProbe /tmp/graft_sf100 l5,l45,trap'
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object PairJoinProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf100")
    val picks = args.lift(1).getOrElse("l5,l45,trap").split(",").toSeq
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
    var done = List.empty[String]
    // MERGE with the existing artifact (r17): the honest method is ONE pick
    // per JVM invocation (r16 proved same-JVM sequences invert comparisons:
    // a warm third pick "beats" a cold first one) — so each invocation
    // measures its picks fresh and carries forward previously-recorded
    // entries it didn't re-measure. fresh_jvm_per_query is only claimed
    // when every invocation contributing to the file ran a single pick.
    val out = Paths.get("tools/pairjoin.json")
    val prior: Map[String, String] = if (Files.exists(out)) {
      val txt = Files.readString(out)
      """"([a-z0-9_]+)":(\{"sec":[^}]*\})""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2)).toMap
    } else Map.empty
    val priorFresh = !Files.exists(out) ||
      Files.readString(out).contains(""""fresh_jvm_per_query":true""")
    def flush(): Unit = {
      val mine = done.reverse.map { e =>
        val k = e.takeWhile(_ != ':').stripPrefix("\"").stripSuffix("\"")
        k -> e.dropWhile(_ != ':').drop(1)
      }
      val merged = (prior ++ mine).toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }
      val fresh = priorFresh && picks.size == 1
      Files.writeString(out, merged.mkString(
        s"""{"dir":"$d","shuffle_partitions":$parts,""" +
          s""""fresh_jvm_per_query":$fresh,"queries":{""", ",", "}}\n"))
    }
    picks.foreach { pick =>
      val (label, fn): (String, () => Long) = pick match {
        case "l5" => ("l5_jaccard_shuffled",
          () => graft.ops.TextOps.l5JaccardPairs(spark, d).count())
        case "l45" => ("l45_prefix_shuffled",
          () => graft.ops.TextOps.l45PrefixJoin(spark, d).count())
        case "trap" => ("l5_jaccard_broadcast_trap",
          // the package-private trap-posture parameter (ADVICE r16) — the
          // declared query no longer consults process-global state
          () => graft.ops.TextOps
            .l5JaccardCapped(None, pairJoinTrapPosture = true)(spark, d).count())
        case other => (other, () => sys.error(s"unknown pick $other"))
      }
      println(s"== $label at $d (shuffle.partitions=$parts)")
      val t0 = System.nanoTime()
      val res = try Right(fn()) catch { case ex: Throwable =>
        graft.core.Caches.releaseAll(spark)
        Left(ex.getClass.getSimpleName)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      res match {
        case Right(n) =>
          println(f"total $dt%.2f s ($n pairs)")
          done ::= f""""$label":{"sec":$dt%.2f,"pairs":$n}"""
        case Left(err) =>
          println(f"FAILED after $dt%.2f s: $err")
          done ::= f""""$label":{"sec":-1,"error":"$err"}"""
      }
      graft.core.Caches.releaseAll(spark)
      flush()
    }
    println("wrote tools/pairjoin.json")
    spark.stop()
  }
}
