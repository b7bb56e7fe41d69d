// Fresh-JVM bench anchors (VERDICT r16 stretch #8): the shared-JVM bench's
// ambient 2-4x drift (memory: JVM age, GC history, load) burned adjudication
// time in r13-r15 — every suspicious per-query regression had to be re-run
// by hand in a clean JVM before it could be believed. This tool makes that
// one command: each anchor query runs in its OWN forked JVM (standard
// sf0.001 warmup, then min-of-2 at the target dir — the same per-cell
// method as DecadeRehearsal r17), so the recorded number has no sequence
// contamination by construction. Compare a suspect bench.json entry against
// tools/bench_anchors.json before calling it a regression.
//
// Default picks = the 10 most expensive queries of the r16 bench — the ones
// whose regressions matter and whose shared-JVM numbers drift most.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' compile
//   SPARK_DRIVER_MEM=32g tools/run.sh graft.tools.BenchAnchors
//   SPARK_DRIVER_MEM=32g tools/run.sh graft.tools.BenchAnchors <sfDir> q1,q2
package graft.tools

import java.nio.file.{Files, Paths}

object BenchAnchors {
  private val defaultPicks = Seq(
    "l35_triangles", "l5c_simhash", "l40_label_prop", "l46b_kcore_deep",
    "l46_kcore", "l45_prefix_join", "t9_stream_stream_join", "l26_pagerank",
    "l28_containment", "l5e_dedup_groups")

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--cell")) runCell(args(1), args(2))
    else runParent(args)

  private def runCell(name: String, dir: String): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    val fn = graft.SparkEntry.queries(name)
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(spark)
      (dt, n)
    }
    val out = try {
      val a = once(); val b = once()
      f"""{"t":${math.min(a._1, b._1)}%.2f,"rows":${a._2}}"""
    } catch { case ex: Throwable =>
      s"""{"t":-1,"rows":-1,"err":"${ex.getClass.getSimpleName}"}"""
    }
    println(s"CELL $out")
    spark.stop()
  }

  private def runParent(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val picks = args.lift(1).map(_.split(",").toSeq).getOrElse(defaultPicks)
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")
    val opens = (Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic").map("java.base/" + _) ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action",
        "sun.util.calendar").map("java.base/" + _))
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val T = """.*"t":(-?[0-9.]+),"rows":(-?[0-9]+).*""".r
    var done = List.empty[String]
    def flush(): Unit = Files.writeString(Paths.get("tools/bench_anchors.json"),
      done.reverse.mkString(
        s"""{"dir":"$dir","fresh_jvm_per_query":true,"queries":{""", ",", "}}\n"))
    picks.foreach { name =>
      val cmd = (Seq("java") ++ opens ++ Seq(s"-Xmx$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.tools.BenchAnchors", "--cell", name, dir))
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      var cell: Option[(Double, Long)] = None
      scala.io.Source.fromInputStream(proc.getInputStream).getLines().foreach {
        case l if l.startsWith("CELL ") => l match {
          case T(t, r) => cell = Some((t.toDouble, r.toLong))
          case _ => println(s"    unparsable: $l")
        }
        case _ => ()
      }
      proc.waitFor()
      val (t, rows) = cell.getOrElse((-1.0, -1L))
      println(f"$name%-24s t=$t%8.2f s  rows=$rows")
      done ::= f""""$name":{"t":$t%.2f,"rows":$rows}"""
      flush()
    }
    println("wrote tools/bench_anchors.json")
  }
}
