// w5b_topk_agg second-decade attribution (r18): the first decade row for
// the bounded top-k TypedImperativeAggregate measured e2_pure = 1.45
// (0.88 s at 10x -> 25.1 s at 100x) — while its window twin w5, the shape
// this aggregate exists to REPLACE at scale, measures 0.28. The suspect is
// ObjectHashAggregateExec's sort-based fallback: after
// spark.sql.objectHashAggregate.sortBased.fallbackThreshold (default 128)
// DISTINCT GROUPS per task, the operator abandons the hash map and sorts
// its remaining input, serializing typed buffers between runs — at 100x
// (1.5M custkeys) every task blows through 128 groups immediately, so the
// "bounded state" aggregate degenerates into a per-task sort it was built
// to avoid. A/B: default 128 vs a threshold high enough to keep the hash
// path (the per-group state is <= k tiny entries, so the hash map is the
// intended posture at any group count that fits an executor).
// Fresh JVM per cell, min-of-2, within-pair comparisons; writes
// tools/w5b_fallback.json.
//   parent: SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.W5bFallbackProbe
//   child:  ... --cell <dir> <np> <threshold>
package graft.tools

import java.nio.file.{Files, Paths}

object W5bFallbackProbe {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--cell"))
      runCell(args(1), args(2).toInt, args(3).toInt)
    else runParent(args)

  private def runCell(dir: String, np: Int, threshold: Int): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    spark.conf.set("spark.sql.shuffle.partitions", np)
    spark.conf.set(
      "spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold",
      threshold)
    val fn = graft.SparkEntry.queries("w5b_topk_agg")
    val out = try {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        (dt, n)
      }
      val a = once(); val b = once()
      f"""{"t":${math.min(a._1, b._1)}%.2f,"rows":${a._2}}"""
    } catch { case ex: Throwable =>
      s"""{"t":-1,"rows":-1,"err":"${ex.getClass.getSimpleName}"}"""
    }
    println(s"CELL $out")
    spark.stop()
  }

  private def runParent(args: Array[String]): Unit = {
    val d10 = args.headOption.getOrElse("/tmp/graft_sf1")
    val d100 = args.lift(1).getOrElse("/tmp/graft_sf100")
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")
    val opens = (Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic").map("java.base/" + _) ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action",
        "sun.util.calendar").map("java.base/" + _))
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val T = """.*"t":(-?[0-9.]+),"rows":(-?[0-9]+).*""".r
    def forkCell(dir: String, np: Int, threshold: Int): (Double, Long) = {
      val cmd = (Seq("java") ++ opens ++ Seq(s"-Xmx$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.tools.W5bFallbackProbe", "--cell", dir, np.toString,
        threshold.toString))
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
      cell.getOrElse((-1.0, -1L))
    }
    val HI = 1 << 24 // effectively "never fall back" at these group counts
    val sb = new StringBuilder
    sb.append("""{"experiment":"w5b ObjectHashAggregate sort-based fallback threshold: default 128 vs hash-path 2^24 (declared w5b, fresh JVM per cell, min-of-2)","pairs":[""")
    var first = true
    var mismatch = false
    for ((dir, np, pairsN) <- Seq((d10, 32, 1), (d100, 320, 3)); p <- 1 to pairsN) {
      val lo = forkCell(dir, np, 128)
      val hi = forkCell(dir, np, HI)
      if (lo._2 >= 0 && hi._2 >= 0 && lo._2 != hi._2) mismatch = true
      println(f"$dir pair$p: default128 t=${lo._1}%8.2f s  hash2^24 t=${hi._1}%8.2f s  rows=${lo._2}/${hi._2}")
      if (!first) sb.append(",")
      first = false
      sb.append(f"""{"dir":"$dir","partitions":$np,"default128_t":${lo._1}%.2f,""" +
        f""""hash_t":${hi._1}%.2f,"rows":[${lo._2},${hi._2}]}""")
    }
    sb.append(s"""],"rows_mismatch":$mismatch}""").append("\n")
    Files.writeString(Paths.get("tools/w5b_fallback.json"), sb.toString)
    println("wrote tools/w5b_fallback.json")
    require(!mismatch, "fallback-threshold twin diverged")
  }
}
