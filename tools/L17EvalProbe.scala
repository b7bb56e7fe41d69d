// r19: attribute l17_decontaminate's e2_pure = 1.58 decade row. The
// declared query's eval side is the doc_id % 20 pseudo-holdout — at the
// 100x tier that side GROWS with the corpus (fixture construction), while
// the production contract is a FIXED benchmark suite. Two experiments,
// fresh JVM per cell, min-of-2, 320 partitions at both tiers:
//   fixed-eval  — train = tier dir, eval = the sf0.1 holdout slice (the
//                 production shape; eval constant across tiers) → e2_fixed
//   growing     — the declared shape re-measured (both sides x100), with
//                 broadcast_eval = true (the declared hint) vs false (the
//                 shuffle posture) at the 100x tier
// Writes tools/l17_eval.json.
//   parent: SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L17EvalProbe
//   child:  ... --cell <fixed|grow_b|grow_s> <dir> <np>
package graft.tools

import java.nio.file.{Files, Paths}

object L17EvalProbe {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--cell"))
      runCell(args(1), args(2), args(3).toInt)
    else runParent(args)

  private def runCell(mode: String, dir: String, np: Int): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    spark.conf.set("spark.sql.shuffle.partitions", np)
    import org.apache.spark.sql.functions.col
    def q() = mode match {
      case "fixed" =>
        // production shape: train grows with the tier, eval is a FIXED
        // benchmark-sized table. The constant slice must come from INSIDE
        // the tier (copy 0, doc_id < the 1e8 replication offset): an
        // external sf0.1 slice shares no shingles with the salted tiers
        // (rows = 0 — measured, a degenerate match side), while copy 0 is
        // the same ~250-doc holdout at every tier AND really matches.
        graft.ops.TextOps.decontaminateFrames(
          graft.core.Tables.documentsWide(spark, dir),
          graft.core.Tables.documentsWide(spark, dir)
            .where(col("doc_id") % 20 === 0 && col("doc_id") < 100000000L),
          n = 3)
      case m =>
        val docs = graft.core.Tables.documentsWide(spark, dir)
        graft.ops.TextOps.decontaminateFrames(
          docs.where(col("doc_id") % 20 =!= 0),
          docs.where(col("doc_id") % 20 === 0),
          n = 3, hashBits = 64, broadcastEval = m == "grow_b")
    }
    val out = try {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = q().count()
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
    def forkCell(mode: String, dir: String, np: Int): (Double, Long) = {
      val cmd = (Seq("java") ++ opens ++ Seq(s"-Xmx$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.tools.L17EvalProbe", "--cell", mode, dir, np.toString))
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
    def e2(a: Double, b: Double): Double =
      if (a > 0 && b > 0) math.log(b / a) / math.log(10.0) else -1.0
    val sb = new StringBuilder
    sb.append("""{"experiment":"l17 decade-exponent attribution: fixed (production) eval vs fixture-growing eval, and broadcast vs shuffle on the growing side (fresh JVM per cell, min-of-2, 320 partitions)","cells":{""")
    val f10 = forkCell("fixed", d10, 320)
    val f100 = forkCell("fixed", d100, 320)
    println(f"fixed-eval:   10x ${f10._1}%6.2f s -> 100x ${f100._1}%7.2f s  e2_fixed=${e2(f10._1, f100._1)}%.2f  rows=${f10._2}/${f100._2}")
    val gb = forkCell("grow_b", d100, 320)
    val gs = forkCell("grow_s", d100, 320)
    val gb10 = forkCell("grow_b", d10, 320)
    val gs10 = forkCell("grow_s", d10, 320)
    println(f"growing-eval: 100x broadcast ${gb._1}%7.2f s vs shuffle ${gs._1}%7.2f s (10x: ${gb10._1}%5.2f / ${gs10._1}%5.2f)  rows=${gb._2}/${gs._2}")
    sb.append(f""""fixed_10x":${f10._1}%.2f,"fixed_100x":${f100._1}%.2f,""")
    sb.append(f""""e2_fixed":${e2(f10._1, f100._1)}%.2f,""")
    sb.append(f""""grow_bcast_10x":${gb10._1}%.2f,"grow_bcast_100x":${gb._1}%.2f,""")
    sb.append(f""""grow_shuffle_10x":${gs10._1}%.2f,"grow_shuffle_100x":${gs._1}%.2f,""")
    sb.append(f""""e2_grow_bcast":${e2(gb10._1, gb._1)}%.2f,"e2_grow_shuffle":${e2(gs10._1, gs._1)}%.2f,""")
    sb.append(s""""rows_match_grow":${gb._2 == gs._2}}}""").append("\n")
    Files.writeString(Paths.get("tools/l17_eval.json"), sb.toString)
    println("wrote tools/l17_eval.json")
    require(gb._2 < 0 || gs._2 < 0 || gb._2 == gs._2, "posture twin diverged")
  }
}
