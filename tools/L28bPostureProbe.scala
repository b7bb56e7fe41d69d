// Fresh-JVM A/B for the l28-family share posture (r18, follows
// L28bPhaseProbe): eager localCheckpoint (the pre-r18 declared plan) vs
// ONE reused s-keyed exchange (the l5 posture). The phase probe showed the
// checkpoint's object materialization as the dominant one-JVM term at 100x
// (23-71 s, GC-bound, 913 MB spill downstream) with candidate volume and
// task CPU exactly linear; this probe settles the FULL-query decision by
// the house rule — fresh JVM per cell, min-of-2, within-pair adjacent
// comparisons, 1 pair at 10x + 3 pairs at 100x, consistent sign = adopt.
// Writes tools/l28b_posture.json.
//   parent: SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L28bPostureProbe
//   child:  ... --cell <ckpt|exchange> <dir> <np>
package graft.tools

import java.nio.file.{Files, Paths}

object L28bPostureProbe {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--cell"))
      runCell(args(1), args(2), args(3).toInt)
    else runParent(args)

  private def runCell(postureMode: String, dir: String, np: Int): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    spark.conf.set("spark.sql.shuffle.partitions", np)
    import org.apache.spark.sql.functions._
    def q() = graft.ops.TextOps.containmentDedupFrames(
        graft.core.Tables.documentsWide(spark, dir), n = 3, tau = 0.6,
        hashBits = 64, shareByCheckpoint = postureMode == "ckpt")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
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
        "graft.tools.L28bPostureProbe", "--cell", mode, dir, np.toString))
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
    val sb = new StringBuilder
    sb.append("""{"experiment":"l28-family share posture: eager localCheckpoint vs one reused s-keyed exchange (full declared l28b, fresh JVM per cell, min-of-2)","pairs":[""")
    var first = true
    var mismatch = false
    for ((dir, np, pairsN) <- Seq((d10, 320, 1), (d100, 320, 3)); p <- 1 to pairsN) {
      val ck = forkCell("ckpt", dir, np)
      val ex = forkCell("exchange", dir, np)
      if (ck._2 >= 0 && ex._2 >= 0 && ck._2 != ex._2) mismatch = true
      println(f"$dir pair$p: ckpt t=${ck._1}%8.2f s  exchange t=${ex._1}%8.2f s  rows=${ck._2}/${ex._2}")
      if (!first) sb.append(",")
      first = false
      sb.append(f"""{"dir":"$dir","partitions":$np,"ckpt_t":${ck._1}%.2f,""" +
        f""""exchange_t":${ex._1}%.2f,"rows":[${ck._2},${ex._2}]}""")
    }
    sb.append(s"""],"rows_mismatch":$mismatch}""").append("\n")
    Files.writeString(Paths.get("tools/l28b_posture.json"), sb.toString)
    println("wrote tools/l28b_posture.json")
    require(!mismatch, "posture twin diverged")
  }
}
