// r19 (VERDICT r18 #2): retire l28b's attributed decade exponent (e2_pure
// 1.30 at 320 partitions) or pin it to a named GC term. The r18 attribution
// predicted the exponent is one-JVM GC of the checkpoint materialization —
// which, like l40's memory cliff, should move with the partition knob
// (smaller per-task state) while candidate volume and CPU stay put. This
// probe measures the prediction directly: 3 adjacent-pair rounds of
//   10x@640  (the fixed-setting denominator for e2_pure@640)
//   100x@640 (per-task state halved vs the table's 320 setting)
//   100x@320 (the growth-table cell, re-measured in the SAME round)
// each cell in a fresh JVM, BOTH runs reported (min-of-2 would mask GC
// variance), with the JVM's total collection time captured around each run
// (local mode: driver == executors == one heap, so the GC beans see all of
// it). Writes tools/l28b_gc.json.
//   parent: SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L28bGcProbe
//   child:  ... --cell <dir> <np>
package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

object L28bGcProbe {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--cell")) runCell(args(1), args(2).toInt)
    else runParent(args)

  private def gcMs(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum

  private def runCell(dir: String, np: Int): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    spark.conf.set("spark.sql.shuffle.partitions", np)
    val fn = graft.SparkEntry.queries("l28b_containment_dedup")
    val out = try {
      def once(): (Double, Double, Long) = {
        val g0 = gcMs(); val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val dg = (gcMs() - g0) / 1e3
        graft.core.Caches.releaseAll(spark)
        (dt, dg, n)
      }
      val a = once(); val b = once()
      f"""{"t":[${a._1}%.2f,${b._1}%.2f],"gc_s":[${a._2}%.2f,${b._2}%.2f],"rows":${a._3}}"""
    } catch { case ex: Throwable =>
      s"""{"t":[-1,-1],"gc_s":[-1,-1],"rows":-1,"err":"${ex.getClass.getSimpleName}"}"""
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
    val T = (""".*"t":\[(-?[0-9.]+),(-?[0-9.]+)\],"gc_s":\[(-?[0-9.]+),""" +
      """(-?[0-9.]+)\],"rows":(-?[0-9]+).*""").r
    case class Cell(t1: Double, t2: Double, g1: Double, g2: Double, rows: Long) {
      def tMin: Double = if (t1 < 0) -1 else math.min(t1, t2)
      def json: String =
        f"""{"t":[$t1%.2f,$t2%.2f],"gc_s":[$g1%.2f,$g2%.2f],"rows":$rows}"""
    }
    def forkCell(dir: String, np: Int): Cell = {
      val cmd = (Seq("java") ++ opens ++ Seq(s"-Xmx$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.tools.L28bGcProbe", "--cell", dir, np.toString))
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      var cell: Option[Cell] = None
      scala.io.Source.fromInputStream(proc.getInputStream).getLines().foreach {
        case l if l.startsWith("CELL ") => l match {
          case T(t1, t2, g1, g2, r) =>
            cell = Some(Cell(t1.toDouble, t2.toDouble, g1.toDouble, g2.toDouble,
              r.toLong))
          case _ => println(s"    unparsable: $l")
        }
        case _ => ()
      }
      proc.waitFor()
      cell.getOrElse(Cell(-1, -1, -1, -1, -1))
    }
    def e2(t10: Double, t100: Double): Double =
      if (t10 > 0 && t100 > 0) math.log(t100 / t10) / math.log(10.0) else -1.0
    val sb = new StringBuilder
    sb.append("""{"experiment":"l28b decade-exponent GC attribution (VERDICT r18 #2): 10x@640 / 100x@640 / 100x@320 adjacent per round, fresh JVM per cell, both runs + JVM collection time reported","rounds":[""")
    var first = true
    for (p <- 1 to 3) {
      val c10 = forkCell(d10, 640)
      val c640 = forkCell(d100, 640)
      val c320 = forkCell(d100, 320)
      println(f"round$p: 10x@640 ${c10.tMin}%7.2f s | 100x@640 ${c640.tMin}%7.2f s " +
        f"(gc ${c640.g1}%.1f/${c640.g2}%.1f s) | 100x@320 ${c320.tMin}%7.2f s " +
        f"(gc ${c320.g1}%.1f/${c320.g2}%.1f s) | e2_pure@640 ${e2(c10.tMin, c640.tMin)}%.2f")
      if (!first) sb.append(",")
      first = false
      sb.append(f"""{"t10_640":${c10.json},"t100_640":${c640.json},""" +
        f""""t100_320":${c320.json},"e2_pure_640":${e2(c10.tMin, c640.tMin)}%.2f,""" +
        f""""e2_pure_mixed_den":${e2(c10.tMin, c320.tMin)}%.2f}""")
    }
    sb.append("]}\n")
    Files.writeString(Paths.get("tools/l28b_gc.json"), sb.toString)
    println("wrote tools/l28b_gc.json")
  }
}
