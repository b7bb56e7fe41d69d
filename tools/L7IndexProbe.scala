// A/B for the l7c persisted-index posture (VERDICT r17 #3).
//
// Background: the r17 broadcast audit dropped the explicit broadcast() on
// l7c's corpus-scale index side (every vector's cell assignment — the index
// IS the corpus, so the hint would force a driver broadcast at any scale).
// Post-audit the candidate join legitimately SHUFFLES that side, and the
// single-JVM 100x tier paid 8.81 -> 20.76 s on the declared summary. The
// hypothesis under test: the l27 index-once pattern — write the inverted
// file (label, cell, idb) ONCE, bucketed on the join key (the production
// posture: the IVF index is built at ingest and probed by many query
// batches) — restores most of that cost with NO static hint, because the
// bucketed scan arrives pre-partitioned and only the query side exchanges.
//
// Method (the pairjoin.json rules): ONE cell per JVM invocation, standard
// sf0.001 warmup, min-of-2 inside the JVM; A/B adjudicated on adjacent
// within-pair comparisons only (ambient drift spans 2.5x across a session),
// 3 pairs at the 100x tier, consistent sign = verdict. The probe times the
// RAW pair path (VectorOps.l7cKnnIvf), not the declared recall summary, so
// the measured delta is the candidate-join posture alone; `persisted` also
// reports its one-time index build+write cost separately, and asserts the
// pair output row count matches the declared path (same candidates, same
// ranking).
//   parent:  SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L7IndexProbe
//   child:   ... graft.tools.L7IndexProbe --cell <declared|persisted> <dir> <np>
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object L7IndexProbe {
  private def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  private def norm(a: Column): Column = sqrt(dot(a, a))

  // trained once per JVM (the declared path gets the same amortization via
  // VectorOps.cachedByFingerprint — the IVF contract is train-once)
  private var centsCache: Array[Array[Double]] = _

  private def baseOf(s: SparkSession, d: String): DataFrame =
    graft.core.Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm")).localCheckpoint(eager = true)

  private def probesOf(base: DataFrame): DataFrame = {
    def dots: Column = array(centsCache.toIndexedSeq.map(c =>
      dot(col("embedding"), typedLit(c)) / col("nrm")): _*)
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("dot").desc, col("cell"))
    base.select(col("vec_id"), col("label"),
        posexplode(dots).as(Seq("cell", "dot")))
      .withColumn("pk", row_number().over(wProbe))
  }

  /** INDEX-ONCE build: train the quantizer, assign every vector its single
    * best cell, and WRITE the inverted file (label, cell, idb) as a table
    * bucketed on the candidate-join key — the production posture (built at
    * ingest, probed by many query batches). 32 buckets = this rig's
    * production shuffle width; the scan reports HashPartitioning so
    * EnsureRequirements exchanges only the query side. Returns build sec. */
  private def buildIndex(s: SparkSession, d: String): Double = {
    graft.functions.VecDot.register(s)
    val base = baseOf(s, d)
    centsCache = graft.ops.VectorOps.trainIvfCentroids(
      base, "embedding", graft.ops.VectorOps.IvfK, graft.ops.VectorOps.IvfIters)
    val t0 = System.nanoTime()
    s.sql("DROP TABLE IF EXISTS graft_ivf_index")
    val loc = Paths.get(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_ivf_index")
    if (Files.exists(loc)) {
      val walk = Files.walk(loc)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
    probesOf(base).where(col("pk") === 1)
      .select(col("label"), col("cell"), col("vec_id").as("idb"))
      .write.mode("overwrite")
      .bucketBy(32, "label", "cell").sortBy("label", "cell")
      .saveAsTable("graft_ivf_index")
    (System.nanoTime() - t0) / 1e9
  }

  /** The persisted-index twin of VectorOps.l7cKnnIvf's QUERY path: identical
    * probe assignment, candidate semantics, and exact re-rank — the ONLY
    * change is the index side, read back from the bucketed table instead of
    * riding the same in-plan exchange as the query side. Constructed FRESH
    * per timed run (the declared path also rebuilds its plan per run; a
    * shared frame would lose its localCheckpoint blocks to the
    * Caches.releaseAll between timed runs — the first probe run hit
    * exactly that CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). */
  private def persistedQuery(s: SparkSession, d: String): DataFrame = {
    val nprobe = 2
    val base = baseOf(s, d)
    val queriesSide = probesOf(base).where(col("pk") <= nprobe)
      .select(col("label"), col("cell"), col("vec_id").as("ida"))
    // no hint on the index side: it is a stats-backed table scan now — the
    // planner broadcasts it while it fits and zips the bucketed layout
    // when it doesn't (the self-correcting shape the audit requires)
    val cand = queriesSide.join(s.table("graft_ivf_index"), Seq("label", "cell"))
      .where(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb")).distinct()
    val va = base.select(col("vec_id").as("ida"), col("embedding").as("va"),
      col("nrm").as("na"))
    val vb = base.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    cand.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--cell"))
      runCell(args(1), args(2), args.lift(3).map(_.toInt).getOrElse(32))
    else runParent(args)

  private def runCell(mode: String, dir: String, np: Int): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    spark.conf.set("spark.sql.shuffle.partitions", np)
    val out = try {
      var build = 0.0
      val fn: () => DataFrame = mode match {
        case "declared" => () => graft.ops.VectorOps.l7cKnnIvf(spark, dir)
        case "persisted" =>
          // build ONCE per JVM (the amortized posture); timed runs probe it
          build = buildIndex(spark, dir)
          () => persistedQuery(spark, dir)
        case m => sys.error(s"unknown mode $m")
      }
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = fn().count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(spark)
        (dt, n)
      }
      val a = once(); val b = once()
      f"""{"t":${math.min(a._1, b._1)}%.2f,"rows":${a._2},"build":$build%.2f}"""
    } catch { case ex: Throwable =>
      s"""{"t":-1,"rows":-1,"build":-1,"err":"${ex.getClass.getSimpleName}"}"""
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
    val T = """.*"t":(-?[0-9.]+),"rows":(-?[0-9]+),"build":(-?[0-9.]+).*""".r
    def forkCell(mode: String, dir: String, np: Int): (Double, Long, Double) = {
      val cmd = (Seq("java") ++ opens ++ Seq(s"-Xmx$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.tools.L7IndexProbe", "--cell", mode, dir, np.toString))
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      var cell: Option[(Double, Long, Double)] = None
      scala.io.Source.fromInputStream(proc.getInputStream).getLines().foreach {
        case l if l.startsWith("CELL ") => l match {
          case T(t, r, b) => cell = Some((t.toDouble, r.toLong, b.toDouble))
          case _ => println(s"    unparsable: $l")
        }
        case l if l.contains("ERROR") || l.contains("Exception") => println(s"    $l")
        case _ => ()
      }
      proc.waitFor()
      cell.getOrElse((-1.0, -1L, -1.0))
    }
    // WITHIN-PAIR adjudication: declared/persisted alternate back-to-back;
    // 1 pair at 10x (the cheap sanity tier), 3 pairs at 100x (the tier the
    // question is about). Partitions per the decade settings: 32 / 320.
    val sb = new StringBuilder
    sb.append("""{"experiment":"l7c candidate-join posture: declared (in-plan index side) vs persisted bucketed inverted file","nprobe":2,"pairs":[""")
    var first = true
    var rowsMismatch = false
    for ((dir, np, pairsN) <- Seq((d10, 32, 1), (d100, 320, 3)); p <- 1 to pairsN) {
      val dec = forkCell("declared", dir, np)
      val per = forkCell("persisted", dir, np)
      if (dec._2 >= 0 && per._2 >= 0 && dec._2 != per._2) rowsMismatch = true
      println(f"$dir pair$p: declared t=${dec._1}%8.2f s rows=${dec._2}  " +
        f"persisted t=${per._1}%8.2f s rows=${per._2} (build ${per._3}%.2f s)")
      if (!first) sb.append(",")
      first = false
      sb.append(f"""{"dir":"$dir","partitions":$np,"declared_t":${dec._1}%.2f,""" +
        f""""persisted_t":${per._1}%.2f,"persisted_build_t":${per._3}%.2f,""" +
        s""""rows":[${dec._2},${per._2}]}""")
    }
    sb.append(s"""],"rows_mismatch":$rowsMismatch}""").append("\n")
    Files.writeString(Paths.get("tools/l7_index_posture.json"), sb.toString)
    println("wrote tools/l7_index_posture.json")
    require(!rowsMismatch, "persisted twin diverged from the declared pair set")
  }
}
