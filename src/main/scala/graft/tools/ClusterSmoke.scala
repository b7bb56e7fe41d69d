package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Forked-JVM half of ClusterPostureSpec (VERDICT r19 #5): runs named
  * declared queries on a REAL multi-executor master
  * (`local-cluster[2,2,2048]`) with a reliable checkpoint dir set. The
  * Graphs/CC cluster posture — reliable `checkpoint` every 3rd round,
  * `Lineage.cut`'s dual posture — had only ever executed in `local[*]`,
  * where it takes the localCheckpoint branch; this main exercises the
  * other branch on separate executor JVMs, end to end, per CI run.
  *
  * Runs in its OWN JVM because a SparkContext's master is fixed for the
  * JVM lifetime and the test suites share a `local[4]` context. Protocol:
  * one `SMOKE {"name":...,"rows":N,"hash":"..."}` line per query (the
  * spec recomputes the same canonical hash on its local session), then
  * `CKPT {"files":N}` counting reliable-checkpoint files actually written.
  */
object ClusterSmoke {

  /** Order-insensitive canonical content hash — md5 over the sorted
    * Row.toString lines. Valid only for exact (non-floating-aggregate)
    * results; both smoke queries emit integer-typed rows. */
  def contentHash(df: DataFrame): (Long, String) = {
    val lines = df.collect().map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update(l.getBytes("UTF-8")))
    (lines.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args(1)
    val ckptDir = args(2)
    // executors are SEPARATE JVMs here: they need the graft classes, which
    // local[*] gets for free from the driver classloader. Same-machine, so
    // the driver's own classpath is exactly right.
    val cp = System.getProperty("java.class.path")
    val opens = (Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic").map("java.base/" + _) ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action",
        "sun.util.calendar").map("java.base/" + _))
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = graft.core.Sessions.tune(
      SparkSession.builder()
        .master("local-cluster[2,2,2048]")
        .appName("graft-cluster-smoke"), "8")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", opens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(ckptDir)
    names.foreach { name =>
      val (rows, hash) = contentHash(graft.SparkEntry.queries(name)(spark, sfDir))
      println(s"""SMOKE {"name":"$name","rows":$rows,"hash":"$hash"}""")
    }
    // evidence the RELIABLE branch engaged (not localCheckpoint): files on
    // disk under the checkpoint dir. Counted BEFORE stop() — the cleaner
    // (cleanCheckpoints on) may reclaim them as frames are GC'd.
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
    val files = try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
                finally walk.close()
    println(s"""CKPT {"files":$files}""")
    spark.stop()
  }
}
