package graft

import java.nio.file.Files

/** VERDICT r19 #5: the Graphs/CC cluster posture — reliable `checkpoint`
  * cadence, `Lineage.cut` dual posture — had only ever executed in
  * `local[*]`. This smoke drives l5e (connected components) and l46
  * (k-core peel) on a REAL multi-executor master, `local-cluster[2,2,2048]`,
  * in a forked JVM (a SparkContext's master is fixed per JVM and the
  * suites share a `local[4]` one), with a checkpoint dir set, and asserts:
  *   - both queries' full result content matches the local[*] run
  *     (order-insensitive md5 over canonical rows — both emit
  *     integer-typed rows, so the hash is exact), and
  *   - reliable checkpoint files were actually written (the CC engine
  *     always checkpoints its final round under the reliable posture,
  *     so l5e guarantees file evidence; l46's 3-round peel exercises
  *     cutLoop across executor JVMs either way).
  * A regression in the cluster branch — wrong results under real
  * serialization boundaries, a checkpoint path that only works with
  * driver-local block storage, a class that executors can't load — fails
  * here instead of on a real cluster. */
class ClusterPostureSpec extends SparkSpec {

  test("l5e/l46 on local-cluster[2,2,2048] + reliable checkpoints match local[*]") {
    val names = Seq("l5e_dedup_groups", "l46_kcore")
    // local references on the shared session (localCheckpoint posture)
    val want = names.map { n =>
      n -> graft.tools.ClusterSmoke.contentHash(SparkEntry.queries(n)(spark, sfDir))
    }.toMap

    val ckpt = Files.createTempDirectory("graft_cluster_smoke_ckpt")
    val opens = (Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic").map("java.base/" + _) ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action",
        "sun.util.calendar").map("java.base/" + _))
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val out = Files.createTempFile("graft_cluster_smoke_", ".out").toFile
    val cmd = (Seq("java") ++ opens ++ Seq("-Xmx4g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ClusterSmoke", names.mkString(","), sfDir, ckpt.toString))
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(out)
    // the in-child Worker launches executor JVMs through Spark's command
    // builder, whose jars-dir lookup calls getScalaVersion() — which in a
    // packaged distribution resolves ONLY via this env var (without it:
    // "Cannot find any build directories" and executors never start)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val proc = pb.start()
    val finished = proc.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    val log = Files.readString(out.toPath)
    assert(finished, s"cluster smoke timed out; tail:\n${log.takeRight(2000)}")
    assert(proc.exitValue() == 0,
      s"cluster smoke exited ${proc.exitValue()}; tail:\n${log.takeRight(2000)}")

    val S = """SMOKE \{"name":"([^"]+)","rows":([0-9]+),"hash":"([0-9a-f]+)"\}""".r
    val got = S.findAllMatchIn(log)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3))).toMap
    names.foreach { n =>
      assert(got.contains(n), s"no SMOKE line for $n; tail:\n${log.takeRight(2000)}")
      assert(got(n) == want(n),
        s"$n differs on local-cluster: got=${got(n)} want=${want(n)}")
      assert(got(n)._1 > 0, s"$n returned zero rows on the cluster")
    }
    val C = """CKPT \{"files":([0-9]+)\}""".r
    val ckptFiles = C.findFirstMatchIn(log).map(_.group(1).toLong)
    assert(ckptFiles.exists(_ > 0),
      s"no reliable checkpoint files written under the dir (got $ckptFiles) — " +
        s"the cluster posture's reliable branch did not engage")
  }
}
