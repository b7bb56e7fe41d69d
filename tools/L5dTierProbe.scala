// l5d (native MinHashSketch aggregate) at the decade tiers — the
// comparison point for l5b's e2 = 1.64: l5b allocates 32 transformed
// arrays per row for its signatures (the GC-heavy term L5bPhaseProbe
// isolated); l5d streams exploded shingle rows through a
// TypedImperativeAggregate (k·8 bytes of state per doc). If l5d's
// second decade is materially flatter, it is the recommended signature
// path at corpus scale (signatures are bit-identical, asserted in
// ScalaTest).   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L5dTierProbe
package graft.tools

object L5dTierProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/tmp/graft_sf1", "/tmp/graft_sf100")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    dirs.zip(Seq(32, 320)).foreach { case (d, np) =>
      spark.conf.set("spark.sql.shuffle.partitions", np)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.ops.TextOps.l5dMinhashAgg(spark, d).count()
        graft.core.Caches.releaseAll(spark)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"l5d at $d (partitions=$np): min ${ts.map(_._1).min}%.2f s " +
        f"(runs ${ts.map(t => f"${t._1}%.2f").mkString("/")}; ${ts.head._2} rows)")
    }
    spark.stop()
  }
}
