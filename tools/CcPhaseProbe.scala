// CC round-1 cost isolation (r16): after the single-pass explode edge fix,
// l5e's round-1 job still costs ~2.3x the standalone pair-join count at the
// 100x fixture (137 s vs 60 s, /tmp/ccdebug2.log). This times the round-1
// plan shape cumulatively — pairs alone, +explode, +persist, +groupBy,
// +localCheckpoint — to name which wrapper pays the extra.
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.CcPhaseProbe /tmp/graft_sf100
package graft.tools

import org.apache.spark.sql.functions._

object CcPhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf100")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", "320").toInt
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    def pairs = graft.ops.TextOps.l5JaccardPairs(spark, d)
      .select(col("da"), col("db"))
    def edges = pairs.select(explode(array(
        struct(col("da").as("da"), col("db").as("db")),
        struct(col("db").as("da"), col("da").as("db")))).as("e"))
      .select(col("e.da").as("da"), col("e.db").as("db"))
    def round1(e: org.apache.spark.sql.DataFrame) =
      e.groupBy(col("da")).agg(min(col("db")).as("nmin"))
        .select(col("da").as("id"), col("da").as("prev"),
          least(col("da"), col("nmin")).as("component"))
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"  $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      graft.core.Caches.releaseAll(spark)
    }
    println(s"== $d (shuffle.partitions=$parts)")
    t("pairs.count")(pairs.count())
    t("edges.count (explode, no persist)")(edges.count())
    t("round1.count (no persist/ckpt)")(round1(edges).count())
    t("edges.persist + round1.count") {
      val e = edges.persist()
      round1(e).count()
      e.unpersist(blocking = false)
    }
    t("edges.persist + round1 localCkpt") {
      val e = edges.persist()
      round1(e).localCheckpoint(eager = true)
      e.unpersist(blocking = false)
    }
    spark.stop()
  }
}
