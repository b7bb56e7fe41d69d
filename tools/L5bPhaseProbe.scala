// l5b second-decade attribution (r16): the refreshed DecadeRehearsal put
// l5b's e2 at 1.64 — the highest in the table. l5b = eager localCheckpoint
// of (doc_id, hs) → 32 array_min signature transforms → band self-join →
// array-intersect verify. This times the phases cumulatively at the 10x
// and 100x dirs to name the growing term (checkpoint materialization,
// signature CPU, or the band join).
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L5bPhaseProbe
package graft.tools

import org.apache.spark.sql.functions._

object L5bPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/tmp/graft_sf1", "/tmp/graft_sf100")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      graft.core.Caches.releaseAll(spark)
    }
    dirs.zip(Seq(32, 320)).foreach { case (d, np) =>
      spark.conf.set("spark.sql.shuffle.partitions", np)
      println(s"== $d (shuffle.partitions=$np)")
      // inline twin of TextOps.hashedShingleDocs (private there)
      def hsDocs = graft.core.Tables.documentsWide(spark, d)
        .withColumn("t", split(col("text"), " "))
        .select(col("doc_id"), expr(
          "CASE WHEN size(t) >= 3 THEN array_distinct(transform(" +
            "sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))" +
            " ELSE array(array_join(t, ' ')) END").as("sh"))
        .select(col("doc_id"), expr("transform(sh, sv -> xxhash64(sv))").as("hs"))
      t("shingle arrays (no ckpt)")(hsDocs.count())
      t("shingle arrays localCheckpoint") {
        val c = hsDocs.localCheckpoint(eager = true)
        val n = c.count()
        n
      }
      t("+ 32-hash signatures") {
        val c = hsDocs.localCheckpoint(eager = true)
        c.select(col("doc_id"),
          array((0 until 32).map { i =>
            array_min(expr(s"transform(hs, h -> xxhash64($i, h))"))
          }: _*).as("sig")).select(explode(col("sig"))).count()
      }
      t("full l5b")(graft.ops.TextOps.l5bMinhashLsh(spark, d).count())
    }
    spark.stop()
  }
}
