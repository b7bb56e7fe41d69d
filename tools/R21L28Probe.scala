// r21 l28 A/B: containment's (doc_id, s) self-join vs bucket-array
// map-side pair emission (the l5c/l45 shape, but FULL ordered cross —
// containment is asymmetric, so every pair with differing doc ids is
// emitted in both directions).
//   tools/run.sh graft.tools.R21L28Probe
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object R21L28Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.Sessions.local()
    s.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(s)
    def t(label: String)(body: => Long): Unit = {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(s)
        (dt, n)
      }
      val (d1, n) = one(); val (d2, _) = one()
      println(f"  $label%-44s ${math.min(d1, d2)}%8.2f s  ($n rows)")
    }
    val (nGram, tau) = (3, 0.6)
    def variant(): DataFrame = {
      val docs = graft.core.Tables.documentsWide(s, d)
      val sh = graft.ops.TextOps.shingleRows(docs, nGram)
        .localCheckpoint(eager = true)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val buckets = sh.groupBy(col("s"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .where(size(col("ds")) >= 2)
      val pairs = buckets
        .select(explode(col("ds")).as("da"), col("ds"))
        .select(col("da"), explode(col("ds")).as("db"))
        .where(col("da") =!= col("db"))
      pairs.groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
        .withColumn("containment", col("inter") / col("na"))
        .where(col("containment") >= tau)
        .select(col("da"), col("db"), col("containment"))
    }
    println(s"== $d")
    t("A: declared l28 (self-join)")(
      graft.SparkEntry.queries("l28_containment")(s, d).count())
    t("B: bucket-array cross")(variant().count())
    t("parity (want 0)") {
      val a = graft.SparkEntry.queries("l28_containment")(s, d)
      val b = variant()
      b.exceptAll(a).count() + a.exceptAll(b).count()
    }
    s.stop()
  }
}
