// r21 l30 A/B: PMI's slot self-join ((doc_id, pos)-keyed, corpus-scale
// both sides) vs MAP-SIDE pair generation from the token array (a
// window-k co-occurrence pair is a pure per-row function), plus
// aggregate-join marginals instead of three Window passes (the global
// n_total window moved ALL counts to one partition).
//   tools/run.sh graft.tools.R21L30Probe
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object R21L30Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.Sessions.local()
    s.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(s)
    def time(body: => Long): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(s)
      dt
    }
    val win = 2
    def variant(): DataFrame = {
      val docs = graft.core.Tables.documentsWide(s, d)
        .where(col("doc_id").isNotNull)
        .withColumn("t", split(col("text"), " "))
      val pairs = docs.select(explode(flatten(
        transform(sequence(lit(1), greatest(size(col("t")) - 1, lit(0))), i =>
          transform(sequence(lit(1), least(lit(win), size(col("t")) - i)), k =>
            struct(element_at(col("t"), i).as("wa"),
              element_at(col("t"), i + k).as("wb")))))).as("p"))
        .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      val counts = pairs.groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("n_ab"))
      val ca = counts.groupBy(col("wa")).agg(sum(col("n_ab")).as("ca"))
      val cb = counts.groupBy(col("wb")).agg(sum(col("n_ab")).as("cb"))
      val tot = counts.agg(sum(col("n_ab")).as("n_total"))
      counts.join(ca, Seq("wa")).join(cb, Seq("wb"))
        .crossJoin(broadcast(tot))
        .withColumn("pmi",
          round(log(col("n_ab").cast("double") * col("n_total") /
            (col("ca").cast("double") * col("cb"))), 6))
        .select(col("wa"), col("wb"), col("n_ab"), col("ca"), col("cb"), col("pmi"))
    }
    println(s"== $d (alternating, 3 rounds)")
    for (r <- 1 to 3) {
      val a = time(graft.SparkEntry.queries("l30_pmi_cooccur")(s, d).count())
      val b = time(variant().count())
      println(f"  round $r: CURRENT $a%5.2f s   VARIANT $b%5.2f s")
    }
    val a = graft.SparkEntry.queries("l30_pmi_cooccur")(s, d)
      .select(col("wa"), col("wb"), col("n_ab"), col("ca"), col("cb"), col("pmi"))
    val b = variant()
    println(s"  parity (want 0): ${b.exceptAll(a).count() + a.exceptAll(b).count()}")
    s.stop()
  }
}
