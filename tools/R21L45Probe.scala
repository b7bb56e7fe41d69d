// r21 l45 variant A/B (guide §1/§2.4): the AllPairs prefix index closes
// candidates with a self-join on the prefix shingle — the df-attach +
// rank-window subtree feeds BOTH join sides (duplicated in the static
// plan; AQE stage reuse hides part of it) and the join shuffles the
// prefix table twice. Candidate variant: group each prefix-shingle
// bucket once, emit (da, db) candidates map-side from the sorted
// (doc_id, n) array with the length filter inline, then the same
// distinct + exact verification. One grouped exchange replaces the
// self-join, and the window subtree has exactly one consumer.
//   tools/run.sh graft.tools.R21L45Probe [dir...]
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object R21L45Probe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
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
    val tau = 0.3
    def variant(d: String): DataFrame = {
      val docs = graft.ops.TextOps.hashedShingleDocs(s, d)
      val ex = docs
        .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("sv"))
      val dfT = ex.groupBy(col("sv")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sv"))
      val pref = ex.join(dfT.hint("shuffle_hash"), Seq("sv"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= col("n") - ceil(lit(tau) * col("n")) + lit(1))
        .select(col("sv"), col("doc_id"), col("n"))
      val buckets = pref.groupBy(col("sv"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
        .where(size(col("ds")) >= 2)
      val cand = buckets
        .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
        .select(col("a.doc_id").as("da"), col("a.n").as("na"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(col("da"), col("na"), col("b.doc_id").as("db"), col("b.n").as("nb"))
        .where(col("na") >= lit(tau) * col("nb") && col("nb") >= lit(tau) * col("na"))
        .select(col("da"), col("db")).distinct()
      cand
        .join(docs.select(col("doc_id").as("da"), col("hs").as("hsa")), Seq("da"))
        .join(docs.select(col("doc_id").as("db"), col("hs").as("hsb")), Seq("db"))
        .withColumn("inter", size(array_intersect(col("hsa"), col("hsb"))))
        .withColumn("jaccard",
          col("inter") / (size(col("hsa")) + size(col("hsb")) - col("inter")))
        .where(col("jaccard") >= tau)
        .select(col("da"), col("db"), col("jaccard"))
    }
    // C: B + prefix via per-doc sorted-array slice instead of the rank
    // window (HashAggregate + per-doc array sort replaces Exchange + big
    // partition Sort + Window)
    def variantC(d: String): DataFrame = {
      val docs = graft.ops.TextOps.hashedShingleDocs(s, d)
      val ex = docs
        .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("sv"))
      val dfT = ex.groupBy(col("sv")).agg(count(lit(1)).as("df"))
      val pref = ex.join(dfT.hint("shuffle_hash"), Seq("sv"))
        .groupBy(col("doc_id"))
        .agg(first(col("n")).as("n"),
          sort_array(collect_list(struct(col("df"), col("sv")))).as("rs"))
        .select(col("doc_id"), col("n"),
          explode(slice(col("rs"), lit(1),
            (col("n") - ceil(lit(tau) * col("n")) + lit(1)).cast("int"))).as("r"))
        .select(col("r.sv").as("sv"), col("doc_id"), col("n"))
      val buckets = pref.groupBy(col("sv"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
        .where(size(col("ds")) >= 2)
      val cand = buckets
        .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
        .select(col("a.doc_id").as("da"), col("a.n").as("na"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(col("da"), col("na"), col("b.doc_id").as("db"), col("b.n").as("nb"))
        .where(col("na") >= lit(tau) * col("nb") && col("nb") >= lit(tau) * col("na"))
        .select(col("da"), col("db")).distinct()
      cand
        .join(docs.select(col("doc_id").as("da"), col("hs").as("hsa")), Seq("da"))
        .join(docs.select(col("doc_id").as("db"), col("hs").as("hsb")), Seq("db"))
        .withColumn("inter", size(array_intersect(col("hsa"), col("hsb"))))
        .withColumn("jaccard",
          col("inter") / (size(col("hsa")) + size(col("hsb")) - col("inter")))
        .where(col("jaccard") >= tau)
        .select(col("da"), col("db"), col("jaccard"))
    }
    dirs.foreach { d =>
      println(s"== $d")
      t("A: declared l45 (self-join candidates)")(
        graft.SparkEntry.queries("l45_prefix_join")(s, d).count())
      t("B: bucket-array candidates")(variant(d).count())
      t("C: B + collect-slice prefix (no window)")(variantC(d).count())
      t("parity B vs A (want 0)") {
        val va = graft.SparkEntry.queries("l45_prefix_join")(s, d)
        val vb = variant(d)
        vb.exceptAll(va).count() + va.exceptAll(vb).count()
      }
      t("parity C vs A (want 0)") {
        val va = graft.SparkEntry.queries("l45_prefix_join")(s, d)
        val vc = variantC(d)
        vc.exceptAll(va).count() + va.exceptAll(vc).count()
      }
    }
    s.stop()
  }
}
