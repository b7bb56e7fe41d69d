// r22 l45 phase split (guide §1): which stage owns the 3.5 s — the
// hashedShingleDocs checkpoint build (tokenize+shingle+hash, CPU), the
// df+prefix index, the bucket candidates, or the verification join.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.R22L45Phase [sfDir]'
package graft.tools

import org.apache.spark.sql.functions._

object R22L45Phase {
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
      println(f"  $label%-40s ${math.min(d1, d2)}%6.2f s  ($n rows)")
    }
    val tau = 0.3
    println(s"== l45 phases on $d (min of 2 per phase)")
    t("sketch: hashedShingleDocs.count") {
      graft.ops.TextOps.hashedShingleDocs(s, d).count()
    }
    def prefixed() = {
      val docs = graft.ops.TextOps.hashedShingleDocs(s, d)
      val ex = docs.select(col("doc_id"), size(col("hs")).as("n"),
        explode(col("hs")).as("sv"))
      val dfT = ex.groupBy(col("sv")).agg(count(lit(1)).as("df"))
      (docs, ex.join(dfT.hint("shuffle_hash"), Seq("sv"))
        .groupBy(col("doc_id"))
        .agg(first(col("n")).as("n"),
          sort_array(collect_list(struct(col("df"), col("sv")))).as("rs"))
        .select(col("doc_id"), col("n"),
          explode(slice(col("rs"), lit(1),
            (col("n") - ceil(lit(tau) * col("n")) + lit(1)).cast("int"))).as("r"))
        .select(col("r.sv").as("sv"), col("doc_id"), col("n")))
    }
    t("sketch + prefix index") { prefixed()._2.count() }
    def cands() = {
      val (docs, pref) = prefixed()
      val buckets = pref.groupBy(col("sv"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
        .where(size(col("ds")) >= 2)
      (docs, buckets
        .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
        .select(col("a.doc_id").as("da"), col("a.n").as("na"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(col("da"), col("na"), col("b.doc_id").as("db"), col("b.n").as("nb"))
        .where(col("na") >= lit(tau) * col("nb") && col("nb") >= lit(tau) * col("na"))
        .select(col("da"), col("db")).distinct())
    }
    t("sketch + prefix + candidates") { cands()._2.count() }
    t("candidates after POSITIONAL filter") {
      // the committed r22 shape minus the verify join: count what reaches
      // the verification stage now
      val docs = graft.ops.TextOps.hashedShingleDocs(s, d)
      val ex = docs.select(col("doc_id"), size(col("hs")).as("n"),
        explode(col("hs")).as("sv"))
      val dfT = ex.groupBy(col("sv")).agg(count(lit(1)).as("df"))
      val pref = ex.join(dfT.hint("shuffle_hash"), Seq("sv"))
        .groupBy(col("doc_id"))
        .agg(first(col("n")).as("n"),
          sort_array(collect_list(struct(col("df"), col("sv")))).as("rs"))
        .select(col("doc_id"), col("n"),
          posexplode(slice(col("rs"), lit(1),
            (col("n") - ceil(lit(tau) * col("n")) + lit(1)).cast("int")))
            .as(Seq("p", "r")))
        .select(col("r.sv").as("sv"), col("doc_id"), col("n"), col("p"))
      val buckets = pref.groupBy(col("sv"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n"), col("p"))))
          .as("ds"))
        .where(size(col("ds")) >= 2)
      buckets
        .select(posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
        .select(col("a.doc_id").as("da"), col("a.n").as("na"), col("a.p").as("pa"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(col("da"), col("na"), col("pa"),
          col("b.doc_id").as("db"), col("b.n").as("nb"), col("b.p").as("pb"))
        .where(col("na") >= lit(tau) * col("nb") && col("nb") >= lit(tau) * col("na"))
        .groupBy(col("da"), col("db"))
        .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
          min(col("pa")).as("pa"), min(col("pb")).as("pb"))
        .where(lit(13L) * (lit(1L) +
            least(col("na") - col("pa") - 1, col("nb") - col("pb") - 1)) >=
          lit(3L) * (col("na") + col("nb")))
        .count()
    }
    t("full l45") {
      graft.SparkEntry.queries("l45_prefix_join")(s, d).count()
    }
    s.stop()
  }
}
