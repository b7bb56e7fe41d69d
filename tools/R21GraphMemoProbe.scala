// r21 graph-family memo A/B (guide §1/§2.4): the co-occurrence memo
// stores the DISTINCT (sa < sb) edge list, and every consumer re-derives
// its own structure with at least one more edge-scale exchange (l40's
// adjacency groupBy, l46's bidirect+repartition, l35's degree agg + two
// degree joins). Variant memo: store the BIDIRECTED adjacency table
// (u -> collect_set(v)) built from the raw per-order basket pairs in ONE
// exchange — dedup happens inside the aggregate (collect_set ==
// distinct), the edge list and degrees then derive MAP-SIDE:
//   edges  = explode(vs) where u < v        (deg(u) rides along as size)
//   deg    = size(vs)                       (no aggregation)
//   LPA    = the adjacency table itself     (zero extra exchanges)
//   k-core = size(vs) degrees + node-scale removed joins
//   l35    = one deg join (v side) instead of two, no degree agg
//   tools/run.sh graft.tools.R21GraphMemoProbe [dir...]
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object R21GraphMemoProbe {
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
    // adjacency memo: raw basket pairs, bidirected map-side, ONE exchange
    def adjacency(d: String): DataFrame = {
      val baskets = graft.core.Tables.lineitem(s, d)
        .where(col("l_orderkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val pairs = baskets
        .select(posexplode(col("ps")).as(Seq("i", "sa")), col("ps"))
        .select(col("sa"),
          explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("sb"))
      graft.core.Lineage.cut(
        pairs.select(explode(array(
            struct(col("sa").as("u"), col("sb").as("v")),
            struct(col("sb").as("u"), col("sa").as("v")))).as("e"))
          .select(col("e.u").as("u"), col("e.v").as("v"))
          .groupBy(col("u")).agg(collect_set(col("v")).as("vs")))
    }
    def lpaFromAdj(adj: DataFrame, rounds: Int): DataFrame = {
      var labels = adj.select(col("u").as("node"), array_min(col("vs")).as("lab"))
      for (_ <- 2 to rounds)
        labels = adj.join(labels.select(col("node").as("u"), col("lab").as("nlab")),
            Seq("u"))
          .select(explode(col("vs")).as("n2"), col("nlab"))
          .groupBy(col("n2"), col("nlab")).agg(count(lit(1)).as("c"))
          .groupBy(col("n2"))
          .agg(max(struct(col("c"), (-col("nlab")).as("neg"))).as("m"))
          .select(col("n2").as("node"), (-col("m.neg")).as("lab"))
      labels.select(col("node"), col("lab").as("community"))
    }
    def kcoreFromAdj(adj: DataFrame, k: Int, rounds: Int): DataFrame = {
      var deg = adj.select(col("u"), size(col("vs")).cast("long").as("deg"))
        .localCheckpoint(eager = true)
      var r = 1
      var peeling = true
      while (r <= rounds && peeling) {
        val removed = deg.where(col("deg") < k).select(col("u"))
        if (removed.isEmpty) peeling = false
        else {
          val dec = adj.join(removed, Seq("u"))
            .select(explode(col("vs")).as("u"))
            .groupBy(col("u")).agg(count(lit(1)).as("dec"))
          deg = deg.join(removed, Seq("u"), "left_anti")
            .join(dec, Seq("u"), "left")
            .select(col("u"),
              (col("deg") - coalesce(col("dec"), lit(0L))).as("deg"))
          if (r < rounds) deg = deg.localCheckpoint(eager = true)
        }
        r += 1
      }
      deg.where(col("deg") > 0).select(col("u").as("node"), col("deg"))
    }
    def trianglesFromAdj(adj: DataFrame): DataFrame = {
      val degT = adj.select(col("u").as("sb"), size(col("vs")).as("db"))
      val ed = adj.select(col("u").as("sa"), size(col("vs")).as("da"),
          explode(col("vs")).as("sb"))
        .where(col("sa") < col("sb"))
      val withD = ed.join(broadcast(degT), Seq("sb"))
      val lower = struct(col("da"), col("sa")) < struct(col("db"), col("sb"))
      val e = withD.select(
        when(lower, col("sa")).otherwise(col("sb")).as("u"),
        when(lower, col("sb")).otherwise(col("sa")).as("v"))
        .localCheckpoint(eager = true)
      val adjOut = e.groupBy(col("u")).agg(collect_list(col("v")).as("nbrs"))
      val tri = e
        .join(adjOut.select(col("u"), col("nbrs").as("nu")), Seq("u"))
        .join(adjOut.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
        .select(size(array_intersect(col("nu"), col("nv"))).as("c"))
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
      adj.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(ed.agg(count(lit(1)).as("n_edges")))
        .crossJoin(tri)
    }
    dirs.foreach { d =>
      println(s"== $d")
      t("A l40 current")(graft.SparkEntry.queries("l40_label_prop")(s, d).count())
      t("B l40 from adjacency memo")(lpaFromAdj(adjacency(d), 3).count())
      t("A l46b current")(graft.SparkEntry.queries("l46b_kcore_deep")(s, d).count())
      t("B l46b from adjacency memo")(kcoreFromAdj(adjacency(d), 75, 3).count())
      t("A l46 current")(graft.SparkEntry.queries("l46_kcore")(s, d).count())
      t("B l46 from adjacency memo")(kcoreFromAdj(adjacency(d), 3, 3).count())
      t("A l35 current")(graft.SparkEntry.queries("l35_triangles")(s, d).count())
      t("B l35 from adjacency memo")(trianglesFromAdj(adjacency(d)).count())
      t("parity l40 (want 0)") {
        val a = graft.SparkEntry.queries("l40_label_prop")(s, d)
        val b = lpaFromAdj(adjacency(d), 3)
        b.exceptAll(a).count() + a.exceptAll(b).count()
      }
      t("parity l46b (want 0)") {
        val a = graft.SparkEntry.queries("l46b_kcore_deep")(s, d)
        val b = kcoreFromAdj(adjacency(d), 75, 3)
        b.exceptAll(a).count() + a.exceptAll(b).count()
      }
      t("parity l35 (want 0)") {
        val a = graft.SparkEntry.queries("l35_triangles")(s, d)
        val b = trianglesFromAdj(adjacency(d))
        b.exceptAll(a).count() + a.exceptAll(b).count()
      }
    }
    s.stop()
  }
}
