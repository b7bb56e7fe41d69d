// r21 l40 variant A/B (guide §1/§2.4): synchronous LPA over the part
// co-occurrence graph does, per round, one edge-scale join + two
// aggregations. Two candidate cuts:
//  (B) ROUND-1 ALGEBRAIC SHORTCUT — on a DISTINCT simple graph every
//      (u, neighbor-label) count in round 1 is exactly 1 (labels start as
//      ids and the bidirected edge list has no duplicates), so round 1's
//      "most frequent neighbor label, count desc / label asc" is simply
//      min(v) per u — one aggregation replaces join + two aggregations,
//      and the node-set distinct (labels init) disappears too.
//  (C) B + ADJACENCY ARRAYS for later rounds — group the bidirected edge
//      list once into (v, us[]) and per round join node-scale labels to
//      node-scale adjacency, exploding map-side (the triangle-count
//      edge-iterator trick) instead of joining the edge table per round.
//   tools/run.sh graft.tools.R21L40Probe [dir...]
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object R21L40Probe {
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
    def edges(d: String): DataFrame = graft.ops.Graphs.coOccurrenceEdges(s, d)
    def bi(e: DataFrame): DataFrame =
      e.select(col("sa").as("u"), col("sb").as("v"))
        .unionByName(e.select(col("sb").as("u"), col("sa").as("v")))
        .repartition(col("v")).localCheckpoint(eager = true)
    def lpaRound(b: DataFrame, labels: DataFrame): DataFrame =
      b.join(labels.select(col("node").as("v"), col("lab").as("nlab")), Seq("v"))
        .groupBy(col("u"), col("nlab")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("nlab")).as("neg"))).as("m"))
        .select(col("u").as("node"), (-col("m.neg")).as("lab"))
    def adjRound(adj: DataFrame, labels: DataFrame): DataFrame =
      adj.join(labels.select(col("node").as("v"), col("lab").as("nlab")), Seq("v"))
        .select(explode(col("us")).as("u"), col("nlab"))
        .groupBy(col("u"), col("nlab")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("nlab")).as("neg"))).as("m"))
        .select(col("u").as("node"), (-col("m.neg")).as("lab"))
    dirs.foreach { d =>
      println(s"== $d")
      t("A: declared l40 (current)")(
        graft.SparkEntry.queries("l40_label_prop")(s, d).count())
      t("B: round-1 min shortcut + current rounds") {
        val b = bi(edges(d))
        var labels = b.groupBy(col("u")).agg(min(col("v")).as("lab"))
          .select(col("u").as("node"), col("lab"))
        for (_ <- 2 to 3) labels = lpaRound(b, labels)
        labels.select(col("node"), col("lab").as("community")).count()
      }
      t("C: B + adjacency-array rounds") {
        val b = bi(edges(d))
        val adj = b.groupBy(col("v")).agg(collect_list(col("u")).as("us"))
          .localCheckpoint(eager = true)
        var labels = adj.select(col("v").as("node"), array_min(col("us")).as("lab"))
        for (_ <- 2 to 3) labels = adjRound(adj, labels)
        labels.select(col("node"), col("lab").as("community")).count()
      }
      t("parity B vs A (want 0)") {
        val b = bi(edges(d))
        var labels = b.groupBy(col("u")).agg(min(col("v")).as("lab"))
          .select(col("u").as("node"), col("lab"))
        for (_ <- 2 to 3) labels = lpaRound(b, labels)
        val vb = labels.select(col("node"), col("lab").as("community"))
        val va = graft.SparkEntry.queries("l40_label_prop")(s, d)
        vb.exceptAll(va).count() + va.exceptAll(vb).count()
      }
      t("parity C vs A (want 0)") {
        val b = bi(edges(d))
        val adj = b.groupBy(col("v")).agg(collect_list(col("u")).as("us"))
          .localCheckpoint(eager = true)
        var labels = adj.select(col("v").as("node"), array_min(col("us")).as("lab"))
        for (_ <- 2 to 3) labels = adjRound(adj, labels)
        val vc = labels.select(col("node"), col("lab").as("community"))
        val va = graft.SparkEntry.queries("l40_label_prop")(s, d)
        vc.exceptAll(va).count() + va.exceptAll(vc).count()
      }
    }
    s.stop()
  }
}
