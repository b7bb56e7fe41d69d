// r21 k-core variant A/B (guide §1/§2.3): the degree-delta peel scans
// the FULL bidirected edge table every round (bi ⋈ removed left_semi →
// groupBy(v)) to compute degree decrements, and pays a separate
// edge-scale degree aggregation up front. Variant: group the bidirected
// edges once into per-node adjacency arrays — the initial degree table
// is then size(us) (free), and each round's decrement joins the
// NODE-scale adjacency against the removed set and explodes only the
// removed nodes' neighbor lists map-side.
//   tools/run.sh graft.tools.R21KcoreProbe [dir...]
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object R21KcoreProbe {
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
    def peelAdj(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
      val adj = graft.core.Lineage.cut(
        edges.select(col("sa").as("u"), col("sb").as("v"))
          .unionByName(edges.select(col("sb").as("u"), col("sa").as("v")))
          .groupBy(col("u")).agg(collect_list(col("v")).as("vs")))
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
      deg.where(col("deg") > 0)
        .select(col("u").as("node"), col("deg"))
    }
    dirs.foreach { d =>
      println(s"== $d")
      def edges = graft.ops.Graphs.coOccurrenceEdges(s, d)
      t("A: declared l46 (k=3, no removals)")(
        graft.SparkEntry.queries("l46_kcore")(s, d).count())
      t("B: adjacency peel (k=3)")(peelAdj(edges, 3, 3).count())
      t("A: declared l46b (k=75, real peels)")(
        graft.SparkEntry.queries("l46b_kcore_deep")(s, d).count())
      t("B: adjacency peel (k=75)")(peelAdj(edges, 75, 3).count())
      t("parity k=75 (want 0)") {
        val va = graft.SparkEntry.queries("l46b_kcore_deep")(s, d)
        val vb = peelAdj(edges, 75, 3)
        vb.exceptAll(va).count() + va.exceptAll(vb).count()
      }
      t("parity k=3 (want 0)") {
        val va = graft.SparkEntry.queries("l46_kcore")(s, d)
        val vb = peelAdj(edges, 3, 3)
        vb.exceptAll(va).count() + va.exceptAll(vb).count()
      }
    }
    s.stop()
  }
}
