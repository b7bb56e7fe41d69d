// r21 l26 A/B: round 1 of PageRank joins the edge table against a
// UNIFORM rank vector (pr0 = 1/N by definition) — the join only attaches
// the same constant to every edge row, so round 1's inflow is computable
// straight off the out-weighted edge table with the 1-row N broadcast:
// one edge-scale join removed, no precondition (true for any graph).
//   tools/run.sh graft.tools.R21L26Probe
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object R21L26Probe {
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
    def variant(damping: Double, iters: Int): DataFrame = {
      val li = graft.core.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = graft.core.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
      val edges0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(
          concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .agg(count(lit(1)).as("w"))
      val edges = graft.core.Lineage.cut(edges0)
      val nodes = graft.core.Lineage.cut(edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct())
      val nN = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
      val ew = edges
        .join(edges.groupBy(col("src")).agg(sum(col("w")).as("outw")), Seq("src"))
      var pr: DataFrame = null
      for (i <- 1 to iters) {
        val inflow =
          if (i == 1)
            ew.crossJoin(nN)
              .select(col("dst"), ((lit(1.0) / col("n_nodes")).as("pr")), col("w"), col("outw"))
              .groupBy(col("dst").as("node"))
              .agg(sum(col("pr") * col("w") / col("outw")).as("inflow"))
          else
            ew.join(pr.withColumnRenamed("node", "src"), Seq("src"))
              .groupBy(col("dst").as("node"))
              .agg(sum(col("pr") * col("w") / col("outw")).as("inflow"))
        pr = nodes.crossJoin(nN)
          .join(inflow, Seq("node"), "left_outer")
          .select(col("node"),
            (lit(1.0 - damping) / col("n_nodes") +
              lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      }
      pr.select(col("node"), round(col("pr"), 8).as("pr"))
    }
    println(s"== $d (alternating, 3 rounds)")
    for (r <- 1 to 3) {
      val ta = time(graft.SparkEntry.queries("l26_pagerank")(s, d).count())
      val tb = time(variant(0.85, 3).count())
      println(f"  round $r: CURRENT $ta%6.2f s   VARIANT $tb%6.2f s")
    }
    val a = graft.SparkEntry.queries("l26_pagerank")(s, d)
    val b = variant(0.85, 3)
    println(s"  parity (want 0): ${b.exceptAll(a).count() + a.exceptAll(b).count()}")
    s.stop()
  }
}
