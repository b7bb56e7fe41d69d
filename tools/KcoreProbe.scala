// l46_kcore cost breakdown at 1x and 10x (VERDICT r11 #3): the declared
// query's 10x wall-time exponent measured 0.91 — closest-to-linear of the
// rehearsed batch queries. This probe splits the cost per phase on BOTH
// fixtures so the exponent's source is attributable: edge BUILD (the
// lineitem pair join + distinct) vs bidirect materialization vs per-round
// degree agg vs per-round semi-join peel. Each phase is forced with an
// eager localCheckpoint, so phase times are additive (the declared query
// runs the same stages as ONE composed plan, i.e. strictly cheaper).
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.KcoreProbe /root/testdata/sf0.1 /tmp/graft_sf1'
package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/graft_sf1")
    val s = graft.core.Sessions.local()
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(s)
    def timed(work: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = work
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def breakdown(d: String): Unit = {
      System.err.println(s"=== $d ===")
      // phase 1: the co-occurrence edge build (pair join + distinct) —
      // the same shape coOccurrenceEdges memoizes for l35/l40/l46/l51
      val pl = graft.core.Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      var (dt, n) = timed {
        pl.count()
      }
      System.err.println(f"  order-part distinct        $dt%6.2fs rows=$n")
      val edges = pl.select(col("l_orderkey"), col("l_partkey").as("sa"))
        .join(pl.select(col("l_orderkey"), col("l_partkey").as("sb")),
          Seq("l_orderkey"))
        .where(col("sa") < col("sb"))
        .select(col("sa"), col("sb")).distinct()
        .localCheckpoint(true)
      val r1 = timed(edges.count())
      System.err.println(f"  edge build (pair+distinct) ${r1._1}%6.2fs edges=${r1._2}")
      // phase 2: bidirect + materialize (kcorePeel's cutBase)
      var bi: DataFrame = edges.select(col("sa").as("u"), col("sb").as("v"))
        .unionByName(edges.select(col("sb").as("u"), col("sa").as("v")))
        .localCheckpoint(true)
      val r2 = timed(bi.count())
      System.err.println(f"  bidirect materialize       ${r2._1}%6.2fs rows=${r2._2}")
      // phases 3..: three peel rounds, degree-agg and semi-join peel
      // forced separately per round
      for (round <- 1 to 3) {
        val keep = bi.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .where(col("deg") >= 3).select(col("u"))
          .localCheckpoint(true)
        val ra = timed(keep.count())
        val peeled = bi.join(keep, Seq("u"), "left_semi")
          .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
          .select(col("u"), col("v"))
          .localCheckpoint(true)
        val rb = timed(peeled.count())
        System.err.println(f"  round $round degree agg        ${ra._1}%6.2fs keep=${ra._2}")
        System.err.println(f"  round $round semi-join peel    ${rb._1}%6.2fs edges=${rb._2}")
        bi = peeled
      }
      graft.core.Caches.releaseAll(s)
      // declared end-to-end, twice: run 2 has the edge memo warm — the
      // delta IS the edge build's share of the declared wall time
      val e1 = timed(graft.ops.Graphs.queries("l46_kcore")(s, d).count())
      graft.core.Caches.releaseAll(s)
      val e2 = timed(graft.ops.Graphs.queries("l46_kcore")(s, d).count())
      graft.core.Caches.releaseAll(s)
      System.err.println(f"  declared l46 cold          ${e1._1}%6.2fs nodes=${e1._2}")
      System.err.println(f"  declared l46 edge-memo     ${e2._1}%6.2fs nodes=${e2._2}")
    }
    breakdown(small)
    breakdown(big)
    s.stop()
  }
}
