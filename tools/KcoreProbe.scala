package graft.tools
import org.apache.spark.sql.functions._
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.tune(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(work: => Long): Unit = {
      val t0 = System.nanoTime(); val n = work
      System.err.println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
    }
    val pl = graft.core.Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = pl.select(col("l_orderkey"), col("l_partkey").as("sa"))
      .join(pl.select(col("l_orderkey"), col("l_partkey").as("sb")), Seq("l_orderkey"))
      .where(col("sa") < col("sb")).select(col("sa"), col("sb")).distinct()
    time("edges")(edges.count())
    time("l46 current")(graft.ops.Graphs.queries("l46_kcore")(s, d).count())
    time("l46 current again")(graft.ops.Graphs.queries("l46_kcore")(s, d).count())
    // variant: no per-round checkpoint, single composed plan
    def kcoreNoCkpt(k: Int, rounds: Int): org.apache.spark.sql.DataFrame = {
      var bi = edges.select(col("sa").as("u"), col("sb").as("v"))
        .unionByName(edges.select(col("sb").as("u"), col("sa").as("v")))
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val keep = bi.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .where(col("deg") >= k).select(col("u"))
        bi = bi.join(keep, Seq("u"), "left_semi")
          .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
          .select(col("u"), col("v"))
      }
      bi.groupBy(col("u")).agg(count(lit(1)).as("deg")).select(col("u").as("node"), col("deg"))
    }
    time("no per-round ckpt")(kcoreNoCkpt(3, 3).count())
    time("no per-round ckpt again")(kcoreNoCkpt(3, 3).count())
    s.stop()
  }
}
