// Synthesize a COPIES× scale fixture from an existing sf dir by id-offset
// replication — the sf1 rehearsal input (VERDICT r9 #7). Run via:
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.ScaleFixture /root/testdata/sf0.1 /tmp/graft_sf1 10'
//
// Replication semantics (what "10× the corpus" means per table family):
//  - TPC-H keys (order/part/supp/cust) offset by copy·10^8, so the copies
//    are DISJOINT — the co-occurrence graph becomes 10 disconnected
//    copies (10× nodes, 10× edges, same diameter/degree profile), which
//    is how a corpus actually grows; offsetting only orderkeys would
//    instead multiply edge WEIGHTS on a fixed graph.
//  - documents get per-copy token salting (every token suffixed `_k`):
//    intra-copy near-dup structure is preserved EXACTLY (each copy
//    reproduces the original's pair set) while copies share no token,
//    shingle, or simhash neighborhood — near-dup volume grows linearly,
//    so a rehearsal measures plan scaling, not the quadratic blowup of
//    verbatim replication.
package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.Sessions.local()
    val off = 100000000L // far above any key in the source fixtures
    val ks = spark.range(copies.toLong).select(col("id").as("k"))
    def rep(name: String)(f: DataFrame => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val outDf = f(base.crossJoin(ks))
      outDf.select(base.columns.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $out/$name.parquet (${copies}x)")
    }
    def shift(c: String): Column = col(c) + col("k") * off
    rep("orders")(df => df
      .withColumn("o_orderkey", shift("o_orderkey"))
      .withColumn("o_custkey", shift("o_custkey")))
    rep("lineitem")(df => df
      .withColumn("l_orderkey", shift("l_orderkey"))
      .withColumn("l_partkey", shift("l_partkey"))
      .withColumn("l_suppkey", shift("l_suppkey")))
    rep("documents")(df => df
      .withColumn("doc_id", shift("doc_id"))
      .withColumn("text", array_join(
        transform(split(col("text"), " "),
          t => concat(t, lit("_"), col("k").cast("string"))), " ")))
    spark.stop()
  }
}
