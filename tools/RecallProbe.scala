// Throwaway: margins of the capped summaries' in-plan expectation floors
// and the l7d ADC+R recall, at all three SFs.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' 'runMain graft.tools.RecallProbe'
package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local()
    val cap = 48L
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = graft.core.Tables.embeddings(s, d)
      val sizes = emb.groupBy(col("label")).agg(count(lit(1)).as("cnt"))

      // l6c: realized kept pairs vs uniform-split expectation
      val exact = VectorOps.l6CosinePairs(s, d).cache()
      val nEx = exact.count()
      val nCap = VectorOps.l6cCosinePairsCapped(s, d).count()
      val floorPairs = exact.groupBy(col("label")).agg(count(lit(1)).as("npairs"))
        .join(sizes, Seq("label"))
        .agg(sum(col("npairs") * pow(lit(0.5), VectorOps.bitsFor(col("cnt"), cap))))
        .head().getDouble(0)
      println(f"$sf l6c  kept=$nCap exact=$nEx floor=$floorPairs%.1f margin=${nCap / (0.85 * floorPairs)}%.2fx")

      // l7e: realized hits vs per-query expectation
      val ex7 = VectorOps.l7KnnBruteForce(s, d).select(col("ida"), col("idb")).cache()
      val hits = VectorOps.l7eKnnBruteCapped(s, d).where(col("rk") === 1)
        .select(col("ida"), col("idb")).join(ex7, Seq("ida", "idb"), "left_semi").count()
      val floorHits = ex7.select(col("ida")).distinct()
        .join(emb.select(col("vec_id").as("ida"), col("label")), Seq("ida"))
        .join(sizes, Seq("label"))
        .agg(sum(pow(lit(0.5), VectorOps.bitsFor(col("cnt"), cap))))
        .head().getDouble(0)
      println(f"$sf l7e  hits=$hits floor=$floorHits%.1f margin=${hits / (0.9 * floorHits)}%.2fx")

      // l7d ADC+R recall
      val nq = ex7.agg(countDistinct(col("ida"))).head().getLong(0)
      val pqHits = VectorOps.l7dKnnPq(s, d).where(col("rk") === 1)
        .select(col("ida"), col("idb")).join(ex7, Seq("ida", "idb"), "left_semi").count()
      println(f"$sf l7d  recall=${pqHits.toDouble / nq}%.3f (floor 0.8)")
      exact.unpersist(); ex7.unpersist()
    }
    s.stop()
  }
}
