package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch recall/cost sweep main (not part of the library surface):
  * measures top-1-in-exact-top-3 recall and wall time of the IVFADC path
  * per probe width, to pick the declared nprobe (VERDICT r6 #7; curve
  * recorded in PLANS.md). */
object Sweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rec(name: String, sf: String, ann: DataFrame, exact: DataFrame): Unit = {
      val ex = exact.select(col("ida"), col("idb")).cache()
      val top1 = ann.where(col("rk") === 1).select(col("ida"), col("idb"))
      val nq = ex.select(countDistinct(col("ida"))).head.getLong(0)
      val nHit = top1.join(ex, Seq("ida", "idb"), "left_semi").count()
      println(f"XSWEEP $name $sf: recall=${nHit.toDouble / nq}%.4f")
      ex.unpersist()
    }
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val exact = graft.ops.VectorOps.l7KnnBruteForce(spark, sf).cache()
      exact.count()
      for ((np, c) <- Seq((4, 8), (4, 12), (6, 12), (6, 16), (8, 16))) {
        val t0 = System.nanoTime()
        rec(s"l7f-np$np-c$c", sf,
          graft.ops.VectorOps.l7fKnnIvfPqWith(np, c)(spark, sf), exact)
        println(f"XTIME l7f-np$np-c$c $sf: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        graft.core.Caches.releaseAll(spark)
      }
      exact.unpersist()
    }
    println("SWEEP DONE")
    spark.stop()
  }
}
