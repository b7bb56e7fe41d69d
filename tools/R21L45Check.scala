// r21 l45 post-change adjudication: OLD (window prefix + self-join
// candidates) inlined vs the NEW declared query, same JVM, 3 rounds.
//   tools/run.sh graft.tools.R21L45Check
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object R21L45Check {
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
    val tau = 0.3
    def oldL45(): DataFrame = {
      val docs = graft.ops.TextOps.hashedShingleDocs(s, d)
      val ex = docs
        .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("sv"))
      val dfT = ex.groupBy(col("sv")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sv"))
      val pref = ex.join(dfT.hint("shuffle_hash"), Seq("sv"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= col("n") - ceil(lit(tau) * col("n")) + lit(1))
        .select(col("sv"), col("doc_id"), col("n"))
      val cand = pref.select(col("sv"), col("doc_id").as("da"), col("n").as("na"))
        .join(pref.select(col("sv"), col("doc_id").as("db"), col("n").as("nb"))
          .hint("shuffle_hash"), Seq("sv"))
        .where(col("da") < col("db") &&
          col("na") >= lit(tau) * col("nb") && col("nb") >= lit(tau) * col("na"))
        .select(col("da"), col("db")).distinct()
      cand
        .join(docs.select(col("doc_id").as("da"), col("hs").as("hsa")), Seq("da"))
        .join(docs.select(col("doc_id").as("db"), col("hs").as("hsb")), Seq("db"))
        .withColumn("inter", size(array_intersect(col("hsa"), col("hsb"))))
        .withColumn("jaccard",
          col("inter") / (size(col("hsa")) + size(col("hsb")) - col("inter")))
        .where(col("jaccard") >= tau)
        .select(col("da"), col("db"), col("jaccard"))
    }
    println(s"== $d (alternating, 3 rounds)")
    for (r <- 1 to 3) {
      val ta = time(oldL45().count())
      val tb = time(graft.SparkEntry.queries("l45_prefix_join")(s, d).count())
      println(f"  round $r: OLD $ta%6.2f s   NEW $tb%6.2f s")
    }
    s.stop()
  }
}
