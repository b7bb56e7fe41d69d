// l45 single-tokenize experiment (r16, the l5 L5ShareProbe result applied
// to the prefix join): l45's exploded (doc_id, n, sv) table feeds the df
// aggregation (keyed sv) and the df-attach join (keyed sv) as separate
// subtrees — two tokenize passes. An explicit repartition(sv) shares one
// exchange between them (the aggregate then needs no exchange of its own).
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L45ShareProbe
package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object L45ShareProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1", "/tmp/graft_sf100")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    val tau = 0.3
    def docsOf(d: String) = graft.core.Tables.documentsWide(spark, d)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), expr(
        "CASE WHEN size(t) >= 3 THEN array_distinct(transform(" +
          "sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))" +
          " ELSE array(array_join(t, ' ')) END").as("sh"))
      .select(col("doc_id"), expr("transform(sh, sv -> xxhash64(sv))").as("hs"))
      .localCheckpoint(eager = true)
    def prefixPairs(docs: org.apache.spark.sql.DataFrame, share: Boolean) = {
      val ex0 = docs.select(col("doc_id"), size(col("hs")).as("n"),
        explode(col("hs")).as("sv"))
      val ex = if (share) ex0.repartition(col("sv")) else ex0
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
    }
    dirs.zip(Seq(32, 32, 320)).foreach { case (d, np) =>
      spark.conf.set("spark.sql.shuffle.partitions", np)
      println(s"== $d (shuffle.partitions=$np)")
      Seq("A current" -> false, "B repartition(sv)-shared" -> true).foreach {
        case (label, share) =>
          val ts = (1 to 2).map { _ =>
            val docs = docsOf(d)
            val t0 = System.nanoTime()
            val n = prefixPairs(docs, share).count()
            graft.core.Caches.releaseAll(spark)
            ((System.nanoTime() - t0) / 1e9, n)
          }
          println(f"  $label%-26s min ${ts.map(_._1).min}%7.2f s " +
            f"(runs ${ts.map(t => f"${t._1}%.2f").mkString("/")}; ${ts.head._2} pairs)")
      }
    }
    spark.stop()
  }
}
