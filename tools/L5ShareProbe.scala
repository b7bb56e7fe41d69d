// l5 single-tokenize experiment (r16): the shipped l5 plan computes the
// shingle stream TWICE — once into the s-keyed pair-join exchange and once
// into the doc_id-keyed sizes aggregation (different shuffle keys, so no
// exchange reuse; tokenize+shingle is the CPU-dominant stage, ~35 s of the
// ~57 s at the 100x tier per DedupProbe). Variant B inserts an explicit
// repartition(s) that all three consumers read (exchange reuse), paying
// one extra 8-byte-pair shuffle for the sizes rollup instead of a second
// tokenize pass. This times both variants; if B wins at both tiers the
// operator changes (r15 already measured that a persist() barrier LOSES —
// this keeps lazy concurrent stages, sharing only the exchange).
//   SPARK_DRIVER_MEM=64g tools/run.sh graft.tools.L5ShareProbe
package graft.tools

import org.apache.spark.sql.functions._

object L5ShareProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/tmp/graft_sf1", "/tmp/graft_sf100")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    def shOf(d: String) = graft.core.Tables.documents(spark, d)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(t) >= 3 THEN array_distinct(transform(" +
          "sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))" +
          " ELSE array(array_join(t, ' ')) END")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    def pairsOver(sh: org.apache.spark.sql.DataFrame) = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("da"), col("s"))
      val b = sh.select(col("doc_id").as("db"), col("s"))
      a.join(b.hint("shuffle_hash"), Seq("s"))
        .where(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
        .where(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.3)
        .select(col("da"), col("db"))
    }
    dirs.zip(Seq(32, 320)).foreach { case (d, np) =>
      spark.conf.set("spark.sql.shuffle.partitions", np)
      println(s"== $d (shuffle.partitions=$np)")
      Seq(
        "A current (2 tokenize passes)" -> (() => pairsOver(shOf(d))),
        "B repartition(s)-shared" -> (() => pairsOver(shOf(d).repartition(col("s"))))
      ).foreach { case (label, mk) =>
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = mk().count()
          graft.core.Caches.releaseAll(spark)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"  $label%-32s min ${ts.map(_._1).min}%7.2f s " +
          f"(runs ${ts.map(t => f"${t._1}%.2f").mkString("/")}; ${ts.head._2} pairs)")
      }
    }
    spark.stop()
  }
}
