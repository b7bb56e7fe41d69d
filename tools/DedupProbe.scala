// Phase isolation for the l5e dedup-clustering 100x blow-up found by
// DecadeRehearsal r15 (l5f/l49: ~7.9 s at 10x -> ~285 s at 100x,
// e2 ≈ 1.6-1.7 while every input row count grows exactly 10x): time the
// pipeline's phases separately at each dir to localize the super-linear
// term — shingle explode (scan-bound), exact-Jaccard pairs (the inverted-
// index self-join), and the full CC clustering.
//   SPARK_DRIVER_MEM=64g sbt \
//     'set Compile/unmanagedSourceDirectories += file("tools")' \
//     'runMain graft.tools.DedupProbe /tmp/graft_sf1 /tmp/graft_sf100'
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/tmp/graft_sf1", "/tmp/graft_sf100")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", "320").toInt
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(spark)
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      graft.core.Caches.releaseAll(spark)
    }
    dirs.foreach { d =>
      println(s"== $d (shuffle.partitions=$parts)")
      t("shingle explode+count") {
        // inline twin of TextOps.shingles (private there) — scan baseline
        graft.core.Tables.documents(spark, d)
          .withColumn("t", split(col("text"), " "))
          .select(explode(expr(
            "CASE WHEN size(t) >= 3 THEN array_distinct(transform(" +
              "sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))" +
              " ELSE array(array_join(t, ' ')) END")).as("s0"))
          .select(xxhash64(col("s0")).as("s")).count()
      }
      // the decisive diagnostics: does any shingle's document frequency
      // grow with the copy count (it must not — the fixture salts every
      // token), and how big is the df² candidate stream the self-join
      // feeds the (da, db) aggregation?
      locally {
        val sh = graft.core.Tables.documents(spark, d)
          .withColumn("t", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(
            "CASE WHEN size(t) >= 3 THEN array_distinct(transform(" +
              "sequence(1, size(t)-2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])))" +
              " ELSE array(array_join(t, ' ')) END")).as("s0"))
          .select(col("doc_id"), xxhash64(col("s0")).as("s"))
          .localCheckpoint(true)
        t("df histogram (top-5 + sum df^2)") {
          val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
            .localCheckpoint(true)
          df.orderBy(col("df").desc).limit(5).collect()
            .foreach(r => println(s"    df=${r.getLong(1)} shingle=${r.getLong(0)}"))
          val sums = df.agg(sum(col("df") * col("df")).as("cand"),
            count(lit(1)).as("n_shingles")).head()
          println(s"    sum df^2 (candidate rows) = ${sums.getLong(0)}; " +
            s"distinct shingles = ${sums.getLong(1)}")
          sums.getLong(0)
        }
      }
      t("jaccard pairs (l5)") {
        graft.ops.TextOps.l5JaccardPairs(spark, d).count()
      }
      t("dedup groups (l5e=pairs+CC)") {
        graft.ops.TextOps.l5eDedupGroups(spark, d).count()
      }
    }
    spark.stop()
  }
}
