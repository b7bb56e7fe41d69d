// r21 e9/e5 A/B: old gap-fill (bounds aggregated from base — second
// events scan) vs new (bounds derived from the (key, bucket) rollup).
//   tools/run.sh graft.tools.R21E9Probe
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object R21E9Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.Sessions.local()
    s.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(s)
    def t(label: String)(body: => Long): Unit = {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(s)
        (dt, n)
      }
      val (d1, n) = one(); val (d2, _) = one()
      println(f"  $label%-40s ${math.min(d1, d2)}%8.2f s  ($n rows)")
    }
    val bucketUs = 3600L * 1000000
    def oldGapFill(): DataFrame = {
      val base = graft.core.Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("bucket_us", col("ts_us") - col("ts_us") % bucketUs)
      val bounds = base.groupBy(col("user_id"))
        .agg(min(col("bucket_us")).as("b0"), max(col("bucket_us")).as("b1"))
      val spine = bounds.select(col("user_id"),
        explode(sequence(col("b0"), col("b1"), lit(bucketUs))).as("bucket_us"))
      val counts = base.groupBy(col("user_id"), col("bucket_us"))
        .agg(count(lit(1)).as("n"),
          sum(graft.ops.Relational.cents(col("value"))).as("c"))
      spine.join(counts, Seq("user_id", "bucket_us"), "left")
        .select(col("user_id"), col("bucket_us"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("c"), lit(0L)).as("value_cents"))
    }
    def oldE9(): DataFrame = {
      val series = oldGapFill()
      val w = Window.partitionBy(col("user_id")).orderBy(col("bucket_us"))
        .rowsBetween(-24, -1)
      val dev = col("n_base") * col("value_cents") - col("s_base")
      series
        .withColumn("n_base", count(col("value_cents")).over(w))
        .withColumn("s_base", sum(col("value_cents")).over(w))
        .withColumn("q_base", sum(col("value_cents") * col("value_cents")).over(w))
        .where(col("n_base") >= 8 &&
          dev * dev > lit(9L) * (col("n_base") * col("q_base") - col("s_base") * col("s_base")))
        .select(col("user_id"), col("bucket_us").as("hour_us"),
          col("value_cents"), col("n_base"), col("s_base"), col("q_base"))
    }
    println(s"== $d")
    t("e9 OLD (bounds from base)")(oldE9().count())
    t("e9 NEW (bounds from rollup)")(
      graft.SparkEntry.queries("e9_anomaly")(s, d).count())
    t("e5 OLD")(oldGapFill().count())
    t("e5 NEW")(graft.SparkEntry.queries("e5_gap_fill")(s, d).count())
    t("parity e9 (want 0)") {
      val a = oldE9(); val b = graft.SparkEntry.queries("e9_anomaly")(s, d)
      b.exceptAll(a).count() + a.exceptAll(b).count()
    }
    s.stop()
  }
}
