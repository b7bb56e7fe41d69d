package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Contracts for the g15 Count-Min path that the property-form oracle
  * can't see: the MERGE algebra (the whole point of a sketch — partial
  * sketches over splits must compose to the single-pass answer) and the
  * never-undercount guarantee over EVERY word, not just the probes. */
class CmSketchSpec extends SparkSpec {

  private def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch = {
    val bytes = df
      .agg(count_min_sketch(col("w"), lit(0.001), lit(0.999), lit(42)).as("sk"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  private lazy val words = graft.core.Tables.documents(spark, sfDir)
    .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    .cache()

  test("g15 split-sketch merge is identical to the single-pass sketch") {
    // same seed => same hash rows => merge is plain counter addition,
    // so EVERY point estimate must agree exactly, not approximately
    val whole = sketchOf(words)
    val half0 = sketchOf(words.where(col("doc_id") % 2 === 0))
    val half1 = sketchOf(words.where(col("doc_id") % 2 === 1))
    half0.mergeInPlace(half1)
    val probes = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(50)
      .collect().map(_.getString(0))
    probes.foreach { w =>
      assert(half0.estimateCount(w) == whole.estimateCount(w),
        s"merged != single-pass for '$w'")
    }
  }

  test("g15 estimates never undercount, for every word in the corpus") {
    val whole = sketchOf(words)
    val exact = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val under = exact.filter { case (w, c) => whole.estimateCount(w) < c }
    assert(under.isEmpty, s"CM undercounted: ${under.take(5).toSeq}")
  }
}
