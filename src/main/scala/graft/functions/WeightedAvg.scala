package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** G9: typed UDAF — weighted average with exact decimal accumulation.
  *
  * Maps the reference's "algorithm" concept (a registered, reusable
  * computation; `Yuki/kernel/image_job.py:88-108`) onto Spark's
  * `Aggregator`. Sums are kept in BigDecimal so the result is exact and
  * order-independent — the same value on any partitioning, which is what
  * makes it verifiable against the DuckDB twin `SUM(x*w)/SUM(w)`.
  */
case class WavgIn(x: BigDecimal, w: BigDecimal)
case class WavgBuf(sxw: BigDecimal, sw: BigDecimal)

object WeightedAvg extends Aggregator[WavgIn, WavgBuf, java.lang.Double] {
  override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0))
  // SQL-aggregate null semantics, matching SUM(x*w)/SUM(w) exactly:
  // a null PRODUCT is skipped from the numerator only — a non-null weight
  // still counts in the denominator even when x is null (skipping the whole
  // row would inflate the average), and an empty/zero-weight group yields
  // NULL like SQL division, not 0.
  override def reduce(b: WavgBuf, in: WavgIn): WavgBuf = {
    if (in == null) return b
    val sxw = if (in.x != null && in.w != null) b.sxw + in.x * in.w else b.sxw
    val sw = if (in.w != null) b.sw + in.w else b.sw
    WavgBuf(sxw, sw)
  }
  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.sxw + b.sxw, a.sw + b.sw)
  override def finish(b: WavgBuf): java.lang.Double =
    if (b.sw == 0) null else java.lang.Double.valueOf(b.sxw.toDouble / b.sw.toDouble)
  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Column form: weighted_avg(x, w). Inputs should be DECIMAL-cast. */
  def apply(x: Column, w: Column): Column =
    udaf(this, Encoders.product[WavgIn]).apply(x, w)
}
