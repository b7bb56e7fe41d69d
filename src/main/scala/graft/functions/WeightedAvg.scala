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
case class WavgBuf(sxw: BigDecimal, sw: BigDecimal, nProducts: Long)

object WeightedAvg extends Aggregator[WavgIn, WavgBuf, java.lang.Double] {
  override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0), 0L)
  // SQL-aggregate null semantics, matching SUM(x*w)/SUM(w) exactly:
  // a null PRODUCT is skipped from the numerator only — a non-null weight
  // still counts in the denominator even when x is null (skipping the whole
  // row would inflate the average). nProducts distinguishes "no non-null
  // product ever accumulated" (SQL SUM is NULL, so the quotient is NULL)
  // from a genuine zero-sum numerator; a zero-weight denominator is NULL
  // like SQL division.
  override def reduce(b: WavgBuf, in: WavgIn): WavgBuf = {
    if (in == null) return b
    val hasProduct = in.x != null && in.w != null
    val sxw = if (hasProduct) b.sxw + in.x * in.w else b.sxw
    val sw = if (in.w != null) b.sw + in.w else b.sw
    WavgBuf(sxw, sw, b.nProducts + (if (hasProduct) 1L else 0L))
  }
  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.sxw + b.sxw, a.sw + b.sw, a.nProducts + b.nProducts)
  override def finish(b: WavgBuf): java.lang.Double =
    if (b.nProducts == 0L || b.sw == 0) null
    else java.lang.Double.valueOf(b.sxw.toDouble / b.sw.toDouble)
  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Column form: weighted_avg(x, w). Inputs should be DECIMAL-cast. */
  def apply(x: Column, w: Column): Column =
    udaf(this, Encoders.product[WavgIn]).apply(x, w)
}
