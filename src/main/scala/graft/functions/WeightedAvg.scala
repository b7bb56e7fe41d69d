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

object WeightedAvg extends Aggregator[WavgIn, WavgBuf, Double] {
  override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0))
  override def reduce(b: WavgBuf, in: WavgIn): WavgBuf =
    if (in == null || in.x == null || in.w == null) b
    else WavgBuf(b.sxw + in.x * in.w, b.sw + in.w)
  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.sxw + b.sxw, a.sw + b.sw)
  override def finish(b: WavgBuf): Double =
    if (b.sw == 0) 0.0 else b.sxw.toDouble / b.sw.toDouble
  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted_avg(x, w). Inputs should be DECIMAL-cast. */
  def apply(x: Column, w: Column): Column =
    udaf(this, Encoders.product[WavgIn]).apply(x, w)
}
