package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `z_interleave(x, y)` → the Morton (Z-order) code of two 16-bit grid
  * coordinates: bit i of x lands at output bit 2i, bit i of y at 2i+1.
  *
  * Sorting rows by this key and range-partitioning files over it gives
  * MULTI-column locality: every file covers a compact rectangle-ish region
  * of the (x, y) grid, so parquet min/max footer stats prune files for a
  * selective predicate on EITHER column — the property a single-column
  * sort only has for its leading column. This is the standard lakehouse
  * layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as a plain
  * codegen'd expression + `repartitionByRange` (see ops/Layout.scala).
  *
  * Inputs are expected in [0, 65535] (the caller grids raw values by
  * min-max, ops/Layout.scala:gridded); out-of-range inputs are masked to
  * their low 16 bits rather than failing — the key orders, it never needs
  * to be decoded. The bit spreading is the classic shift-or-mask ladder
  * (Morton 1966; the magic-mask formulation is public folklore, e.g.
  * "Bit Twiddling Hacks"). NULL in → NULL out.
  */
case class ZInterleave(x: Expression, y: Expression) extends BinaryExpression {
  override def left: Expression = x
  override def right: Expression = y

  override def checkInputDataTypes(): TypeCheckResult =
    if (x.dataType != IntegerType || y.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"z_interleave expects (INT, INT), got (${x.dataType.catalogString}, ${y.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "z_interleave"

  private def spread(v: Long): Long = {
    var n = v & 0xFFFFL
    n = (n | (n << 8)) & 0x00FF00FFL
    n = (n | (n << 4)) & 0x0F0F0F0FL
    n = (n | (n << 2)) & 0x33333333L
    n = (n | (n << 1)) & 0x55555555L
    n
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Int].toLong) | (spread(b.asInstanceOf[Int].toLong) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def ladder(out: String, in: String): String =
        s"""
           |long $out = ((long) $in) & 0xFFFFL;
           |$out = ($out | ($out << 8)) & 0x00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x33333333L;
           |$out = ($out | ($out << 1)) & 0x55555555L;
         """.stripMargin
      s"""
         |${ladder(sx, a)}
         |${ladder(sy, b)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(x = newLeft, y = newRight)
}

object ZOrder {
  /** Register for use via call_function (same wiring as VecDot.register). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave", exprs => ZInterleave(exprs(0), exprs(1)), "scala_udf")
}
