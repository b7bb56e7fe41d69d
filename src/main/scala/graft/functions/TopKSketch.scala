package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group as a native MERGEABLE aggregate (w5b) — the
  * scale path for "top-k rows per key".
  *
  * The window formulation (w5: `row_number` over partitionBy(key)) must
  * SORT every group in full before discarding all but k rows — at 100 TB
  * that is a sort of the whole fact table to keep 3 rows per key. This
  * aggregate keeps at most k (value, id) pairs per group at every stage:
  * partial aggregation bounds map-side state at k per key AND means only
  * k pairs per (key, partition) ever cross the shuffle; merges are
  * k-way list merges. Order: (value DESC, id ASC) — the id tiebreak makes
  * the result a pure function of the data (the w5/w6 determinism rule).
  *
  * Output: array<struct<value double, id bigint>> in rank order, ready to
  * `posexplode` back into (id, value, rn) rows — which is how the w5b
  * declared query reproduces w5's rows exactly and shares its oracle.
  */
case class TopKSketch(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int = 3,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_sketch expects (DOUBLE value, BIGINT id), got " +
        s"(${valueExpr.dataType.catalogString}, ${idExpr.dataType.catalogString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  // rank order: value desc, id asc
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) {
      val e = (v.asInstanceOf[Double], id.asInstanceOf[Long])
      if (buf.size < k || beats(e, buf.last)) {
        // insertion into a ≤k sorted buffer: O(k) per row, k tiny
        var i = buf.size
        buf += e
        while (i > 0 && beats(e, buf(i - 1))) { buf(i) = buf(i - 1); i -= 1 }
        buf(i) = e
        if (buf.size > k) buf.remove(buf.size - 1)
      }
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
      b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    // merge two rank-sorted ≤k lists, keep the best k
    val out = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0; var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    out
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map(e =>
      new GenericInternalRow(Array[Any](e._1, e._2)): Any).toArray)

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, id) => bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { out += ((bb.getDouble, bb.getLong)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKSketch {
  /** Register `topk_sketch(value, id, k)` for expr() use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch",
      {
        case Seq(v, id, kExpr) =>
          val n = kExpr match {
            case Literal(x: Int, IntegerType) => x
            case other => throw new IllegalArgumentException(
              s"topk_sketch: k must be an int literal, got $other")
          }
          TopKSketch(v, id, k = n).toAggregateExpression()
        case exprs => throw new IllegalArgumentException(
          s"topk_sketch expects (value, id, k), got ${exprs.length} args")
      },
      "scala_udf")
}
