package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, SQLOrderingUtil}
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
  * k-way list merges.
  *
  * Ordering is EXACTLY the window's `value DESC NULLS LAST, id ASC NULLS
  * FIRST` total order: doubles compare with Spark's own sort semantics
  * (SQLOrderingUtil: NaN greatest, -0.0 == 0.0), null values rank after
  * every non-null value, null ids rank before every non-null id among
  * value ties. That bit-identical equivalence is what lets the w5b
  * declared query share w5's oracle and what the TopKRewrite optimizer
  * rule relies on when it swaps this aggregate in for the window.
  *
  * Output: array<struct<value double, id bigint>> in rank order, ready to
  * `posexplode` back into (id, value, rn) rows.
  */
case class TopKSketch(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int = 3,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[TopKSketch.Entry]] {
  import TopKSketch.{Entry, beats}

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_sketch expects (DOUBLE value, BIGINT id), got " +
        s"(${valueExpr.dataType.catalogString}, ${idExpr.dataType.catalogString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = valueExpr.nullable),
      StructField("id", LongType, nullable = idExpr.nullable))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Entry] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[Entry],
      input: InternalRow): mutable.ArrayBuffer[Entry] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    val e = Entry(
      v == null, if (v == null) 0.0 else v.asInstanceOf[Double],
      id == null, if (id == null) 0L else id.asInstanceOf[Long])
    if (buf.size < k || beats(e, buf.last)) {
      // insertion into a ≤k rank-sorted buffer: O(k) per row, k tiny
      var i = buf.size
      buf += e
      while (i > 0 && beats(e, buf(i - 1))) { buf(i) = buf(i - 1); i -= 1 }
      buf(i) = e
      if (buf.size > k) buf.remove(buf.size - 1)
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[Entry],
      b: mutable.ArrayBuffer[Entry]): mutable.ArrayBuffer[Entry] = {
    // merge two rank-sorted ≤k lists, keep the best k
    val out = mutable.ArrayBuffer.empty[Entry]
    var i = 0; var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && beats(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    out
  }

  override def eval(buf: mutable.ArrayBuffer[Entry]): Any =
    new GenericArrayData(buf.map(e =>
      new GenericInternalRow(Array[Any](
        if (e.vNull) null else e.v,
        if (e.idNull) null else e.id)): Any).toArray)

  override def serialize(buf: mutable.ArrayBuffer[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 17)
    bb.putInt(buf.size)
    buf.foreach { e =>
      bb.put((((if (e.vNull) 1 else 0)) | (if (e.idNull) 2 else 0)).toByte)
      bb.putDouble(e.v); bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.ArrayBuffer.empty[Entry]
    var i = 0
    while (i < n) {
      val f = bb.get()
      out += Entry((f & 1) != 0, bb.getDouble, (f & 2) != 0, bb.getLong)
      i += 1
    }
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
  /** One ranked row; null flags carry the window's null ordering. */
  final case class Entry(vNull: Boolean, v: Double, idNull: Boolean, id: Long)

  /** `value DESC NULLS LAST, id ASC NULLS FIRST` — a beats b iff a ranks
    * strictly before b under exactly that window order. */
  def beats(a: Entry, b: Entry): Boolean = {
    if (a.vNull != b.vNull) return !a.vNull // non-null value ranks first
    if (!a.vNull) {
      val c = SQLOrderingUtil.compareDoubles(a.v, b.v)
      if (c != 0) return c > 0
    }
    if (a.idNull != b.idNull) return a.idNull // null id ranks first in ASC
    !a.idNull && a.id < b.id
  }

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
