package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
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
  * Ordering is EXACTLY the window's total order for ANY orderable value
  * and id type (Long, Int, Decimal, String, Double, timestamp, …) in
  * either direction, with Spark's DEFAULT null ordering for that
  * direction (ASC → NULLS FIRST, DESC → NULLS LAST): per-type comparison
  * delegates to Catalyst's own interpreted ordering
  * (TypeUtils.getInterpretedOrdering — the same SQLOrderingUtil double
  * semantics the window sort uses: NaN greatest, -0.0 == 0.0). That
  * bit-identical equivalence is what lets the w5b declared query share
  * w5's oracle and what the TopKRewrite optimizer rule relies on when it
  * swaps this aggregate in for the window.
  *
  * Output: array<struct<value, id>> in rank order (element types follow
  * the inputs), ready to `posexplode` back into (id, value, rn) rows.
  */
case class TopKSketch(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int = 3,
    valueDesc: Boolean = true,
    idDesc: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[TopKSketch.Entry]] {
  import TopKSketch.Entry

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(valueExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_sketch value type ${valueExpr.dataType.catalogString} is not orderable")
    else if (!RowOrdering.isOrderable(idExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_sketch id type ${idExpr.dataType.catalogString} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", valueExpr.dataType, nullable = valueExpr.nullable),
      StructField("id", idExpr.dataType, nullable = idExpr.nullable))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  // Catalyst's interpreted per-type orderings — identical comparison
  // semantics to the window's SortOrder (incl. SQLOrderingUtil doubles)
  @transient private lazy val ordV: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(valueExpr.dataType)
  @transient private lazy val ordId: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idExpr.dataType)

  /** <0 iff `a` ranks strictly before `b` on one sort key with the
    * direction's DEFAULT null ordering (ASC → NULLS FIRST, DESC → NULLS
    * LAST — exactly SortDirection.defaultNullOrdering). */
  private def cmpKey(a: Any, b: Any, ord: Ordering[Any], desc: Boolean): Int =
    if (a == null || b == null) {
      if ((a == null) == (b == null)) 0
      else {
        val aFirst = (a == null) != desc // null ranks first only in ASC
        if (aFirst) -1 else 1
      }
    } else {
      val c = ord.compare(a, b)
      if (desc) -c else c
    }

  /** a beats b iff a ranks strictly before b under the window's
    * (value dir1, id dir2) total order. */
  private[functions] def beats(a: Entry, b: Entry): Boolean = {
    val cv = cmpKey(a.v, b.v, ordV, valueDesc)
    if (cv != 0) cv < 0
    else cmpKey(a.id, b.id, ordId, idDesc) < 0
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[Entry] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[Entry],
      input: InternalRow): mutable.ArrayBuffer[Entry] = {
    // copyValue: child eval may return views into reused row buffers
    // (UTF8String over an UnsafeRow); entries outlive the input row
    val e = Entry(InternalRow.copyValue(valueExpr.eval(input)),
      InternalRow.copyValue(idExpr.eval(input)))
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
      new GenericInternalRow(Array[Any](e.v, e.id)): Any).toArray)

  // Type-agnostic wire format: each entry is one UnsafeRow over
  // (valueType, idType) — UnsafeRow's writer handles every SQL type
  // (null bits included), so adding types never touches this code.
  @transient private lazy val serProj =
    UnsafeProjection.create(Array(valueExpr.dataType, idExpr.dataType))
  @transient private lazy val serRow = new GenericInternalRow(2)

  override def serialize(buf: mutable.ArrayBuffer[Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e =>
      serRow.update(0, e.v); serRow.update(1, e.id)
      val ur = serProj(serRow)
      out.writeInt(ur.getSizeInBytes)
      out.write(ur.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Entry] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.ArrayBuffer.empty[Entry]
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      row.pointTo(arr, len)
      // copyValue detaches variable-length values from `arr` so the
      // entry owns its bytes regardless of buffer lifetime
      out += Entry(
        InternalRow.copyValue(row.get(0, valueExpr.dataType)),
        InternalRow.copyValue(row.get(1, idExpr.dataType)))
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
  /** One ranked row; `null` IS the SQL null (the per-direction default
    * null ordering places it). Values are Catalyst-internal
    * (UTF8String/Decimal/…), owned by the entry. */
  final case class Entry(v: Any, id: Any)

  /** Register `topk_sketch(value, id, k)` for expr() use — value DESC,
    * id ASC (the w5 shape); the optimizer rule constructs directional
    * variants directly. */
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
