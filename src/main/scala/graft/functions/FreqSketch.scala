package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native MERGEABLE aggregate
  * (SURVEY.md §2 G13) — the frequent-items sibling of the HLL (g11) and
  * bitmap (g12) families: at most `k` counters per group, so only
  * k (item, count) pairs cross the shuffle regardless of group size,
  * where the exact word count (l3) shuffles the entire vocabulary.
  *
  * Guarantees (deterministic, no randomness): every item whose true
  * frequency exceeds n/(k+1) is present in the final sketch, and each
  * reported count undercounts by at most n/(k+1). Partials merge
  * counter-wise, then decrement all by the (k+1)-th largest and drop
  * non-positives — the construction shown mergeable WITHOUT losing the
  * error bound by Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  * Summaries" (PODS 2012, §3.1).
  *
  * Input: STRING items. Output: map<string, bigint> of surviving
  * counters (keys emitted in sorted order for a deterministic row).
  */
case class FreqSketch(
    child: Expression,
    k: Int = 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch expects STRING items, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k =>
          // clone: the input row's UTF8String points into a reused buffer
          buf.update(item.clone(), 1L)
        case None =>
          // classic MG step: a full table and an unseen item decrement
          // every counter (the arriving item's single count included)
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      // decrement by the (k+1)-th largest count, drop non-positives —
      // restores ≤ k counters while keeping the summed error ≤ n/(k+1)
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(sorted.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytesLen = entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = ByteBuffer.allocate(4 + bytesLen)
    bb.putInt(entries.length)
    entries.foreach { case (key, c) =>
      val kb = key.getBytes
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.update(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Register `freq_sketch(item[, k])` for expr() use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch",
      {
        case Seq(child) => FreqSketch(child).toAggregateExpression()
        case Seq(child, kExpr) =>
          val n = kExpr match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"freq_sketch: k must be an int literal, got $other")
          }
          FreqSketch(child, k = n).toAggregateExpression()
        case exprs => throw new IllegalArgumentException(
          s"freq_sketch expects 1-2 arguments, got ${exprs.length}")
      },
      "scala_udf")
}
