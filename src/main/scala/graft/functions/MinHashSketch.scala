package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as a native imperative aggregate (SURVEY.md §4.2.4's
  * optional scale path): aggregates a column of 64-bit shingle hashes into
  * a k-slot min-signature per group with a primitive long[] buffer —
  * map-side partial aggregation means each shingle is hashed k ways ONCE
  * near the data and only k·8 bytes per group cross the shuffle. This is
  * the formulation for corpora where per-document shingle ARRAYS don't fit
  * in a row (the array-based path in TextOps.l5b materializes them).
  *
  * Permutation i is xxhash64(i: INT, h: LONG) with Spark's seed 42 —
  * EXACTLY the bits of the DataFrame expression `xxhash64(lit(i), col)`
  * used by l5b, so both paths produce identical signatures (asserted in
  * ScalaTest).
  */
case class MinHashSketch(
    child: Expression,
    numHashes: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch expects BIGINT (a pre-hashed shingle), got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  // per-permutation seeds are constant: xxhash64(lit(i), h) folds seed 42
  // over (int, long), and the int half never changes — precompute it once
  // instead of twice-hashing every input row
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        // bit-identical to xxhash64(lit(i), h): XxHash64Function.hash on a
        // LongType is exactly XXH64.hashLong, minus the per-call DataType
        // dispatch this hot loop (k hashes × every shingle) shouldn't pay
        val mixed =
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, seeds(i))
        if (mixed < buf(i)) buf(i) = mixed
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
}

object MinHashSketch {
  /** Register `minhash_sketch(hash_col[, num_hashes])` for expr() use.
    * Arity is validated — extra arguments must not be silently dropped. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sketch",
      {
        case Seq(child) => MinHashSketch(child).toAggregateExpression()
        case Seq(child, k) =>
          val n = k match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"minhash_sketch: num_hashes must be an int literal, got $other")
          }
          MinHashSketch(child, numHashes = n).toAggregateExpression()
        case exprs => throw new IllegalArgumentException(
          s"minhash_sketch expects 1-2 arguments, got ${exprs.length}")
      },
      "scala_udf")
}
