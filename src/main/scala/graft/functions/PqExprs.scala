package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization kernels as compact codegen'd expressions
  * (SURVEY.md §2 B9 L7d).
  *
  * The DataFrame-level formulation of PQ encode — M=16 argmins, each an
  * `array_position(array_min(array(16 scores)))` over 16 `vec_dot` calls —
  * inlines 256 sub-dot argmin trees into ONE generated method, blowing the
  * JVM's 64 KB method-bytecode limit; Spark logs `Code grows beyond 64 KB`
  * and silently interprets the CPU-hottest stage of the query. The same
  * mathematics as a hand-written triple loop over codebooks held in
  * reference objects is ~30 lines of generated Java: these expressions keep
  * the whole PQ pipeline inside whole-stage codegen at ANY (M, Ksub).
  *
  * Both take (vector, codebooks) where codebooks is a FOLDABLE literal
  * `array<array<array<double>>>` of shape M × Ksub × subDim — evaluated
  * once on the driver, flattened, and shipped as a codegen reference
  * object (never re-evaluated per row).
  *
  * Bit-parity contract with the expression-tree formulation they replace:
  * sub-dots accumulate left-to-right in double from 0.0 (VecDot's order);
  * the encode score is `|c|² − 2·dot` with `|c|²` summed left-to-right on
  * the driver; argmin ties resolve to the LOWEST k (strict `<`), matching
  * `array_position(scores, array_min(scores))`'s first-occurrence rule.
  */
trait PqCodebooks { self: BinaryExpression =>
  def vec: Expression
  def codebooks: Expression

  override def left: Expression = vec
  override def right: Expression = codebooks

  private def booksType(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vec.dataType.isInstanceOf[ArrayType] ||
        vec.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<DOUBLE> vector, got ${vec.dataType.catalogString}")
    else if (!booksType(codebooks.dataType) || !codebooks.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable ARRAY<ARRAY<ARRAY<DOUBLE>>> codebook, got ${codebooks.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  /** M × Ksub × subDim, materialized once on the driver (and once per
    * executor on deserialization — the literal child is the wire format). */
  @transient protected lazy val books: Array[Array[Array[Double]]] =
    codebooks.eval().asInstanceOf[ArrayData]
      .toObjectArray(ArrayType(ArrayType(DoubleType)))
      .map(_.asInstanceOf[ArrayData]
        .toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray()))

  @transient protected lazy val numSub: Int = books.length
  @transient protected lazy val ksub: Int = books.headOption.map(_.length).getOrElse(0)
  @transient protected lazy val subDim: Int =
    books.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
  /** centroid m,k element i at flat[(m·Ksub + k)·subDim + i]. */
  @transient protected lazy val flatBooks: Array[Double] = books.flatten.flatten
}

/** `pq_encode(v, books)` → the M sub-cell argmins packed 4 bits each into
  * one LONG (requires M ≤ 16, Ksub ≤ 16). NULL on null/ragged input. */
case class PqEncode(vec: Expression, codebooks: Expression)
    extends BinaryExpression with PqCodebooks {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"
  // null also for length ≠ M·subDim or null elements, not just null input
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (books.length > 16 || books.exists(_.length > 16))
      TypeCheckResult.TypeCheckFailure(
        "pq_encode packs one 4-bit code per subspace into a LONG: M <= 16 and Ksub <= 16 required")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** |c_mk|² per (m,k) at m·Ksub + k — the argmin's constant term,
    * precomputed on the driver exactly as the literal formulation did
    * (`lit(c.map(x => x*x).sum)`, left-to-right). */
  @transient private lazy val cNormSq: Array[Double] =
    books.flatMap(_.map(_.foldLeft(0.0)((s, x) => s + x * x)))

  private def encode(v: ArrayData): Any = {
    if (v.numElements() != numSub * subDim) return null
    var code = 0L
    var m = 0
    while (m < numSub) {
      var best = Double.PositiveInfinity
      var bestK = 0
      var k = 0
      while (k < ksub) {
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val idx = m * subDim + i
          if (v.isNullAt(idx)) return null
          dot += v.getDouble(idx) * flatBooks((m * ksub + k) * subDim + i)
          i += 1
        }
        val score = cNormSq(m * ksub + k) - 2.0 * dot
        if (score < best) { best = score; bestK = k }
        k += 1
      }
      code |= bestK.toLong << (4 * m)
      m += 1
    }
    code
  }

  protected override def nullSafeEval(l: Any, r: Any): Any =
    encode(l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val flat = ctx.addReferenceObj("pqFlatBooks", flatBooks, "double[]")
      val cn = ctx.addReferenceObj("pqCNormSq", cNormSq, "double[]")
      val code = ctx.freshName("code")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK")
      val score = ctx.freshName("score")
      s"""
         |if ($v.numElements() != ${numSub * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $code = 0L;
         |  for (int $m = 0; $m < $numSub && !${ev.isNull}; $m++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestK = 0;
         |    for (int $k = 0; $k < $ksub && !${ev.isNull}; $k++) {
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        int $idx = $m * $subDim + $i;
         |        if ($v.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |        $dot += $v.getDouble($idx) * $flat[($m * $ksub + $k) * $subDim + $i];
         |      }
         |      double $score = $cn[$m * $ksub + $k] - 2.0 * $dot;
         |      if (!${ev.isNull} && $score < $best) { $best = $score; $bestK = $k; }
         |    }
         |    $code |= ((long) $bestK) << (4 * $m);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $code;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vec = newLeft, codebooks = newRight)
}

/** `pq_adc_table(q, books)` → the query's asymmetric-distance table:
  * ARRAY<DOUBLE> of length M·Ksub with tbl[m·Ksub + k] = dot(q_m, c_mk).
  * NULL on null/ragged input. */
case class PqAdcTable(vec: Expression, codebooks: Expression)
    extends BinaryExpression with PqCodebooks {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"
  override def nullable: Boolean = true

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    if (v.numElements() != numSub * subDim) return null
    val tbl = new Array[Double](numSub * ksub)
    var m = 0
    while (m < numSub) {
      var k = 0
      while (k < ksub) {
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val idx = m * subDim + i
          if (v.isNullAt(idx)) return null
          dot += v.getDouble(idx) * flatBooks((m * ksub + k) * subDim + i)
          i += 1
        }
        tbl(m * ksub + k) = dot
        k += 1
      }
      m += 1
    }
    new GenericArrayData(tbl)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val flat = ctx.addReferenceObj("pqFlatBooks", flatBooks, "double[]")
      val tbl = ctx.freshName("tbl")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val dot = ctx.freshName("dot")
      s"""
         |if ($v.numElements() != ${numSub * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $tbl = new double[${numSub * ksub}];
         |  for (int $m = 0; $m < $numSub && !${ev.isNull}; $m++) {
         |    for (int $k = 0; $k < $ksub && !${ev.isNull}; $k++) {
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        int $idx = $m * $subDim + $i;
         |        if ($v.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |        $dot += $v.getDouble($idx) * $flat[($m * $ksub + $k) * $subDim + $i];
         |      }
         |      $tbl[$m * $ksub + $k] = $dot;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tbl);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcTable =
    copy(vec = newLeft, codebooks = newRight)
}

/** `pq_adc_score(tbl, code, M)` → the ADC approximate dot product: the sum
  * of the M table entries the packed code selects,
  * Σ_m tbl[(code >> 4m & 15) + m·Ksub] with Ksub = |tbl| / M, accumulated
  * left-to-right (bit-identical to the chain of element_at lookups it
  * replaces). This is the per-candidate-PAIR hot path of the PQ ranking
  * stage — one bounds-checked loop instead of M element_at trees. NULL on
  * null inputs, null table entries, or a code nibble outside the table
  * (matching non-ANSI element_at's out-of-bounds-is-NULL contract). */
case class PqAdcScore(tbl: Expression, code: Expression, numSub: Int)
    extends BinaryExpression {

  override def left: Expression = tbl
  override def right: Expression = code

  override def checkInputDataTypes(): TypeCheckResult =
    if (!tbl.dataType.isInstanceOf[ArrayType] ||
        tbl.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects ARRAY<DOUBLE> table, got ${tbl.dataType.catalogString}")
    else if (code.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects BIGINT code, got ${code.dataType.catalogString}")
    else if (numSub < 1 || numSub > 16)
      TypeCheckResult.TypeCheckFailure("pq_adc_score: M must be in [1, 16]")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"
  override def nullable: Boolean = true

  protected override def nullSafeEval(t: Any, c: Any): Any = {
    val arr = t.asInstanceOf[ArrayData]
    val cd = c.asInstanceOf[Long]
    val ksub = arr.numElements() / numSub
    var acc = 0.0
    var m = 0
    while (m < numSub) {
      val idx = ((cd >> (4 * m)) & 15L).toInt + m * ksub
      if (idx >= arr.numElements() || arr.isNullAt(idx)) return null
      acc += arr.getDouble(idx)
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val ksub = ctx.freshName("ksub")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val idx = ctx.freshName("idx")
      s"""
         |int $ksub = $t.numElements() / $numSub;
         |double $acc = 0.0;
         |for (int $m = 0; $m < $numSub && !${ev.isNull}; $m++) {
         |  int $idx = (int) (($c >> (4 * $m)) & 15L) + $m * $ksub;
         |  if ($idx >= $t.numElements() || $t.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |  $acc += $t.getDouble($idx);
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(tbl = newLeft, code = newRight)
}

object PqExprs {
  /** Register the kernels for use via call_function (same wiring as
    * [[VecDot.register]]). pq_adc_score's third argument must be a foldable
    * integer (the subspace count M). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncode(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_table", exprs => PqAdcTable(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_score", exprs => PqAdcScore(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int]), "scala_udf")
  }
}
