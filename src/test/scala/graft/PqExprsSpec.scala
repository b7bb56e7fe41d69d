package graft

import org.apache.spark.sql.functions._
import graft.functions.PqExprs

/** The compact PQ kernels (functions/PqExprs.scala) replaced the
  * expression-tree formulation that blew the 64 KB codegen limit; this spec
  * pins their semantics to an independent Scala reference implementation
  * (same argmin-with-first-tie rule, same left-to-right double sums) and
  * checks codegen/interpreted parity plus the null contract. */
class PqExprsSpec extends SparkSpec {

  private val M = 4; private val Ksub = 3; private val subDim = 2

  // deterministic codebooks, values chosen to exercise negative/fractional
  private val books: Array[Array[Array[Double]]] =
    Array.tabulate(M, Ksub, subDim)((m, k, i) =>
      math.sin(m * 31 + k * 7 + i * 3) * (if (k % 2 == 0) 1 else -1))

  private def refEncode(v: Array[Double]): Long = {
    var code = 0L
    for (m <- 0 until M) {
      val scores = (0 until Ksub).map { k =>
        val c = books(m)(k)
        val dot = (0 until subDim).foldLeft(0.0)((s, i) => s + v(m * subDim + i) * c(i))
        c.foldLeft(0.0)((s, x) => s + x * x) - 2.0 * dot
      }
      val bestK = scores.indexOf(scores.min) // first occurrence on ties
      code |= bestK.toLong << (4 * m)
    }
    code
  }

  private def refAdc(v: Array[Double]): Array[Double] =
    (for (m <- 0 until M; k <- 0 until Ksub) yield
      (0 until subDim).foldLeft(0.0)((s, i) => s + v(m * subDim + i) * books(m)(k)(i))).toArray

  private def vectors: Seq[Array[Double]] =
    (0 until 50).map(n => Array.tabulate(M * subDim)(i => math.cos(n * 13 + i * 5)))

  test("pq_encode and pq_adc_table match the Scala reference implementation") {
    PqExprs.register(spark)
    import spark.implicits._
    val df = vectors.zipWithIndex.map { case (v, n) => (n, v) }.toDF("n", "v")
    val rows = df.select(col("n"),
        call_function("pq_encode", col("v"), typedLit(books)).as("code"),
        call_function("pq_adc_table", col("v"), typedLit(books)).as("tbl"))
      .orderBy(col("n")).collect()
    vectors.zipWithIndex.foreach { case (v, n) =>
      assert(rows(n).getLong(1) == refEncode(v), s"encode mismatch at row $n")
      assert(rows(n).getSeq[Double](2) == refAdc(v).toSeq, s"ADC mismatch at row $n")
    }
  }

  test("pq kernels: codegen and interpreted eval agree bit-for-bit") {
    // same plan, one session forced interpreted — parity guards doGenCode
    // against drifting from nullSafeEval (each is the other's oracle)
    val interp = spark.newSession()
    interp.conf.set("spark.sql.codegen.wholeStage", "false")
    interp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    PqExprs.register(interp)
    PqExprs.register(spark)
    def run(s: org.apache.spark.sql.SparkSession): Seq[(Long, Seq[Double])] = {
      import s.implicits._
      vectors.zipWithIndex.map { case (v, n) => (n, v) }.toDF("n", "v")
        .select(col("n"),
          call_function("pq_encode", col("v"), typedLit(books)).as("code"),
          call_function("pq_adc_table", col("v"), typedLit(books)).as("tbl"))
        .orderBy(col("n")).collect()
        .map(r => (r.getLong(1), r.getSeq[Double](2))).toSeq
    }
    assert(run(spark) == run(interp))
  }

  test("pq_adc_score equals the element_at lookup chain it replaced") {
    PqExprs.register(spark)
    import spark.implicits._
    val df = vectors.zipWithIndex.map { case (v, n) => (n, v) }.toDF("n", "v")
      .select(col("n"),
        call_function("pq_encode", col("v"), typedLit(books)).as("code"),
        call_function("pq_adc_table", col("v"), typedLit(books)).as("tbl"))
    val chain = (0 until M).map(m =>
      element_at(col("tbl"),
        (shiftright(col("code"), 4 * m).bitwiseAND(15) + m * Ksub + 1).cast("int")))
      .reduce(_ + _)
    val diff = df
      .select(call_function("pq_adc_score", col("tbl"), col("code"), lit(M)).as("fast"),
        chain.as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("pq_adc_score nulls out on an out-of-range code nibble") {
    PqExprs.register(spark)
    import spark.implicits._
    // Ksub = 3 here, so a nibble of 15 points past the subspace's entries
    val df = Seq((Array.fill(M * Ksub)(1.0), 15L)).toDF("tbl", "code")
    val rows = df.select(
      call_function("pq_adc_score", col("tbl"), col("code"), lit(M))).collect()
    assert(rows(0).isNullAt(0))
  }

  test("pq kernels: null and ragged inputs null out") {
    PqExprs.register(spark)
    import spark.implicits._
    val df = Seq(
      (0, Option(Array.fill(M * subDim)(0.5))),
      (1, None),                       // null vector
      (2, Option(Array.fill(3)(0.5)))  // length != M*subDim
    ).toDF("n", "v")
    val rows = df.select(col("n"),
        call_function("pq_encode", col("v"), typedLit(books)).as("code"),
        call_function("pq_adc_table", col("v"), typedLit(books)).as("tbl"))
      .orderBy(col("n")).collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2), "ragged vector must null out")
  }

  test("pq_encode rejects codebooks that overflow 4-bit packing") {
    PqExprs.register(spark)
    import spark.implicits._
    val wide = Array.tabulate(17, 2, 2)((m, k, i) => (m + k + i).toDouble) // M=17
    val err = intercept[Exception] {
      Seq((0, Array.fill(34)(0.5))).toDF("n", "v")
        .select(call_function("pq_encode", col("v"), typedLit(wide))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("pq_encode") ||
      err.getMessage.contains("16"), err.getMessage)
  }
}
