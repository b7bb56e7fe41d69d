package graft

import org.apache.spark.sql.functions._
import graft.functions.VecDot

/** The codegen'd vec_dot must be bit-identical to the interpreted
  * higher-order-function formulation it replaced (same left-to-right double
  * accumulation) — that identity is what keeps l6/l7 hash-verifiable. */
class VecDotSpec extends SparkSpec {

  test("vec_dot matches aggregate(zip_with) bit-for-bit on fixture embeddings") {
    VecDot.register(spark)
    val e = graft.core.Tables.embeddings(spark, sfDir).limit(200)
    val hof = aggregate(
      zip_with(col("embedding"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val paired = e.select(col("vec_id"), col("embedding"))
      .crossJoin(e.select(col("embedding").as("b")).limit(5))
    val diff = paired
      .select(call_function("vec_dot", col("embedding"), col("b")).as("fast"), hof.as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("vec_dot null and float-widening semantics") {
    VecDot.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f, 1.0f))),
      (Some(Array(1.0f)), Some(Array(1.0f, 1.0f))) // ragged -> NULL
    ).toDF("a", "b")
    val rows = df.select(call_function("vec_dot", col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0), "ragged arrays must null out, matching zip_with")
  }
}
