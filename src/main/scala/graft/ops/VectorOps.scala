package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Vector similarity operators (SURVEY.md §2 B9 L6-L7) over `embeddings`.
  *
  * Dot products are computed with built-in higher-order functions
  * (`zip_with` + `aggregate`) in double precision, left-to-right — the same
  * order DuckDB's unnest-zip sum uses, so values are bit-identical and
  * hash-verifiable. No UDF: the whole pipeline stays in codegen.
  *
  * Scale path: the brute-force pair join is blocked on `label` (an IVF-style
  * coarse quantizer cell). At 100 TB you'd keep exactly this plan shape and
  * only swap the blocking key for a learned centroid id — the join stays a
  * shuffle on the block key with per-block pair generation, never a global
  * cross join. l7b adds the LSH-bucketed variant (random-hyperplane signs).
  */
object VectorOps {
  import Relational.Q

  /** Σ aᵢ·bᵢ in double, sequential — matches the oracle's summation order.
    * Backed by the codegen'd [[graft.functions.VecDot]] expression (callers
    * register it per session); the interpreted higher-order-function
    * formulation `aggregate(zip_with(a,b,*),0d,+)` computes the identical
    * value but ~3× slower (closure per element + intermediate array). */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def withNorm(df: DataFrame, suffix: String): DataFrame =
    df.select(
      col("vec_id").as(s"id$suffix"),
      col("label"),
      col("embedding").as(s"v$suffix"),
      norm(col("embedding")).as(s"n$suffix"))

  /** L6: pairwise cosine similarity within label blocks. */
  val l6CosinePairs: Q = (s, d) => {
    graft.functions.VecDot.register(s)
    val e = Tables.embeddings(s, d)
    withNorm(e, "a").join(withNorm(e, "b"), Seq("label"))
      .where(col("ida") < col("idb"))
      .select(col("label"), col("ida"), col("idb"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .where(col("cos") > 0.2)
  }

  /** L7: top-3 nearest neighbors per vector (brute force within label,
    * ranked by unrounded cosine with id tiebreak). */
  val l7KnnBruteForce: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    val e = Tables.embeddings(s, d)
    val pairs = withNorm(e, "a").join(withNorm(e, "b"), Seq("label"))
      .where(col("ida") =!= col("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    pairs
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  /** L7b: ANN via random-hyperplane LSH — 8 sign bits from 8 fixed
    * pseudo-random hyperplanes bucket the vectors; top-3 search runs inside
    * (label, bucket). Candidates are a subset of l7's exact result (recall
    * asserted in ScalaTest); declared rows-only for the driver. */
  val l7bKnnLsh: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    val e = Tables.embeddings(s, d)
    // deterministic "random" hyperplane h_b[i] = sin(b*64+i) — fixed, cheap,
    // reproducible without a model artifact. The plane is a LITERAL array
    // (computed once on the driver; java.lang.Math.sin = Spark's sin), so
    // the per-row work is one codegen'd vec_dot.
    def planeDot(v: Column, b: Int): Column =
      dot(v, typedLit((0 until 64).map(i => math.sin((b * 64 + i).toDouble)).toArray))
    val bucketed = e.select(
      col("vec_id"), col("label"), col("embedding"),
      (0 until 8).map(b =>
        when(planeDot(col("embedding"), b) > 0, shiftleft(lit(1), b)).otherwise(lit(0)))
        .reduce((a: Column, c: Column) => a.bitwiseOR(c)).as("bucket"),
      norm(col("embedding")).as("nrm"))
    val a = bucketed.select(col("label"), col("bucket"), col("vec_id").as("ida"),
      col("embedding").as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("label"), col("bucket"), col("vec_id").as("idb"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    a.join(b, Seq("label", "bucket"))
      .where(col("ida") =!= col("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  val queries: Map[String, Q] = Map(
    "l6_cosine_pairs" -> l6CosinePairs,
    "l7_knn_brute" -> l7KnnBruteForce,
    "l7b_knn_lsh" -> l7bKnnLsh
  )

  val oracle: Map[String, String] = Map(
    "l6_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, label, embedding,
                sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                      FROM (SELECT unnest(embedding) AS x))) AS nrm
              FROM embeddings)
         SELECT * FROM (
           SELECT a.label, a.vec_id AS ida, b.vec_id AS idb,
                  round((SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                         FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                        / (a.nrm * b.nrm), 6) AS cos
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         WHERE cos > 0.2""",
    "l7_knn_brute" ->
      """WITH e AS (SELECT vec_id, label, embedding,
                sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                      FROM (SELECT unnest(embedding) AS x))) AS nrm
              FROM embeddings),
            pairs AS (
              SELECT a.vec_id AS ida, b.vec_id AS idb,
                     (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                      FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                     / (a.nrm * b.nrm) AS cos
              FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
         SELECT ida, idb,
                row_number() OVER (PARTITION BY ida ORDER BY cos DESC, idb) AS rk,
                round(cos, 6) AS cos
         FROM pairs
         QUALIFY rk <= 3"""
  )
}
