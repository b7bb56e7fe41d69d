package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Sorts / limits / sampling (B6) and set operations (B7).
  *
  * Order-sensitive queries always sort on a total order (unique tiebreaker)
  * so LIMIT/OFFSET picks identical rows on both engines. Global top-k uses
  * sort+limit, which Spark executes as TakeOrderedAndProject — a per-
  * partition top-k then a k-row driver merge, no global sort at scale.
  */
object SortsSets {
  import Relational.{Q, dsum}
  private val D2 = DecimalType(18, 2)

  /** O1: multi-key sort with explicit null ordering, materialized as a rank
    * column (the driver canonically re-sorts rows, so order must be data).
    * Top-100 FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    * top-k, k-row driver merge), THEN row_number over the 100 survivors — a
    * global un-partitioned window over the whole table would funnel every
    * row through one task. */
  val o1SortNulls: Q = (s, d) => {
    val sortKeys = Seq(
      col("maybe_price").asc_nulls_first,
      col("o_orderdate").desc, col("o_orderkey").asc)
    val top = Tables.orders(s, d)
      .withColumn("maybe_price",
        when(col("o_orderstatus") === "O", lit(null).cast("double"))
          .otherwise(col("o_totalprice")))
      .orderBy(sortKeys: _*)
      .limit(100)
    top
      .withColumn("pos", row_number().over(Window.orderBy(sortKeys: _*)))
      .select(col("pos"), col("o_orderkey"), col("maybe_price"))
  }

  /** O2: LIMIT + OFFSET on a total order. */
  val o2LimitOffset: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_orderkey"))
      .offset(100).limit(50)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** O3: global top-k by computed revenue (TakeOrderedAndProject). */
  val o3TopkGlobal: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(D2) * (lit(1) - col("l_discount").cast(D2)))
        .as("rev"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("rev").cast("double").as("revenue"))

  /** O4: seeded sample, declared as a cardinality-bounds check (a sample has
    * no row-level oracle; the fraction must land within ±50% relative). */
  val o4Sample: Q = (s, d) => {
    // lazy: both counts are declared as aggregations and only run when the
    // caller acts (other builders never execute jobs at construction time)
    val total = Tables.lineitem(s, d).agg(count(lit(1)).as("total"))
    val sampled = Tables.lineitem(s, d)
      .sample(withReplacement = false, 0.1, seed = 42)
      .agg(count(lit(1)).as("n"))
    total.crossJoin(sampled)
      .select((col("n") >= col("total") * 0.05 &&
               col("n") <= col("total") * 0.15).as("sample_ok"))
  }

  /** O5: fixed-SIZE deterministic per-stratum sample — exactly k=5 docs
    * per source, chosen by ranking md5(source:doc_id): the eval-set /
    * inspection-batch carve ("give me 5 representative docs from every
    * source, the same 5 every run, on any cluster"). Complements l16,
    * which pins the RATE per stratum; this pins the COUNT. The hash rank
    * is a pure function of row identity — order-independent,
    * partitioning-independent, reproducible across engines.
    *
    * Plan: one source-partitioned window over (hash, doc_id); each
    * stratum ranks independently (parallel across sources), and only the
    * k survivors leave the window stage — no global sort, no collect. */
  val o5StratifiedSample: Q = (s, d) =>
    stratifiedSampleFrames(Tables.documents(s, d), "source", "doc_id", 5)

  /** o5 core over ANY frame with caller-chosen stratum / id columns and
    * per-stratum count — registry name `strat_sample`. */
  private[graft] def stratifiedSampleFrames(df: org.apache.spark.sql.DataFrame,
      stratum: String, id: String, k: Int): org.apache.spark.sql.DataFrame = {
    val h = md5(concat(col(stratum), lit(":"), col(id).cast("string")))
    val w = Window.partitionBy(col(stratum)).orderBy(h, col(id))
    df.select(col(id), col(stratum),
        row_number().over(w).cast("long").as("rk"))
      .where(col("rk") <= k)
  }

  /** O7: deterministic WEIGHTED sampling (Efraimidis–Spirakis A-Res order
    * sampling, IPL 2006): each row draws a reproducible uniform u from
    * its identity hash and ranks by the exponential key −ln(u)/w; the
    * global top-k under that key is a weighted-without-replacement sample
    * (inclusion probability ∝ w) — "sample 50 docs, longer docs
    * proportionally more likely", the importance-sampling primitive
    * corpus inspection and eval carving use when uniform sampling
    * (o4/l16/o5) under-represents the heavy tail.
    *
    * Plan: pure per-row arithmetic (the u derives from md5 of row
    * identity — order- and partitioning-independent, l16's rule) + a
    * global top-k, which compiles to TakeOrderedAndProject (per-partition
    * heads, k-row driver merge — never a full sort). The ranking key
    * rounds to 6 decimals with the id as tie-break, so both engines cut
    * the same k rows. */
  val o7WeightedSample: Q = (s, d) =>
    weightedSampleFrames(
      Tables.documents(s, d).withColumn("w", col("n_chars")), "doc_id", "w", 50)

  /** o7 core over ANY frame with an id and a positive weight column —
    * registry name `weighted_sample`. */
  private[graft] def weightedSampleFrames(df: org.apache.spark.sql.DataFrame,
      id: String, w: String, k: Int): org.apache.spark.sql.DataFrame = {
    val u = (conv(substring(md5(concat(lit("ws:"), col(id))), 1, 6), 16, 10)
      .cast("double") + 1.0) / 16777217.0 // (0, 1]: 24-bit hash + 1
    df.withColumn("score", round(-log(u) / col(w), 6))
      .orderBy(col("score"), col(id))
      .limit(k)
      .select(col(id), col(w).cast("long").as("weight"), col("score"))
  }

  /** O8: per-STRATUM weighted sampling — o7's A-Res rule inside a
    * stratum-partitioned window (exactly k weighted winners per source):
    * the eval-set carve when both representation (per-stratum quotas, o5)
    * and importance (weight ∝ length, o7) matter at once. Same
    * hash-derived exponential keys — a pure function of row identity, so
    * the winner set is reproducible on any partitioning — but the top-k
    * cut is row_number inside the stratum window, not a global
    * TakeOrdered: only k rows per stratum leave the window stage. */
  val o8StratifiedWeighted: Q = (s, d) => {
    val k = 10
    val df = Tables.documents(s, d)
    val u = (conv(substring(md5(concat(lit("ws:"), col("doc_id"))), 1, 6), 16, 10)
      .cast("double") + 1.0) / 16777217.0
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score"), col("doc_id"))
    df.withColumn("score", round(-log(u) / col("n_chars"), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("weight"), col("score"), col("rk"))
  }

  /** O6: 2-D skyline (Pareto front) — the preference query "parts no
    * other part beats on BOTH price (lower better) and size (higher
    * better)": a point survives iff no other point is ≤/≥ in both
    * dimensions and strictly better in one. Cf. "Integration of Skyline
    * Queries into Spark SQL" (EDBT 2023); the naive formulation is the
    * O(n²) NOT-EXISTS self-join the oracle runs.
    *
    * Plan (never a self-join): normalize both dims to minimize, then on
    * DISTINCT (x, y) pairs a point is dominated iff some pair sorted
    * before it (x asc, y asc) has a strictly smaller y — so the skyline
    * filter is a running-min window. Two phases: a LOCAL pass with the
    * same window partitioned by a hash bucket (parallel, prunes ~all
    * dominated points), then the GLOBAL window over the few survivors —
    * the classic local-skyline/merge decomposition, and the only global
    * ordering touches the pruned remnant, never the table. Survivors
    * semi-join back to emit the original rows. */
  val o6Skyline: Q = (s, d) =>
    skyline2dFrames(Tables.part(s, d),
      "p_retailprice", minimize1 = true, "p_size", minimize2 = false)

  /** o6 core over ANY frame and chosen dimensions/directions — registry
    * name `skyline`. Ties on both dims are all kept (equal points don't
    * dominate each other); every original column is preserved. */
  private[graft] def skyline2dFrames(df: org.apache.spark.sql.DataFrame,
      c1: String, minimize1: Boolean, c2: String, minimize2: Boolean): org.apache.spark.sql.DataFrame = {
    def sx = if (minimize1) col(c1).cast("double") else -col(c1).cast("double")
    def sy = if (minimize2) col(c2).cast("double") else -col(c2).cast("double")
    val pts = df.select(sx.as("_sx"), sy.as("_sy")).distinct()
    val localW = Window.partitionBy(col("_b")).orderBy(col("_sx"), col("_sy"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pts
      .withColumn("_b", pmod(hash(col("_sx"), col("_sy")), lit(32)))
      .withColumn("_m", min(col("_sy")).over(localW))
      .where(col("_m").isNull || col("_sy") < col("_m"))
      .drop("_b", "_m")
    val globalW = Window.orderBy(col("_sx"), col("_sy"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = local
      .withColumn("_m", min(col("_sy")).over(globalW))
      .where(col("_m").isNull || col("_sy") < col("_m"))
      .drop("_m")
    df.join(sky, sx === col("_sx") && sy === col("_sy"), "left_semi")
  }

  /** U1: UNION ALL (multiset) — copies per key across two selections. */
  val u1UnionAll: Q = (s, d) => {
    val a = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    val b = Tables.customer(s, d).where(col("c_acctbal") > 4000)
      .select(col("c_custkey"), col("c_nationkey"))
    a.unionByName(b)
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_copies"))
  }

  /** U1b: UNION DISTINCT of the same two selections. */
  val u1bUnionDistinct: Q = (s, d) => {
    val a = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    val b = Tables.customer(s, d).where(col("c_acctbal") > 4000)
      .select(col("c_custkey"), col("c_nationkey"))
    a.unionByName(b).distinct()
  }

  /** U2: INTERSECT — customers ordering in both 1995 and 1996. */
  val u2Intersect: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
    val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
    y95.intersect(y96)
  }

  /** U2b: INTERSECT ALL (multiset semantics). */
  val u2bIntersectAll: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_orderpriority"))
    val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_orderpriority"))
    y95.intersectAll(y96).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
  }

  /** U3: EXCEPT — customers ordering in 1995 but not 1996. */
  val u3Except: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
    val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
    y95.except(y96)
  }

  /** U3b: EXCEPT ALL (multiset difference). */
  val u3bExceptAll: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_orderpriority"))
    val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_orderpriority"))
    y95.exceptAll(y96).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
  }

  val queries: Map[String, Q] = Map(
    "o1_sort_nulls" -> o1SortNulls,
    "o2_limit_offset" -> o2LimitOffset,
    "o3_topk_global" -> o3TopkGlobal,
    "o4_sample" -> o4Sample,
    "o5_stratified_sample" -> o5StratifiedSample,
    "o6_skyline" -> o6Skyline,
    "o7_weighted_sample" -> o7WeightedSample,
    "o8_stratified_weighted" -> o8StratifiedWeighted,
    "u1_union_all" -> u1UnionAll,
    "u1b_union_distinct" -> u1bUnionDistinct,
    "u2_intersect" -> u2Intersect,
    "u2b_intersect_all" -> u2bIntersectAll,
    "u3_except" -> u3Except,
    "u3b_except_all" -> u3bExceptAll
  )

  val oracle: Map[String, String] = Map(
    "o1_sort_nulls" ->
      """SELECT pos, o_orderkey, maybe_price FROM (
           SELECT row_number() OVER (ORDER BY maybe_price ASC NULLS FIRST,
                                     o_orderdate DESC, o_orderkey) AS pos,
                  o_orderkey, maybe_price
           FROM (SELECT o_orderkey, o_orderdate,
                        CASE WHEN o_orderstatus = 'O' THEN NULL
                             ELSE o_totalprice END AS maybe_price
                 FROM orders))
         WHERE pos <= 100""",
    "o2_limit_offset" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100",
    "o3_topk_global" ->
      """SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue FROM (
           SELECT l_orderkey,
                  sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
           FROM lineitem GROUP BY 1)
         ORDER BY rev DESC, l_orderkey LIMIT 10""",
    "o4_sample" ->
      "SELECT true AS sample_ok",
    "o8_stratified_weighted" ->
      """SELECT source, doc_id, weight, score, rk FROM (
           SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
                  round(-ln((('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT + 1.0)
                            / 16777217.0) / n_chars, 6) AS score,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY round(-ln((('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT + 1.0)
                                                        / 16777217.0) / n_chars, 6),
                                              doc_id) AS rk
           FROM documents)
         WHERE rk <= 10""",
    "o7_weighted_sample" ->
      """SELECT doc_id, weight, score FROM (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                  round(-ln((('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT + 1.0)
                            / 16777217.0) / n_chars, 6) AS score
           FROM documents)
         ORDER BY score, doc_id LIMIT 50""",
    "o6_skyline" ->
      """SELECT * FROM part a
         WHERE NOT EXISTS (
           SELECT 1 FROM part b
           WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
             AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))""",
    "o5_stratified_sample" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
                  CAST(row_number() OVER (PARTITION BY source
                        ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)),
                                 doc_id) AS BIGINT) AS rk
           FROM documents)
         WHERE rk <= 5""",
    "u1_union_all" ->
      """SELECT c_custkey, count(*) AS n_copies FROM (
           SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
           UNION ALL
           SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 4000)
         GROUP BY 1""",
    "u1b_union_distinct" ->
      """SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 4000""",
    "u2_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""",
    "u2b_intersect_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
           SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1995
           INTERSECT ALL
           SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996)
         GROUP BY 1""",
    "u3_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""",
    "u3b_except_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
           SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1995
           EXCEPT ALL
           SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996)
         GROUP BY 1"""
  )
}
