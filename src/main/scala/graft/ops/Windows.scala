package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Window-function inventory (SURVEY.md §2 B5).
  *
  * Every ORDER BY inside a window carries a unique tiebreaker key so results
  * are total-ordered and deterministic — the property that makes window
  * output hash-comparable across engines and across partitionings.
  * Partition keys are real data keys (nation, customer, supplier), so at
  * 100 TB each partition stays bounded and the sort is per-key, not global.
  */
object Windows {
  import Relational.{Q, dsum, cents}
  private val D2 = DecimalType(18, 2)

  /** W1: row_number / rank / dense_rank / ntile within nation. */
  val w1Rank: Q = (s, d) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d).select(
      col("c_nationkey"), col("c_custkey"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rk"),
      dense_rank().over(w).as("drk"),
      ntile(4).over(w).as("quartile"))
  }

  /** W2: lag / lead over each customer's order history. */
  val w2LagLead: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
      lag(col("o_orderkey"), 2, -1L).over(w).as("prev2_orderkey"))
  }

  /** W3: running sum (ROWS frame) + RANGE frame aggregate. */
  val w3RunningSum: Q = (s, d) => {
    val wRows = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRange = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_linenumber"))
      .rangeBetween(-1, 1)
    Tables.lineitem(s, d)
      .where(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        sum(col("l_quantity").cast(D2)).over(wRows).cast("double").as("running_qty"),
        sum(col("l_quantity").cast(D2)).over(wRange).cast("double").as("nbr_qty"))
  }

  /** W4: first/last value over the full partition frame. */
  val w4FirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, d).select(
      col("c_nationkey"), col("c_custkey"),
      first(col("c_name")).over(w).as("richest"),
      last(col("c_name")).over(w).as("poorest"))
  }

  /** W5: top-k per group (row_number + filter). */
  val w5TopkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  /** W6: distribution window functions — percent_rank / cume_dist over the
    * ordered partition, nth_value over the full frame. Deterministic via
    * the c_custkey tiebreak (equal balances are common in the fixture). */
  val w6Distribution: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, d).select(
      col("c_custkey"), col("c_mktsegment"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      nth_value(col("c_name"), 2).over(full).as("second_poorest"))
  }

  /** W7: event-TIME range frame — per event, how much did THIS user do in
    * the trailing hour (inclusive)? The feature-engineering staple
    * ("activity in the last N minutes" columns for fraud/abuse models).
    * The frame is RANGE over exact µs-longs (`unix_micros`), so the window
    * is true event-time — same-timestamp peers all enter the frame, and
    * ROWS-frame off-by-one ambiguity never arises. One user-partitioned
    * sort, no self-join: the naive equivalent is an events×events interval
    * join; the range frame computes it in one pass per partition. Money
    * sums go through the cents-as-long trick (exact cross-engine). */
  val w7TimeRange: Q = (s, d) => {
    val hourUs = 3600L * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-hourUs, 0)
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(cents(col("value"))).over(w).as("cents_1h"))
  }

  /** W5b: top-k per group WITHOUT the per-group sort — w5's scale path.
    * The window form sorts every group in full to keep 3 rows; the native
    * [[graft.functions.TopKSketch]] aggregate holds ≤ k (value, id) pairs
    * per group at EVERY stage (map-side partials included), so only
    * k·groups pairs cross the shuffle regardless of fact-table size.
    * Output rows are exactly w5's (same order key, same id tiebreak), so
    * the two share an oracle — the l45/l5 pattern: the scale variant is
    * hash-checked through its exact twin. */
  val w5bTopkAgg: Q = (s, d) => {
    graft.functions.TopKSketch.register(s)
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(expr("topk_sketch(o_totalprice, o_orderkey, 3)").as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_custkey"), col("t.id").as("o_orderkey"),
        col("t.value").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** W5c: the [[graft.plans.TopKRewrite]] optimizer rule on the DECLARED
    * surface — the user writes the NATURAL row_number window top-k
    * (top-3 customers per nation by exact cents revenue) and runs it in
    * the extensions-installed session ([[graft.core.Sessions.extended]],
    * i.e. `spark.sql.extensions=graft.GraftExtensions`), where the rule
    * silently rewrites it to the bounded topk_sketch aggregate: no
    * per-group sort anywhere, ≤ k (value, id) pairs per group through the
    * map-side partials and the shuffle. The oracle runs the window form —
    * rows must be IDENTICAL (the rule's equivalence contract) — and
    * PlanSpec pins the rewritten physical plan (ObjectHashAggregate
    * present, no Window, no Sort). The revenue rollup happens FIRST on
    * orders alone (one o_custkey exchange), then the nation key joins on;
    * the window's child outputs exactly partition ∪ {value, id}, which is
    * the rule's fire condition. */
  val w5cTopkRewrite: Q = (s0, d) => {
    val s = graft.core.Sessions.extended(s0)
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
    val rev = perCust
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_custkey"), col("rev_cents"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("rev_cents").desc, col("c_custkey"))
    rev.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("rev_cents"), col("rn"))
  }

  val queries: Map[String, Q] = Map(
    "w5b_topk_agg" -> w5bTopkAgg,
    "w5c_topk_rewrite" -> w5cTopkRewrite,
    "w1_rank" -> w1Rank,
    "w2_lag_lead" -> w2LagLead,
    "w3_running_sum" -> w3RunningSum,
    "w4_first_last" -> w4FirstLast,
    "w5_topk_per_group" -> w5TopkPerGroup,
    "w6_distribution" -> w6Distribution,
    "w7_time_range" -> w7TimeRange
  )

  val oracle: Map[String, String] = Map(
    // w5b reproduces w5's rows exactly (same rank order, same tiebreak) —
    // the bounded-state aggregate is hash-checked through the exact twin
    "w5b_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders
         QUALIFY rn <= 3""",
    // w5c's oracle is the UN-rewritten window form — the optimizer-rule
    // equivalence contract checked row-for-row through the hash gate
    "w5c_topk_rewrite" ->
      """WITH rev AS (SELECT c.c_nationkey, c.c_custkey,
                             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                                  AS BIGINT) AS rev_cents
                      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                      GROUP BY 1, 2)
         SELECT c_nationkey, c_custkey, rev_cents,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY rev_cents DESC, c_custkey) AS rn
         FROM rev
         QUALIFY rn <= 3""",
    "w1_rank" ->
      """SELECT c_nationkey, c_custkey,
                row_number() OVER w AS rn, rank() OVER w AS rk,
                dense_rank() OVER w AS drk, ntile(4) OVER w AS quartile
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""",
    "w2_lag_lead" ->
      """SELECT o_orderkey, o_custkey,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_orderkey, 1) OVER w AS next_orderkey,
                lag(o_orderkey, 2, -1) OVER w AS prev2_orderkey
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "w3_running_sum" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER
                  (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER
                  (PARTITION BY l_suppkey ORDER BY l_linenumber
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS nbr_qty
         FROM lineitem WHERE l_orderkey <= 1000""",
    "w4_first_last" ->
      """SELECT c_nationkey, c_custkey,
                first_value(c_name) OVER w AS richest,
                last_value(c_name) OVER w AS poorest
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "w6_distribution" ->
      """SELECT c_custkey, c_mktsegment,
                percent_rank() OVER w AS pr,
                cume_dist() OVER w AS cd,
                nth_value(c_name, 2) OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS second_poorest
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""",
    "w5_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders
         QUALIFY rn <= 3""",
    "w7_time_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                count(*) OVER w AS n_1h,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
  )
}
