package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.functions.WeightedAvg

/** Aggregation inventory (SURVEY.md §2 B4).
  *
  * All of these are single-shuffle hash aggregations with map-side partial
  * aggregation — the shape that scales linearly with data volume. Exact
  * decimal accumulation (see [[Relational.dsum]]) keeps double sums
  * order-independent so results verify bit-for-bit at any parallelism.
  */
object Aggregates {
  import Relational.{Q, dsum}
  private val D2 = DecimalType(18, 2)

  /** G1: count / sum / min / max / avg (avg as exact-sum ÷ count). */
  val g1Basic: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (sum(col("l_quantity").cast(D2)) / count(col("l_quantity")))
          .cast("double").as("avg_qty"))

  /** G2: COUNT(DISTINCT) and SUM(DISTINCT). */
  val g2Distinct: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        sum_distinct(col("o_totalprice").cast(D2)).cast("double").as("sum_prices"))

  /** G3: HLL approx-distinct, declared as a bounded-error check — the query
    * itself asserts |approx − exact| ≤ 5%·exact, so the oracle is `true`. */
  val g3ApproxDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .select(col("l_returnflag"),
        (abs(col("approx") - col("exact")) <= col("exact") * 0.05).as("approx_ok"))

  /** G4: ROLLUP with grouping() disambiguation. */
  val g4Rollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"),
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("g_flag"), col("g_status"), col("n"), col("sum_qty"))

  /** G4b: CUBE over two dims. */
  val g4Cube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("n"))

  /** G4c: explicit GROUPING SETS (SQL surface) — the general form rollup
    * and cube are shorthands for. */
  val g4cGroupingSets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS prio,
                count(*) AS n
         FROM graft_orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                 (o_orderstatus, o_orderpriority))""")
  }

  /** G5: HAVING — post-aggregation filter. */
  val g5Having: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("bal"))
      .filter(col("n_cust") > 3)

  /** G6: stddev / variance / corr / exact percentile. UNROUNDED on both
    * sides: the checker compares floats at 1e-6 RELATIVE tolerance, which
    * absorbs partial-aggregate merge-order wobble (~1e-12 relative); a
    * round(x, 4) would instead FLIP between adjacent 4-decimal values when
    * a statistic sits within wobble of a .00005 boundary — nondeterministic
    * pass/fail that depends on task scheduling. */
  val g6Stats: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        stddev_samp(col("l_quantity")).as("sd_qty"),
        var_samp(col("l_quantity")).as("var_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_qp"),
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"))

  /** G6b: approx percentile (t-digest style sketch) — like G3, declared as
    * a bounded-error self-check: the approximation must land within 5% of
    * the exact quantile, so the oracle is `true` per group. At 100 TB the
    * sketch is the only option (exact percentile needs a per-group sort). */
  val g6bApproxPercentile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
        expr("percentile(l_extendedprice, 0.5)").as("ex50"))
      .select(col("l_returnflag"),
        (abs(col("ap50") - col("ex50")) <= col("ex50") * 0.05).as("approx_ok"))

  /** G7: collect_set, canonicalized by sorting + joining (deterministic). */
  val g7CollectSet: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("n_cust"))

  /** G8: pivot with pinned value list (null cells filled to 0 to match the
    * FILTER-aggregate twin). */
  val g8Pivot: Q = (s, d) => {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
      .na.fill(0, segs)
  }

  /** G9: custom typed UDAF (exact-decimal weighted average). */
  val g9WeightedAvg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(WeightedAvg(col("l_extendedprice").cast(D2), col("l_quantity").cast(D2))
        .as("wavg_price"))

  /** G10: two-phase (salted) aggregation — partial agg on (key, salt), then
    * final agg on key. Equals the direct groupBy (decimal sums are exact, so
    * re-association is lossless); at scale the first phase caps any hot
    * key's reducer load at 1/S of its rows. Spark's map-side partial
    * aggregation does this implicitly per-task — the explicit salt extends
    * the same idea across tasks for extreme skew. */
  val g10TwoPhaseAgg: Q = (s, d) => {
    val S = 8
    Tables.lineitem(s, d)
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("l_quantity").cast(D2)).as("pq"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pn")).as("n"), sum(col("pq")).cast("double").as("sum_qty"))
  }

  /** G11: MERGEABLE HLL sketches (Datasketches `hll_sketch_agg`) — the
    * precompute-once pattern that makes 100 TB reporting cheap: per-group
    * sketches are built in ONE scan, persist as bytes, and any rollup
    * (here the global distinct-user count) is a register-wise
    * `hll_union_agg` over sketches — no second scan of raw data, unlike
    * g2's exact count_distinct whose per-key sets can't be re-aggregated.
    * Insert/union are register-max operations: order-independent, so the
    * result is deterministic under any partitioning.
    *
    * Driver-verifiable property form (VERDICT r6 #1): DuckDB has no
    * Datasketches HLL, so the declared row carries the EXACT distinct
    * count (computed in-plan, reproducible by the oracle) plus a
    * `within_bound` boolean pinning the estimate to ±5% of it — per type
    * from the per-group sketches, and for the "ALL" rollup from the
    * register-wise `hll_union_agg` merge (NOT a re-scan), against an
    * independent exact global count_distinct. An estimate drift or a
    * broken merge flips the boolean and fails the hash compare; the
    * precise error-vs-exact contract stays in ScalaTest. */
  val g11HllMerge: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val tol = 0.05
    val perType = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"),
        count_distinct(col("user_id")).as("nd_exact"))
    val per = perType.select(col("event_type"), col("nd_exact"),
      (abs(expr("hll_sketch_estimate(sk)") - col("nd_exact"))
        <= col("nd_exact") * tol).as("within_bound"))
    val globalExact = ev.agg(count_distinct(col("user_id")).as("nd_exact"))
    val global = perType
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .crossJoin(globalExact)
      .select(lit("ALL").as("event_type"), col("nd_exact"),
        (abs(col("est") - col("nd_exact")) <= col("nd_exact") * tol)
          .as("within_bound"))
    per.union(global)
  }

  /** G14: sketch SET ALGEBRA — distinct-user overlap between every pair
    * of event types by inclusion-exclusion over mergeable HLL sketches:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B). The audience-overlap question
    * ("how many purchase users also hit errors?") answered from the
    * 5-row per-type sketch table alone — any of the K·(K−1)/2 pair
    * intersections costs two estimates and one sketch union, with NO
    * re-scan of raw events (the g11 precompute-once posture extended
    * from rollups to set operations).
    *
    * Intersection error compounds to ~3 σ of a single estimate, so the
    * declared bound is ±10% (vs g11's ±5% for plain estimates) — pinned
    * with the exact in-plan twin in property form like g11/g11b. */
  val g14HllIntersect: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val sk = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val pairs = sk.select(col("event_type").as("ta"), col("sk").as("ska"))
      .crossJoin(sk.select(col("event_type").as("tb"), col("sk").as("skb")))
      .where(col("ta") < col("tb")) // K sketch rows — the cross is K², tiny
      .select(col("ta"), col("tb"),
        (expr("hll_sketch_estimate(ska)") + expr("hll_sketch_estimate(skb)") -
          expr("hll_sketch_estimate(hll_union(ska, skb))")).as("est"))
    val ut = ev.select(col("user_id"), col("event_type")).distinct()
    val exact = ut.as("x").join(ut.as("y"), Seq("user_id"))
      .where(col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count_distinct(col("user_id")).as("nd_exact"))
    exact.join(pairs, Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("nd_exact"),
        (abs(col("est") - col("nd_exact")) <=
          greatest(col("nd_exact") * 0.1, lit(5.0))).as("within_bound"))
  }

  /** G11b: the precompute-once pattern END-TO-END — what makes 100 TB
    * reporting cheap in practice: per-(type, day) HLL sketches are built
    * in one scan and PERSISTED as parquet bytes (the nightly job); the
    * rollup then unions the persisted sketches with `hll_union_agg` —
    * never re-scanning raw events. Declared in property form like g11:
    * the row carries the in-plan exact distinct count plus the ±5% bound
    * boolean on the rolled-up estimate, so a corrupted persisted sketch
    * or a broken union fails the hash compare. */
  val g11bHllPersist: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val dir = graft.core.TempDirs.scratchSlot("hll_sketches").toString
    ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val rolled = s.read.parquet(dir).groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("nd_exact"))
      .join(rolled, Seq("event_type"))
      .select(col("event_type"), col("nd_exact"),
        (abs(col("est") - col("nd_exact")) <= col("nd_exact") * 0.05)
          .as("within_bound"))
  }

  /** G12: EXACT mergeable distinct via roaring-style bitmaps — g11's
    * sketch trades exactness for fixed size; the bitmap family keeps
    * exactness and stays mergeable: ids split into (bucket, bit position),
    * one bitmap per (group, bucket) built in a single scan, any rollup is
    * a register-wise `bitmap_or_agg` + `bitmap_count` sum — again no
    * second scan of raw data, and (unlike count_distinct) the partial
    * state is re-aggregatable across grouping levels. Exact ⇒ DuckDB
    * oracle applies (count DISTINCT per type and globally). */
  val g12BitmapDistinct: Q = (s, d) => {
    val perBucket = Tables.events(s, d)
      .select(col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("bkt"),
        expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy(col("event_type"), col("bkt"))
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
    perBucket
      .groupBy(col("event_type"))
      .agg(sum(expr("bitmap_count(bm)")).as("nd_users"))
      .union(perBucket
        .groupBy(col("bkt")).agg(expr("bitmap_or_agg(bm)").as("bm"))
        .agg(sum(expr("bitmap_count(bm)")).as("nd_users"))
        .select(lit("ALL").as("event_type"), col("nd_users")))
  }

  /** G13: MERGEABLE heavy-hitters via a native Misra-Gries aggregate
    * ([[graft.functions.FreqSketch]]) — the frequent-items member of the
    * sketch family (g11 HLL distinct, g12 exact bitmap): one scan builds
    * a ≤k-counter summary per group (only k pairs cross the shuffle; the
    * exact word count l3 moves the whole vocabulary), partials merge
    * without losing the n/(k+1) error bound (Agarwal et al., PODS 2012).
    *
    * Driver-verifiable property form: the sketch itself has no DuckDB
    * twin, so the row carries per-source (n_words, n_heavy) computed
    * EXACTLY in-plan — both reproducible by the oracle — plus
    * `all_heavy_in_sketch`, the MG containment guarantee (every word
    * with count > n/(k+1) is in the sketch), asserted TRUE. */
  val g13FreqSketch: Q = (s, d) => {
    graft.functions.FreqSketch.register(s)
    val k = 16
    val words = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val sk = words.groupBy(col("source"))
      .agg(expr(s"freq_sketch(w, $k)").as("mp"),
        count(lit(1)).as("n_words"))
    val heavy = words.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .join(sk.select(col("source"), col("n_words"), col("mp")), Seq("source"))
      .where(col("c") > col("n_words") / (k + 1))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_heavy"),
        sum(when(array_contains(map_keys(col("mp")), col("w")), 1L)
          .otherwise(0L)).as("n_in_sketch"))
    sk.join(heavy, Seq("source"), "left")
      .select(col("source"), col("n_words"),
        coalesce(col("n_heavy"), lit(0L)).as("n_heavy"),
        coalesce(col("n_heavy") === col("n_in_sketch"), lit(true))
          .as("all_heavy_in_sketch"))
  }

  /** G15: Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
    * mergeable point-frequency estimator that complements g13's Misra-
    * Gries: MG answers "which items are heavy", CM answers "how often is
    * THIS item seen" for any item, in fixed memory per group, with
    * partial-aggregate merges that are plain counter additions (same
    * seed ⇒ merged sketch ≡ single-pass sketch, pinned in ScalaTest).
    * Built with Spark's native partial-aggregating `count_min_sketch`
    * (ε = 0.001 ⇒ width 2000 counters, δ = 0.001 ⇒ 10 rows — ~160 KB per
    * source regardless of corpus size).
    *
    * Property form (the g11/g13 rule — the sketch has no DuckDB twin):
    * probe words are the corpus top-10 by exact (count desc, word asc) —
    * a deterministic set both engines derive — and each (source, probe)
    * row carries the EXACT in-plan count plus the two CM guarantees as
    * booleans the oracle recomputes/asserts: est ≥ exact (CM never
    * undercounts) and est ≤ exact + ⌈ε·N⌉ (the width bound; deterministic
    * here — fixed seed, fixed data). */
  val g15CmSketch: Q = (s, d) => {
    val eps = 0.001
    val words = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val probes = words.groupBy(col("w")).agg(count(lit(1)).as("cn"))
      .orderBy(col("cn").desc, col("w")).limit(10).select(col("w"))
    val sk = words.groupBy(col("source"))
      .agg(count_min_sketch(col("w"), lit(eps), lit(0.999), lit(42)).as("sk"),
        count(lit(1)).as("n_tokens"))
    val exact = words.join(broadcast(probes), Seq("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("exact"))
    exact.join(sk, Seq("source"))
      .withColumn("est", graft.functions.CmSketch.estimate(col("sk"), col("w")))
      .select(col("source"), col("w"), col("exact"),
        (col("est") >= col("exact")).as("ge_ok"),
        (col("est") <= col("exact") + ceil(lit(eps) * col("n_tokens")))
          .as("bound_ok"))
  }

  /** G16: deterministic MODE per key — "each user's most frequent event
    * type", the categorical favorite/segment primitive. Spark's and
    * DuckDB's built-in `mode()` both break frequency ties arbitrarily
    * (engine- and partitioning-dependent); the argmax-struct trick
    * (max over (count, reversed tie-break)) pins ties by (count desc,
    * value asc) as a pure HASH aggregation — two keyed aggs, no window,
    * no sort, map-side partials all the way (the l40 label-vote shape). */
  val g16Mode: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      // lexicographic struct MIN over (−count, type) = (count desc,
      // type asc) — a plain hash aggregation, no per-key sort
      .agg(min(struct((-col("c")).as("negc"), col("event_type"))).as("m"))
      .select(col("user_id"), (-col("m.negc")).as("n_events"),
        col("m.event_type").as("mode_type"))

  val queries: Map[String, Q] = Map(
    "g16_mode" -> g16Mode,
    "g15_cm_sketch" -> g15CmSketch,
    "g11b_hll_persist" -> g11bHllPersist,
    "g14_hll_intersect" -> g14HllIntersect,
    "g13_freq_sketch" -> g13FreqSketch,
    "g10_two_phase_agg" -> g10TwoPhaseAgg,
    "g11_hll_merge" -> g11HllMerge,
    "g12_bitmap_distinct" -> g12BitmapDistinct,
    "g1_basic_agg" -> g1Basic,
    "g2_distinct_agg" -> g2Distinct,
    "g3_approx_distinct" -> g3ApproxDistinct,
    "g4_rollup" -> g4Rollup,
    "g4b_cube" -> g4Cube,
    "g4c_grouping_sets" -> g4cGroupingSets,
    "g5_having" -> g5Having,
    "g6_stats" -> g6Stats,
    "g6b_approx_percentile" -> g6bApproxPercentile,
    "g7_collect_set" -> g7CollectSet,
    "g8_pivot" -> g8Pivot,
    "g9_weighted_avg" -> g9WeightedAvg
  )

  val oracle: Map[String, String] = Map(
    "g16_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
                    FROM events GROUP BY 1, 2),
            r AS (SELECT user_id, event_type, c,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY c DESC, event_type) AS rk
                  FROM c)
         SELECT user_id, CAST(c AS BIGINT) AS n_events,
                event_type AS mode_type
         FROM r WHERE rk = 1""",
    "g15_cm_sketch" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                      FROM documents),
            probes AS (SELECT w FROM (SELECT w, count(*) AS cn FROM tok
                                      GROUP BY 1 ORDER BY cn DESC, w LIMIT 10))
         SELECT source, tok.w AS w, CAST(count(*) AS BIGINT) AS exact,
                TRUE AS ge_ok, TRUE AS bound_ok
         FROM tok JOIN probes ON tok.w = probes.w
         GROUP BY 1, 2""",
    "g14_hll_intersect" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT x.event_type AS ta, y.event_type AS tb,
                CAST(count(DISTINCT x.user_id) AS BIGINT) AS nd_exact,
                TRUE AS within_bound
         FROM ut x JOIN ut y ON x.user_id = y.user_id
                            AND x.event_type < y.event_type
         GROUP BY 1, 2""",
    "g11b_hll_persist" ->
      """SELECT event_type, count(DISTINCT user_id) AS nd_exact,
                TRUE AS within_bound
         FROM events GROUP BY event_type""",
    "g13_freq_sketch" ->
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
                    FROM documents),
            n AS (SELECT source, count(*) AS n_words FROM w GROUP BY 1),
            h AS (SELECT c.source, count(*) AS n_heavy
                  FROM (SELECT source, w, count(*) AS c FROM w GROUP BY 1, 2) c
                  JOIN n USING (source)
                  WHERE c.c > n.n_words / 17.0
                  GROUP BY 1)
         SELECT n.source, CAST(n.n_words AS BIGINT) AS n_words,
                CAST(coalesce(h.n_heavy, 0) AS BIGINT) AS n_heavy,
                TRUE AS all_heavy_in_sketch
         FROM n LEFT JOIN h USING (source)""",
    "g11_hll_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS nd_exact,
                TRUE AS within_bound
         FROM events GROUP BY event_type
         UNION ALL
         SELECT 'ALL' AS event_type, count(DISTINCT user_id) AS nd_exact,
                TRUE AS within_bound
         FROM events""",
    "g12_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS nd_users FROM events
         GROUP BY event_type
         UNION ALL
         SELECT 'ALL' AS event_type, count(DISTINCT user_id) AS nd_users
         FROM events""",
    "g10_two_phase_agg" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY 1""",
    "g1_basic_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(l_quantity) AS DOUBLE) AS avg_qty
         FROM lineitem GROUP BY 1, 2""",
    "g2_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
                CAST(sum(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_prices
         FROM orders GROUP BY 1""",
    "g3_approx_distinct" ->
      "SELECT l_returnflag, true AS approx_ok FROM lineitem GROUP BY 1",
    "g4_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                coalesce(l_linestatus, 'ALL') AS status,
                grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
                count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "g4b_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "g4c_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                 (o_orderstatus, o_orderpriority))""",
    "g5_having" ->
      """SELECT c_nationkey, count(*) AS n_cust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
         FROM customer GROUP BY 1 HAVING count(*) > 3""",
    "g6_stats" ->
      """SELECT l_returnflag,
                stddev_samp(l_quantity) AS sd_qty,
                var_samp(l_quantity) AS var_qty,
                corr(l_quantity, l_extendedprice) AS corr_qp,
                quantile_cont(l_quantity, 0.5) AS median_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty
         FROM lineitem GROUP BY 1""",
    "g6b_approx_percentile" ->
      "SELECT l_returnflag, true AS approx_ok FROM lineitem GROUP BY 1",
    "g7_collect_set" ->
      """SELECT c_nationkey,
                string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
                count(*) AS n_cust
         FROM customer GROUP BY 1""",
    "g8_pivot" ->
      """SELECT c_nationkey,
                count(*) FILTER (WHERE c_mktsegment='AUTOMOBILE') AS "AUTOMOBILE",
                count(*) FILTER (WHERE c_mktsegment='BUILDING')   AS "BUILDING",
                count(*) FILTER (WHERE c_mktsegment='FURNITURE')  AS "FURNITURE",
                count(*) FILTER (WHERE c_mktsegment='HOUSEHOLD')  AS "HOUSEHOLD",
                count(*) FILTER (WHERE c_mktsegment='MACHINERY')  AS "MACHINERY"
         FROM customer GROUP BY 1""",
    "g9_weighted_avg" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
         FROM lineitem GROUP BY 1"""
  )
}
