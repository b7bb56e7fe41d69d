package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Relational operator inventory (SURVEY.md §2 Part B, groups B1-B3).
  *
  * Each entry is one declared query: a Spark DataFrame builder plus a DuckDB
  * twin in [[oracle]]. Float parity rule: every SUM/AVG over a double column
  * goes through DECIMAL(18,2|4) on BOTH sides so the aggregate is exact and
  * order-independent, then is cast back to DOUBLE — identical bits regardless
  * of partitioning, so the same query verifies on local[32] and on a
  * 1000-executor cluster.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private val D2 = DecimalType(18, 2)
  /** Exact, order-independent sum of a 2-decimal money column. */
  def dsum(c: Column): Column = sum(c.cast(D2)).cast("double")

  /** The money-parity twin for long arithmetic: a double amount as exact
    * cents. Spark round() is HALF_UP like DuckDB's round(), so the paired
    * oracle `CAST(round(value * 100) AS BIGINT)` lands on identical longs
    * — any change to this rule must change BOTH sides, in one place each
    * (this helper and the oracle strings that cite it). */
  def cents(c: Column): Column = round(c * 100).cast("long")
  /** sum(a * (1 - b)) in exact decimal arithmetic. */
  def revenue(price: Column, disc: Column): Column =
    sum(price.cast(D2) * (lit(1) - disc.cast(D2))).cast("double")

  // ---------------------------------------------------------------- B1 scans
  /** S1: parquet scan with filter+projection (pushdown-verified in tests). */
  val s1ParquetScan: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** S2+S6: CSV sink then CSV scan with explicit schema; aggregate parity. */
  val s2CsvRoundtrip: Q = (s, d) => {
    val out = graft.core.TempDirs.scratch("csv").toString
    Tables.nation(s, d).write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.schema(schema).option("header", "true").csv(out)
      .groupBy(col("n_regionkey")).agg(
        count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_name"))
  }

  /** S3+S6: JSON-lines sink then scan; aggregate parity. */
  val s3JsonRoundtrip: Q = (s, d) => {
    val out = graft.core.TempDirs.scratch("json").toString
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .write.mode("overwrite").json(out)
    s.read.json(out)
      .groupBy(col("c_mktsegment")).agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_bal"))
  }

  /** S2b: ORC sink + scan (the third columnar format after parquet/CSV/JSON);
    * DuckDB reads no ORC, so parity is via the same aggregate over the
    * original parquet table. */
  val s2bOrcRoundtrip: Q = (s, d) => {
    val out = graft.core.TempDirs.scratch("orc").toString
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy(col("c_nationkey")).agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_bal"))
  }

  /** S4: in-memory literal table joined to a stored one. */
  val s4InMemory: Q = (s, d) => {
    import s.implicits._
    val prio = Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
      ("4-NOT SPECIFIED", 4), ("5-LOW", 5)).toDF("prio_name", "prio_rank")
    Tables.orders(s, d)
      .join(prio, col("o_orderpriority") === col("prio_name"))
      .groupBy(col("prio_rank")).agg(count(lit(1)).as("n_orders"))
  }

  /** S5: partitioned parquet sink, re-read, aggregate parity. */
  val s5ParquetSink: Q = (s, d) => {
    val out = graft.core.TempDirs.scratch("pq").toString
    Tables.lineitem(s, d)
      .where(col("l_quantity") > 25)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    s.read.parquet(out)
      .groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("total_price"))
  }

  // ------------------------------------------------- B2 projection / filter
  /** P1: project / rename / drop / computed column. */
  val p1Project: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumnRenamed("c_custkey", "id")
      .withColumn("name_upper", upper(col("c_name")))
      .withColumn("bal_cents", (col("c_acctbal").cast(D2) * 100).cast("long"))
      .drop("c_acctbal", "c_name")
      .select(col("id"), col("name_upper"), col("bal_cents"), col("c_mktsegment"))

  /** P2: comparison, BETWEEN, IN, LIKE, NOT, boolean combos. */
  val p2Filter: Q = (s, d) =>
    Tables.orders(s, d)
      .where(
        col("o_totalprice").between(1000, 200000) &&
        col("o_orderstatus").isin("O", "F") &&
        col("o_orderpriority").like("%URGENT%") &&
        !(col("o_custkey") === 7) &&
        (col("o_orderkey") % 2 === 0 || col("o_totalprice") > 150000))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** P3: CASE WHEN bucketing. */
  val p3CaseWhen: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("price_band",
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high"))
      .groupBy(col("price_band"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))

  /** P4: casts across numeric/string/date types. */
  val p4Cast: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_quantity").cast("string").as("qty_str"),
        col("l_linenumber").cast("double").as("line_dbl"),
        col("l_shipdate").cast("date").cast("string").as("ship_day"))
      .where(col("l_orderkey") <= 100)

  /** P5: null creation + coalesce / fill / drop. */
  val p5Nulls: Q = (s, d) => {
    val withNulls = Tables.customer(s, d)
      .withColumn("maybe_seg",
        when(col("c_custkey") % 3 === 0, col("c_mktsegment")))
      .withColumn("maybe_bal",
        when(col("c_acctbal") > 0, col("c_acctbal")))
    withNulls
      .na.fill(Map("maybe_bal" -> -1.0))
      .withColumn("seg_or_na", coalesce(col("maybe_seg"), lit("NA")))
      .groupBy(col("seg_or_na"))
      .agg(count(lit(1)).as("n"), dsum(col("maybe_bal")).as("bal_filled"))
  }

  /** P6: distinct on a projection (dropDuplicates full-row). */
  val p6Distinct: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"))
      .dropDuplicates()

  // ---------------------------------------------------------------- B3 joins
  /** J1 flagship: 5-way star join + filter + exact-decimal revenue agg.
    * Dims are broadcast (see j6); fact-fact join shuffles on the key. */
  val j1RevenueByNation: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             o("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** J2: left outer join keeping customers with zero orders. */
  val j2LeftOuter: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
  }

  /** J2b: full outer join over two derived key sets. */
  val j2FullOuter: Q = (s, d) => {
    val buyers = Tables.orders(s, d).where(col("o_totalprice") > 180000)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("big_orders"))
    val rich = Tables.customer(s, d).where(col("c_acctbal") > 4000)
      .select(col("c_custkey").as("k"), col("c_acctbal"))
    buyers.join(rich, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("big_orders"), lit(0L)).as("big_orders"),
        coalesce(col("c_acctbal").cast(D2).cast("double"), lit(-1.0)).as("bal"))
  }

  /** J3: left semi + left anti — customers with/without orders, per nation. */
  val j3SemiAnti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("with_orders"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("without_orders"))
    semi.join(anti, Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
  }

  /** J4: cross join (both sides tiny — broadcast NL join). */
  val j4Cross: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_name"), col("n_name"))

  /** J5: theta join — equi key + range predicate (ship after order date). */
  val j5RangeJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
               li("l_shipdate") > o("o_orderdate"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_shipped_after"),
           dsum(col("l_extendedprice")).as("price_sum"))
  }

  /** J6: explicit broadcast of the dimension side; result must equal the
    * non-hinted plan (the oracle is the same SQL as a plain join). */
  val j6Broadcast: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("price_sum"))
  }

  /** J7: as-of join — for each purchase event, the latest signup of the same
    * user at-or-before it. Implemented scale-first: one shuffle on user_id +
    * an ordered window (no row-pair explosion), instead of an inequality
    * self-join. Oracle: DuckDB ASOF JOIN. */
  val j7AsOf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val tagged = ev.select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"),
      when(col("event_type") === "signup", col("ts")).as("signup_ts"))
    // at EQUAL ts a signup must sort before the purchase so the window
    // frame includes it — ASOF's predicate is s.ts <= p.ts, inclusive;
    // ordering by event_id alone would exclude a same-ts signup with a
    // larger event_id
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === "signup", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_signup", last(col("signup_ts"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase" && col("last_signup").isNotNull)
      .select(col("event_id"),
        col("user_id"),
        unix_timestamp(col("ts")).as("purchase_sec"),
        unix_timestamp(col("last_signup")).as("signup_sec"))
  }

  /** J8: skew-safe TWO-PATH salted join — the 1000-executor remedy for hot
    * keys, without taxing the cold ones. Hot keys are detected from a
    * seeded sample of the fact side (map-side partial agg; only keys above
    * the threshold survive, a tiny broadcastable set — the cheap stand-in
    * for a count-min sketch). The hot slice joins salted: fact rows get a
    * deterministic salt (hash of the unique row key mod S) and ONLY the hot
    * dim rows are replicated ×S, splitting each hot key across S reducers.
    * The cold slice joins plain — no replication at all (round 1 replicated
    * the whole dim ×8). Misclassification by the sample affects only
    * partition balance, never the result: both paths are exact, so the
    * union is provably identical to the plain join (the oracle). AQE's
    * runtime skew-split handles this adaptively; the salted form is the
    * static guarantee for pipelines that can't rely on it. */
  val j8SaltedJoin: Q = (s, d) => {
    val S = 8
    val sampleFrac = 0.1
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val hot = broadcast(
      li.sample(withReplacement = false, sampleFrac, seed = 42)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2) // ≥2 sampled rows ⇒ estimated df ≥ 2/frac
        .select(col("l_orderkey").as("hk")))
    val liHot = li.join(hot, li("l_orderkey") === hot("hk"), "left_semi")
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S)))
    val oHot = o.join(hot, o("o_orderkey") === hot("hk"), "left_semi")
      .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    val liCold = li.join(hot, li("l_orderkey") === hot("hk"), "left_anti")
    val oCold = o.join(hot, o("o_orderkey") === hot("hk"), "left_anti")
    // SHUFFLE_HASH: oHot is the hot dim ×S via explode — its static size
    // estimate is the pre-explode lie (the l5 trap class), and a broadcast
    // here would erase the very salted-shuffle split this operator exists
    // to guarantee (hot keys spread across S reducers). The hint pins the
    // shuffle on (key, salt) that IS the salting pattern.
    val hotJoined = liHot.join(oHot.hint("shuffle_hash"),
      liHot("l_orderkey") === oHot("o_orderkey") && liHot("salt") === oHot("salt"))
      .select(col("o_orderpriority"), col("l_extendedprice"))
    val coldJoined = liCold.join(oCold, liCold("l_orderkey") === oCold("o_orderkey"))
      .select(col("o_orderpriority"), col("l_extendedprice"))
    hotJoined.unionByName(coldJoined)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("price_sum"))
  }

  /** J10: banded time-interval join — the no-equi-key range join done
    * right. "For each purchase, how many error events (ANY user) landed in
    * the trailing 60 s?" has no join key at all: the naive plan is a
    * broadcast-nested-loop over every (purchase, error) pair — quadratic in
    * event volume. BANDING restores an equi key: both sides bucket time by
    * the band width (60 s), the probe side is replicated to its own bucket
    * and the previous one (a trailing window of width ≤ band spans at most
    * 2 buckets), and the exact [t−60 s, t) predicate filters inside each
    * bucket. The join is a plain hash join on the bucket id; work scales
    * with Σ per-bucket density products, never |A|×|B|. Each pair meets
    * exactly once (an error lives in ONE bucket; the probe's 2 replicas
    * carry distinct bucket ids). µs-exact longs cross both engines; the
    * left join restores zero-count purchases. At 100 TB the band is the
    * knob: pick band ≈ window so replication stays ×2 regardless of data.
    * (j5 covers the equi+range case; this is the pure-range case.) */
  /** j10 core over ANY probe/index pair: `probe` carries (idCol, tsCol
    * µs-long), `index` carries (tsCol µs-long); emits per-probe counts of
    * index rows in the trailing [t−band, t) window. Exposed to the
    * pipeline registry as `time_band_join`. */
  private[graft] def timeBandJoinFrames(probe: DataFrame, index: DataFrame,
      idCol: String, probeTs: String, indexTs: String, bandUs: Long,
      outCol: String): DataFrame = {
    val probes = probe.select(col(idCol), col(probeTs).as("_pt"),
      explode(array(floor(col(probeTs) / bandUs).cast("long"),
        floor(col(probeTs) / bandUs).cast("long") - 1)).as("_b"))
    val idx = index.select(col(indexTs).as("_et"),
      floor(col(indexTs) / bandUs).cast("long").as("_b"))
    val counts = probes.join(idx, Seq("_b"))
      .where(col("_et") >= col("_pt") - bandUs && col("_et") < col("_pt"))
      .groupBy(col(idCol)).agg(count(lit(1)).as(outCol))
    probe.select(col(idCol)).join(counts, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(outCol), lit(0L)).as(outCol))
  }

  val j10TimeBandJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    timeBandJoinFrames(
      ev.where(col("event_type") === "purchase")
        .select(col("event_id"), unix_micros(col("ts")).as("pt")),
      ev.where(col("event_type") === "error")
        .select(unix_micros(col("ts")).as("et")),
      idCol = "event_id", probeTs = "pt", indexTs = "et",
      bandUs = 60L * 1000000L, outCol = "n_errors_60s")
  }

  /** S16: SCD2 dimension-history build — the slowly-changing-dimension
    * table every warehouse derives from a change stream: per customer, the
    * sequence of order PRIORITIES becomes versioned rows with
    * [valid_from, valid_to) ranges, consecutive equal values compressed
    * into one row, the open row flagged current. The scale shape is the
    * point: ONE shuffle on the dimension key — both windows (the
    * change-detection lag and the valid_to lead) share the same
    * (custkey, date, key) ordering, so Catalyst plans a single exchange +
    * sort and the second window rides it. The naive build (self-join
    * "next change per row") is an inequality join that explodes on busy
    * keys. Epoch-second longs for cross-engine exactness; ties broken by
    * order key so the history is deterministic under any partitioning. */
  /** s16 core over ANY change stream: `key` the dimension key, `ts` the
    * change timestamp, `tie` the deterministic tie-break column, `attr`
    * the tracked attribute. Exposed to the registry as `scd2`. */
  private[graft] def scd2Frames(df: DataFrame, key: String, ts: String,
      tie: String, attr: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val changes = df
      .select(col(key), col(tie), col(ts), col(attr).as("_attr"))
      .withColumn("_prev", lag(col("_attr"), 1).over(w))
      .where(col("_prev").isNull || col("_prev") =!= col("_attr"))
    val w2 = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    changes
      .withColumn("_vt", lead(col(ts), 1).over(w2))
      .select(
        col(key),
        col("_attr").as(attr),
        unix_timestamp(col(ts)).as("valid_from"),
        unix_timestamp(col("_vt")).as("valid_to"),
        col("_vt").isNull.as("is_current"))
  }

  val s16Scd2History: Q = (s, d) =>
    scd2Frames(
      Tables.orders(s, d).withColumnRenamed("o_orderpriority", "priority"),
      key = "o_custkey", ts = "o_orderdate", tie = "o_orderkey",
      attr = "priority")

  /** J11: point-in-time (as-of) join against the SCD2 dimension — the
    * canonical consumer of s16's history: each fact row joins the
    * dimension VERSION that was valid at its event time (valid_from ≤ ts
    * < valid_to, open current row), i.e. "revenue by the priority the
    * customer had WHEN they ordered", not the priority they have now.
    *
    * Plan: a plain custkey-keyed equi-join (dimension history is a few
    * versions per key — bounded multiplicity at any scale) with the
    * interval predicate as a post-join filter; never an unkeyed range
    * join. Interval semantics are unambiguous even under same-timestamp
    * version churn: a superseded same-instant version is zero-width
    * (valid_from = valid_to) and matches nothing, so every fact row
    * matches exactly one version. */
  val j11PitJoin: Q = (s, d) => {
    val hist = s16Scd2History(s, d)
    val facts = Tables.orders(s, d).select(col("o_custkey"),
      unix_timestamp(col("o_orderdate")).as("ts_s"),
      cents(col("o_totalprice")).as("cents_v"))
    facts.join(hist, Seq("o_custkey"))
      .where(col("valid_from") <= col("ts_s") &&
        (col("valid_to").isNull || col("ts_s") < col("valid_to")))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents_v")).as("cents"))
  }

  /** S12: SCHEMA-EVOLUTION read — a long-lived warehouse table whose
    * writer gained a column mid-stream: batch 1 lands (key, segment),
    * batch 2 lands (key, acctbal). `mergeSchema` reconciles the parquet
    * footers into one superset schema; rows carry null in the columns
    * their batch didn't have. At 100 TB this is the difference between
    * re-writing years of history on every producer change and just
    * reading on (footer merge is metadata work; the data files are
    * untouched). The aggregation exercises both null-filled directions. */
  val s12SchemaEvolution: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val out = graft.core.TempDirs.scratch("schema_evo").toString
    c.where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$out/b1")
    c.where(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_acctbal"))
      .write.mode("overwrite").parquet(s"$out/b2")
    s.read.option("mergeSchema", "true").parquet(s"$out/b1", s"$out/b2")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        count(col("c_acctbal")).as("n_with_bal"),
        coalesce(dsum(col("c_acctbal")), lit(0.0)).as("bal_sum"))
  }

  /** S13: MERGE/upsert — the CDC apply step every long-lived warehouse
    * table needs (the reference re-materializes whole impressions instead;
    * `VJob.py` has no notion of in-place change). A change batch carries
    * updates, brand-new rows and delete tombstones; the merged snapshot is
    * latest-version-wins per key, tombstones dropped. The Spark shape is
    * union + one window over the key — ONE shuffle on the merge key, no
    * join at all, and at 100 TB the window partitioning is exactly the
    * table's natural key layout so successive merges reuse the same
    * exchange. Change rows are derived deterministically from `orders` so
    * DuckDB can replay the merge arithmetic as CASE logic. */
  /** MERGE core over ANY snapshot/changes pair sharing a schema that
    * carries the merge key, a version column, and a delete-tombstone
    * boolean: latest-version-wins per key, tombstones dropped. ONE
    * shuffle on the merge key, no join operator (PlanSpec-pinned via
    * s13). Exposed to the pipeline registry as `merge_upsert`. */
  private[graft] def mergeUpsertFrames(snapshot: DataFrame, changes: DataFrame,
      key: String, version: String, deleteFlag: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    snapshot.unionByName(changes)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(version).desc)))
      .where(col("_rn") === 1 && !col(deleteFlag))
      .drop("_rn")
  }

  private def cdcShape(df: DataFrame, st: Column, pr: Column, v: Int, del: Boolean) =
    df.select(col("o_orderkey"), st.as("o_orderstatus"),
      pr.as("o_totalprice"), lit(v).as("v"), lit(del).as("del"))

  /** The CDC fixture's snapshot side (version 1, no tombstones). Shared by
    * s13 (one-shot merge) and t12 (streaming apply). */
  private[graft] def cdcSnapshot(o: DataFrame): DataFrame =
    cdcShape(o, col("o_orderstatus"), col("o_totalprice"), 1, del = false)

  /** The CDC fixture's change derivation — a ROW-LOCAL function of the
    * orders rows, so deriving it per micro-batch (t12) yields exactly the
    * change set of deriving it once (s13): each source row produces at
    * most one change row and the key spaces are disjoint across rows.
    *
    * updates: ×2.0 and not ×1.1 — doubling is binary-exact, so the
    * corrected double is no closer to a .005 decimal-cast halfway point
    * than the raw money values every other oracle already sums; ×1.1
    * would mint exact 3-decimal values whose DECIMAL(18,2) rounding is
    * engine-sensitive. Inserts mint new keys in a disjoint range;
    * tombstones delete the %17 keys. */
  private[graft] def cdcChanges(o: DataFrame): DataFrame = {
    val upd = cdcShape(o.where(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 17 =!= 0),
      lit("U"), col("o_totalprice") * 2.0, 2, del = false)
    val ins = cdcShape(o.where(col("o_orderkey") % 29 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)),
      lit("N"), lit(100.0), 2, del = false)
    val del = cdcShape(o.where(col("o_orderkey") % 17 === 0),
      col("o_orderstatus"), col("o_totalprice"), 2, del = true)
    upd.unionByName(ins).unionByName(del)
  }

  val s13MergeUpsert: Q = (s, d) => {
    val o = Tables.orders(s, d)
    mergeUpsertFrames(cdcSnapshot(o), cdcChanges(o), "o_orderkey", "v", "del")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("price_sum"))
  }

  /** S14: dynamic-partition-overwrite correction — the daily-rerun story
    * at 100 TB: a partitioned table holds history; one partition's data
    * was wrong; the corrected batch overwrites ONLY the partitions it
    * contains (`partitionOverwriteMode=dynamic`, set per-write, not on the
    * session), leaving every other partition's files untouched. Static
    * overwrite (the default) would TRUNCATE the whole table first — at
    * scale that's re-writing years to fix a day. The read-back aggregate
    * proves the other partitions survived byte-for-byte. */
  val s14DynamicOverwrite: Q = (s, d) => {
    val e = Tables.events(s, d)
    val out = graft.core.TempDirs.scratchSlot(
      "dyn_overwrite_" + d.replaceAll("[^A-Za-z0-9]", "_")).toString
    e.select(col("event_type"), col("event_id"), col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    // corrected 'click' batch: values re-scaled; row count intentionally
    // differs from the original partition (drops zero/negative values)
    e.where(col("event_type") === "click" && col("value") > 0)
      .select(col("event_type"), col("event_id"), (col("value") * 2.0).as("value"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(out)
    s.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).cast("double").as("value_sum"))
  }

  /** S17: incremental materialized-view maintenance — the standing-
    * aggregate refresh every warehouse runs nightly: the view's history
    * lives as PERSISTED PARTIAL AGGREGATES (count + exact cents-as-long
    * sum per key, both mergeable), and refresh touches ONLY the new
    * arrivals — partials for the delta are computed, unioned with the
    * stored partials, and re-aggregated by key. No history re-scan: at
    * 100 TB the delta is a day and the partial table is keys×months rows
    * (KB-scale), so refresh cost is O(delta), not O(history) — the whole
    * point of mergeable state (same posture as g11b's persisted sketches,
    * here with exact counters). Month parity stands in for the date
    * cutoff so both the split and the oracle are pure row predicates.
    * Money merges as cents-longs (round(×100)): partial sums re-sum
    * exactly, where double partials would drift by merge order. */
  val s17IncrementalAgg: Q = (s, d) => {
    val mv = graft.core.TempDirs.scratchSlot(
      "s17_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")).toString
    val o = Tables.orders(s, d)
      .withColumn("month_us", unix_micros(date_trunc("month", col("o_orderdate"))))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    def partials(df: DataFrame) =
      df.groupBy(col("o_orderstatus"), col("month_us"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
    // history = odd months, persisted as the standing partial table
    partials(o.where(month(col("o_orderdate")) % 2 === 1))
      .write.mode("overwrite").parquet(mv)
    // refresh: delta partials + stored partials, one merge re-agg
    s.read.parquet(mv)
      .unionByName(partials(o.where(month(col("o_orderdate")) % 2 === 0)))
      .groupBy(col("o_orderstatus"), col("month_us"))
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("cents")).as("cents"))
  }

  /** P7: one-pass column profiling — the ANALYZE/data-quality summary
    * (row count, null count, exact distinct count, min/max) for every
    * column of a table, long-format one row per column. All statistics
    * come out of ONE aggregation: Catalyst plans the multi-column
    * count_distinct set via Expand (one pass over the data, k-way row
    * multiplication before the partial agg — the standard exact plan;
    * the 100 TB swap is approx_count_distinct, same single-pass shape
    * minus the Expand). min/max render through type-stable channels:
    * integers/strings directly, doubles through the cents-as-long rule
    * every money oracle uses, so the stringified extrema compare exactly
    * cross-engine. */
  val p7Profile: Q = (s, d) => {
    val c = Tables.customer(s, d)
    def mm(x: Column) = x.cast("string")
    val agg = c.agg(
      count(lit(1)).as("n"),
      sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("nul1"),
      count_distinct(col("c_custkey")).as("nd1"),
      mm(min(col("c_custkey"))).as("mn1"), mm(max(col("c_custkey"))).as("mx1"),
      sum(when(col("c_name").isNull, 1L).otherwise(0L)).as("nul2"),
      count_distinct(col("c_name")).as("nd2"),
      mm(min(col("c_name"))).as("mn2"), mm(max(col("c_name"))).as("mx2"),
      sum(when(col("c_nationkey").isNull, 1L).otherwise(0L)).as("nul3"),
      count_distinct(col("c_nationkey")).as("nd3"),
      mm(min(col("c_nationkey"))).as("mn3"), mm(max(col("c_nationkey"))).as("mx3"),
      sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as("nul4"),
      count_distinct(col("c_acctbal")).as("nd4"),
      mm(cents(min(col("c_acctbal")))).as("mn4"), mm(cents(max(col("c_acctbal")))).as("mx4"),
      sum(when(col("c_mktsegment").isNull, 1L).otherwise(0L)).as("nul5"),
      count_distinct(col("c_mktsegment")).as("nd5"),
      mm(min(col("c_mktsegment"))).as("mn5"), mm(max(col("c_mktsegment"))).as("mx5"))
    agg.select(expr(
      """stack(5,
           'c_custkey',    n, nul1, nd1, mn1, mx1,
           'c_name',       n, nul2, nd2, mn2, mx2,
           'c_nationkey',  n, nul3, nd3, mn3, mx3,
           'c_acctbal',    n, nul4, nd4, mn4, mx4,
           'c_mktsegment', n, nul5, nd5, mn5, mx5)
         as (col_name, n_rows, n_null, n_distinct, min_s, max_s)"""))
  }

  /** P8: key-skew report — the distribution diagnostic run BEFORE choosing
    * a join strategy (it is what decides whether j8's salting or plain AQE
    * is enough): per-key counts summarized to total rows, key cardinality,
    * the heaviest key's count and the p50/p90/p99 of the count
    * distribution. Two shuffles (key agg, then a 1-row global agg over
    * key-cardinality rows — at 100 TB the summary agg sees one row per
    * KEY, not per data row; the percentile swap is approx_percentile,
    * same plan). Integer counts make the interpolated percentiles exact
    * rationals both engines compute identically in doubles. */
  val p8SkewReport: Q = (s, d) => {
    val perKey = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    perKey.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5D)").as("p50_cnt"),
      expr("percentile(cnt, 0.9D)").as("p90_cnt"),
      expr("percentile(cnt, 0.99D)").as("p99_cnt"))
  }

  /** P9: declarative data-quality expectations — the Deequ / dbt-test
    * contract check every ingest gate runs: completeness (NOT NULL),
    * uniqueness (key cardinality), range, accepted values, and
    * referential integrity, reported long-format one row per constraint
    * with the VIOLATION count (0 = pass), so a failing table says what
    * broke and by how much. Everything except the FK probe folds into ONE
    * aggregation over one scan (the p7 posture — Expand handles the
    * distinct); the FK check is a left-anti count against the dimension,
    * broadcast when it fits. At 100 TB this is the cheapest full-table
    * audit shape: no row-level violation materialization unless asked. */
  val p9Expectations: Q = (s, d) =>
    expectationsFrames(Tables.orders(s, d), Tables.customer(s, d))

  /** p9 core over ANY (orders-shaped, customer-shaped) pair — split out so
    * the spec can inject known violations and assert exact counts. */
  private[graft] def expectationsFrames(o: DataFrame, c: DataFrame): DataFrame = {
    val onePass = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_key"),
      count_distinct(col("o_orderkey")).as("nd_key"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("bad_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"))
    val orphans = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    onePass.crossJoin(orphans)
      .select(expr(
        """stack(5,
             'not_null:o_orderkey',        null_key,
             'unique:o_orderkey',          n - nd_key,
             'range:o_totalprice>0',       bad_price,
             'accepted:o_orderstatus',     bad_status,
             'fk:o_custkey->customer',     n_orphan)
           AS (check_name, n_violations)"""))
      .withColumn("passed", col("n_violations") === 0)
  }

  /** P10: freshness / completeness report (data observability) — the
    * per-stream health row an ingest pipeline monitors continuously:
    * event count, first/last arrival, hour-bucket span, distinct ACTIVE
    * hours, completeness (active/span — silent-gap detector) and
    * staleness vs the newest arrival anywhere in the table. Catches the
    * two failure modes row counts miss: a stream that stopped (staleness
    * grows) and a stream with silent holes (completeness < 1).
    *
    * Plan: one keyed aggregation for the per-stream stats + one
    * distinct-(key, hour) aggregation for active hours (hour buckets, so
    * the distinct state is span-bounded, not event-bounded) + a 1-row
    * corpus-max broadcast cross. All integer µs/hour arithmetic; the one
    * ratio rounds to 6. */
  val p10Freshness: Q = (s, d) =>
    freshnessFrames(Tables.events(s, d), "event_type", "ts")

  /** p10 core over ANY typed stream — registry name `freshness`. */
  private[graft] def freshnessFrames(ev: DataFrame, key: String,
      ts: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val base = ev.select(col(key), unix_micros(col(ts)).as("u"))
      .withColumn("h", floor(col("u") / hourUs))
    val stats = base.groupBy(col(key)).agg(
      count(lit(1)).as("n_events"),
      min(col("u")).as("first_us"),
      max(col("u")).as("last_us"),
      min(col("h")).as("h0"),
      max(col("h")).as("h1"))
    val active = base.select(col(key), col("h")).distinct()
      .groupBy(col(key)).agg(count(lit(1)).as("active_hours"))
    val corpus = base.agg(max(col("h")).as("corpus_h"))
    stats.join(active, Seq(key))
      .crossJoin(broadcast(corpus))
      .select(col(key), col("n_events"), col("first_us"), col("last_us"),
        (col("h1") - col("h0") + 1).as("span_hours"),
        col("active_hours"),
        round(col("active_hours").cast("double") / (col("h1") - col("h0") + 1), 6)
          .as("completeness"),
        (col("corpus_h") - col("h1")).as("staleness_hours"))
  }

  /** P11: population-stability drift report (PSI — the credit-scoring /
    * feature-monitoring standard for "did this feature's distribution
    * move between two windows"), here between the corpus's earlier and
    * later halves per event_type over fixed-width value bins.
    *
    * PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b); > 0.25 is the conventional
    * "significant drift" alarm. Fixed bins (width 50, last open) keep the
    * bin key a pure row function; the time split is the µs midpoint of
    * the corpus span — a 1-row broadcast (the p10 corpus-stats shape), so
    * the whole report is two keyed aggregations over (type, bin, half)
    * counts — bin-cardinality rows after the first shuffle, never
    * event-scale again. Bins empty on either side are excluded from the
    * sum (the standard smoothing-free convention) but reported in
    * n_bins_skipped so silence is visible. Integer counts cross engines;
    * only the final round(·,6) PSI is float (the l21/l41 sum-parity
    * rule). Registry transform `psi_drift` takes key/value/bin width. */
  private[graft] def psiDriftFrames(ev: DataFrame, key: String,
      ts: String, valueCol: String, binWidth: Double): DataFrame = {
    val base = ev.select(col(key), unix_micros(col(ts)).as("u"),
      col(valueCol).cast("double").as("v"))
    val mid = base.agg(((min(col("u")) + max(col("u"))) / 2).as("mid_us"))
    val binned = base.crossJoin(broadcast(mid))
      .select(col(key),
        least(floor(col("v") / binWidth), lit(9L)).as("bin"),
        when(col("u") <= col("mid_us"), 1L).otherwise(0L).as("early"))
    val counts = binned.groupBy(col(key), col("bin")).agg(
      sum(col("early")).as("ca"),
      sum(lit(1L) - col("early")).as("cb"))
    val totals = counts.groupBy(col(key)).agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    counts.join(totals, Seq(key))
      .withColumn("pa", col("ca").cast("double") / col("na"))
      .withColumn("pb", col("cb").cast("double") / col("nb"))
      .groupBy(col(key)).agg(
        count(lit(1)).as("n_bins"),
        sum(when(col("ca") === 0 || col("cb") === 0, 1L).otherwise(0L))
          .as("n_bins_skipped"),
        round(sum(when(col("ca") > 0 && col("cb") > 0,
          (col("pa") - col("pb")) * log(col("pa") / col("pb")))
          .otherwise(lit(0.0))), 6).as("psi"))
  }

  val p11PsiDrift: Q = (s, d) =>
    psiDriftFrames(Tables.events(s, d), "event_type", "ts", "value", 50.0)

  /** Snapshot-diff core over ANY two frames sharing key + compare columns:
    * FULL OUTER on the keys, presence markers decide added/removed, a
    * null-safe inequality OR over the compare set decides changed;
    * unchanged rows are dropped. ONE co-partitioned shuffle per side on
    * the key — the 100 TB table-diff shape (no window, no collect);
    * emitted volume is the churn, not the table. Exposed to the pipeline
    * registry as `snapshot_diff`. */
  private[graft] def snapshotDiffFrames(old: DataFrame, cur: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    val l = old.select(keys.map(col) ++ compare.map(c => col(c).as(s"l_$c")): _*)
      .withColumn("_l", lit(true))
    val r = cur.select(keys.map(col) ++ compare.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("_r", lit(true))
    val changed = compare.map(c => !(col(s"l_$c") <=> col(s"r_$c")))
      .reduce(_ || _)
    l.join(r, keys, "full_outer")
      .withColumn("change",
        when(col("_l").isNull, "added")
          .when(col("_r").isNull, "removed")
          .when(changed, "changed").otherwise("unchanged"))
      .where(col("change") =!= "unchanged")
      .drop("_l", "_r")
  }

  /** S15: snapshot diff — "what changed between yesterday's table and
    * today's" (added / removed / changed keys with both sides' values),
    * the audit query behind every CDC backfill review. The declared query
    * derives two deterministic snapshots of `orders` (disjoint modulus
    * drops + a binary-exact ×2 price correction on a third modulus) and
    * diffs them; money compares as cents-longs so 'changed' is
    * integer-exact in both engines. */
  val s15SnapshotDiff: Q = (s, d) => {
    val ord = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_orderstatus"), cents(col("o_totalprice")).as("price_cents"))
    val old = ord.where(col("o_orderkey") % 97 =!= 0)
    val cur = ord.where(col("o_orderkey") % 89 =!= 0)
      .withColumn("price_cents",
        when(col("o_orderkey") % 13 === 0, col("price_cents") * 2)
          .otherwise(col("price_cents")))
    snapshotDiffFrames(old, cur, Seq("o_orderkey"),
      Seq("o_orderstatus", "price_cents"))
  }

  /** J9: runtime bloom-filter–pruned join (the semi-join reduction the
    * reference's planner can't do at all). A selective dim-side filter
    * ('1-URGENT' keeps ~20% of orders) turns the fact-side scan mostly
    * wasted: Catalyst's InjectRuntimeFilter builds a bloom filter over the
    * surviving dim keys and pushes `might_contain(xxhash64(l_orderkey))`
    * into the fact scan, so non-matching fact rows die BEFORE the join
    * exchange — at 100 TB that's the difference between shuffling the
    * whole fact table and shuffling the ~matching fifth. Pruning is a
    * filter (false positives pass through to the exact join), so the
    * result is identical to the plain join — which is the oracle.
    *
    * The thresholds are size heuristics, not semantics: injection requires
    * an application side bigger than 10 GB by default, which a fixture
    * never is; production leaves the defaults alone. Broadcast is disabled
    * the same way — with a broadcast-able dim Spark correctly skips the
    * bloom (the broadcast hash set IS the perfect filter); forcing the
    * shuffle join recreates the 100 TB shape where the dim outgrows
    * broadcast. Both knobs live on an ISOLATED child session (same
    * SparkContext, own SQLConf) rather than set-then-restored on the
    * caller's: the caller executes the returned frame lazily, after a
    * restore would already have undone the conf, and a leaked
    * autoBroadcastJoinThreshold=-1 would wreck every later plan. */
  val j9BloomJoin: Q = (s, d) => {
    val iso = s.newSession()
    iso.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    iso.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(iso, d)
    val o = Tables.orders(iso, d).where(col("o_orderpriority") === "1-URGENT")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("price_sum"))
  }

  /** S8+J9: bucketed co-located join — both sides saved bucketed (8 buckets,
    * sorted) on the join key, so the join is a zero-shuffle sort-merge over
    * pre-aligned buckets. At 100 TB this is the difference between a
    * terabyte-scale exchange per join and none: bucket once on ingest, join
    * any number of times for free. Plan shape (no ShuffleExchange feeding
    * the join) is asserted in PlanSpec; the result equals the plain join. */
  /** Bucketed tables built at most once per (catalog, source dir) — the
    * real-world contract is "bucket once on ingest, join many times", so
    * the benched query should time the exchange-free JOIN, not re-ingest
    * (round-1 bench conflated both). The fixed-name tables live in the
    * CONTEXT-shared catalog (every `newSession()` sees them), so the cache
    * key is the warehouse dir, not the session — a session-keyed cache
    * would let one session's rebuild silently invalidate another's entry
    * (and would pin session objects as strong map keys). */
  private val bucketedFor = scala.collection.concurrent.TrieMap[String, String]()

  val s8BucketedJoin: Q = (s, d) => {
    val buckets = 8
    val wh = s.conf.get("spark.sql.warehouse.dir")
    // The fixed-name tables hold ONE source dir's data at a time: rebuild
    // whenever this catalog's tables were built from a different dir, from
    // the same dir whose FILES have since changed (the content fingerprint
    // in the key — stale bucketed data must not be served after an
    // in-place mutation), or when the catalog doesn't actually have them
    // (a restarted SparkContext reusing the same warehouse dir starts with
    // an empty in-memory catalog; the cache alone would then skip the
    // build and the join would fail TABLE_OR_VIEW_NOT_FOUND).
    val srcKey = s"$d#${graft.core.Fingerprint.of(Tables.path(d, "lineitem"))}" +
      s"#${graft.core.Fingerprint.of(Tables.path(d, "orders"))}"
    def cached: Boolean = bucketedFor.get(wh).contains(srcKey) &&
      s.catalog.tableExists("graft_bkt_lineitem") &&
      s.catalog.tableExists("graft_bkt_orders")
    if (!cached) bucketedFor.synchronized {
      if (!cached) {
      // idempotent re-create: a table dir left by a previous session isn't
      // in this session's catalog, and saveAsTable refuses the location
      def reset(table: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $table")
        val loc = java.nio.file.Paths.get(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
        if (java.nio.file.Files.exists(loc)) {
          // close the walk stream — it holds the directory fd until closed
          val walk = java.nio.file.Files.walk(loc)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.delete(p))
          finally walk.close()
        }
      }
      reset("graft_bkt_lineitem"); reset("graft_bkt_orders")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
        .write.mode("overwrite")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bkt_lineitem")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bkt_orders")
      bucketedFor.put(wh, srcKey)
      }
    }
    val li = s.table("graft_bkt_lineitem")
    val o = s.table("graft_bkt_orders")
    // merge hint: at small test scale AQE would broadcast instead; the point
    // of this operator is the exchange-free sort-merge path buckets enable
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("price_sum"))
  }

  val queries: Map[String, Q] = Map(
    "s1_parquet_scan" -> s1ParquetScan,
    "j8_salted_join" -> j8SaltedJoin,
    "s8_bucketed_join" -> s8BucketedJoin,
    "s2_csv_roundtrip" -> s2CsvRoundtrip,
    "s2b_orc_roundtrip" -> s2bOrcRoundtrip,
    "s3_json_roundtrip" -> s3JsonRoundtrip,
    "s4_inmemory_values" -> s4InMemory,
    "s5_parquet_sink" -> s5ParquetSink,
    "p1_project" -> p1Project,
    "p2_filter" -> p2Filter,
    "p3_case_when" -> p3CaseWhen,
    "p4_cast" -> p4Cast,
    "p5_nulls" -> p5Nulls,
    "p6_distinct" -> p6Distinct,
    "j1_revenue_by_nation" -> j1RevenueByNation,
    "j2_left_outer" -> j2LeftOuter,
    "j2b_full_outer" -> j2FullOuter,
    "j3_semi_anti" -> j3SemiAnti,
    "j4_cross" -> j4Cross,
    "j5_range_join" -> j5RangeJoin,
    "j6_broadcast" -> j6Broadcast,
    "j7_asof_join" -> j7AsOf,
    "j9_bloom_join" -> j9BloomJoin,
    "j10_time_band_join" -> j10TimeBandJoin,
    "j11_pit_join" -> j11PitJoin,
    "s16_scd2_history" -> s16Scd2History,
    "s12_schema_evolution" -> s12SchemaEvolution,
    "s13_merge_upsert" -> s13MergeUpsert,
    "s14_dynamic_overwrite" -> s14DynamicOverwrite,
    "s15_snapshot_diff" -> s15SnapshotDiff,
    "s17_incremental_agg" -> s17IncrementalAgg,
    "p7_profile" -> p7Profile,
    "p9_expectations" -> p9Expectations,
    "p10_freshness" -> p10Freshness,
    "p11_psi_drift" -> p11PsiDrift,
    "p8_skew_report" -> p8SkewReport
  )

  val oracle: Map[String, String] = Map(
    "p11_psi_drift" ->
      """WITH base AS (SELECT event_type, epoch_us(ts) AS u, value AS v
                       FROM events),
            mid AS (SELECT (min(u) + max(u)) // 2 AS mid_us FROM base),
            binned AS (SELECT event_type,
                              least(CAST(floor(v / 50.0) AS BIGINT), 9) AS bin,
                              CASE WHEN u <= mid_us THEN 1 ELSE 0 END AS early
                       FROM base CROSS JOIN mid),
            counts AS (SELECT event_type, bin,
                              CAST(sum(early) AS BIGINT) AS ca,
                              CAST(sum(1 - early) AS BIGINT) AS cb
                       FROM binned GROUP BY 1, 2),
            totals AS (SELECT event_type,
                              CAST(sum(ca) AS BIGINT) AS na,
                              CAST(sum(cb) AS BIGINT) AS nb
                       FROM counts GROUP BY 1)
         SELECT c.event_type,
                CAST(count(*) AS BIGINT) AS n_bins,
                CAST(sum(CASE WHEN ca = 0 OR cb = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_bins_skipped,
                round(sum(CASE WHEN ca > 0 AND cb > 0
                          THEN (ca * 1.0 / na - cb * 1.0 / nb)
                               * ln((ca * 1.0 / na) / (cb * 1.0 / nb))
                          ELSE 0.0 END), 6) AS psi
         FROM counts c JOIN totals t ON c.event_type = t.event_type
         GROUP BY 1""",
    "p9_expectations" ->
      """WITH a AS (SELECT count(*) AS n,
                           sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_key,
                           count(DISTINCT o_orderkey) AS nd_key,
                           sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
                           sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status
                    FROM orders),
            fk AS (SELECT count(*) AS n_orphan FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey)),
            v AS (SELECT 'not_null:o_orderkey' AS check_name, CAST(null_key AS BIGINT) AS n_violations FROM a
                  UNION ALL SELECT 'unique:o_orderkey', CAST(n - nd_key AS BIGINT) FROM a
                  UNION ALL SELECT 'range:o_totalprice>0', CAST(bad_price AS BIGINT) FROM a
                  UNION ALL SELECT 'accepted:o_orderstatus', CAST(bad_status AS BIGINT) FROM a
                  UNION ALL SELECT 'fk:o_custkey->customer', CAST(n_orphan AS BIGINT) FROM fk)
         SELECT check_name, n_violations, n_violations = 0 AS passed FROM v""",
    "p10_freshness" ->
      """WITH b AS (SELECT event_type, epoch_us(ts) AS u,
                           epoch_us(ts) // 3600000000 AS h FROM events),
            st AS (SELECT event_type, count(*) AS n_events, min(u) AS first_us,
                          max(u) AS last_us, min(h) AS h0, max(h) AS h1
                   FROM b GROUP BY 1),
            act AS (SELECT event_type, count(*) AS active_hours
                    FROM (SELECT DISTINCT event_type, h FROM b) GROUP BY 1),
            corp AS (SELECT max(h) AS corpus_h FROM b)
         SELECT st.event_type, CAST(n_events AS BIGINT) AS n_events,
                first_us, last_us,
                CAST(h1 - h0 + 1 AS BIGINT) AS span_hours,
                CAST(active_hours AS BIGINT) AS active_hours,
                round(active_hours * 1.0 / (h1 - h0 + 1), 6) AS completeness,
                CAST(corpus_h - h1 AS BIGINT) AS staleness_hours
         FROM st JOIN act USING (event_type) CROSS JOIN corp""",
    // oracle is the FULL recompute — the refresh must land exactly where
    // a from-scratch aggregation lands, whatever the history/delta split
    "s17_incremental_agg" ->
      """SELECT o_orderstatus,
                epoch_us(date_trunc('month', o_orderdate)) AS month_us,
                count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY 1, 2""",
    "j10_time_band_join" ->
      """SELECT p.event_id,
                CAST(coalesce((SELECT count(*) FROM events e
                  WHERE e.event_type = 'error'
                    AND epoch_us(e.ts) >= epoch_us(p.ts) - 60000000
                    AND epoch_us(e.ts) < epoch_us(p.ts)), 0) AS BIGINT)
                  AS n_errors_60s
         FROM events p WHERE p.event_type = 'purchase'""",
    "j11_pit_join" ->
      """WITH seq AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  o_orderpriority AS priority,
                  lag(o_orderpriority) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                    AS prev
           FROM orders),
         chg AS (
           SELECT o_custkey, o_orderkey, o_orderdate, priority FROM seq
           WHERE prev IS NULL OR prev <> priority),
         hist AS (
           SELECT o_custkey, priority,
                  CAST(epoch(o_orderdate) AS BIGINT) AS valid_from,
                  CAST(epoch(lead(o_orderdate) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
                    AS BIGINT) AS valid_to
           FROM chg)
         SELECT h.priority, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM orders o JOIN hist h ON o.o_custkey = h.o_custkey
         WHERE h.valid_from <= epoch(o.o_orderdate)
           AND (h.valid_to IS NULL OR epoch(o.o_orderdate) < h.valid_to)
         GROUP BY 1""",
    "s16_scd2_history" ->
      """WITH seq AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  o_orderpriority AS priority,
                  lag(o_orderpriority) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                    AS prev
           FROM orders),
         chg AS (
           SELECT o_custkey, o_orderkey, o_orderdate, priority FROM seq
           WHERE prev IS NULL OR prev <> priority)
         SELECT o_custkey, priority,
                CAST(epoch(o_orderdate) AS BIGINT) AS valid_from,
                CAST(epoch(lead(o_orderdate) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
                  AS BIGINT) AS valid_to,
                (lead(o_orderdate) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
                  IS NULL AS is_current
         FROM chg""",
    "p8_skew_report" ->
      """WITH per AS (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1)
         SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                count(*) AS n_keys,
                max(cnt) AS max_cnt,
                CAST(quantile_cont(cnt, 0.5) AS DOUBLE) AS p50_cnt,
                CAST(quantile_cont(cnt, 0.9) AS DOUBLE) AS p90_cnt,
                CAST(quantile_cont(cnt, 0.99) AS DOUBLE) AS p99_cnt
         FROM per""",
    "p7_profile" ->
      """SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
                count(*) - count(c_custkey) AS n_null,
                count(DISTINCT c_custkey) AS n_distinct,
                CAST(min(c_custkey) AS VARCHAR) AS min_s,
                CAST(max(c_custkey) AS VARCHAR) AS max_s FROM customer
         UNION ALL
         SELECT 'c_name', count(*), count(*) - count(c_name),
                count(DISTINCT c_name),
                CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR)
         FROM customer
         UNION ALL
         SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
                count(DISTINCT c_nationkey),
                CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
         FROM customer
         UNION ALL
         SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
                count(DISTINCT c_acctbal),
                CAST(CAST(round(min(c_acctbal) * 100) AS BIGINT) AS VARCHAR),
                CAST(CAST(round(max(c_acctbal) * 100) AS BIGINT) AS VARCHAR)
         FROM customer
         UNION ALL
         SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
                count(DISTINCT c_mktsegment),
                CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR)
         FROM customer""",
    "s15_snapshot_diff" ->
      """WITH ord AS (SELECT o_orderkey, o_orderstatus,
                             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
                      FROM orders),
            o AS (SELECT * FROM ord WHERE o_orderkey % 97 <> 0),
            n AS (SELECT o_orderkey, o_orderstatus,
                         CASE WHEN o_orderkey % 13 = 0 THEN price_cents * 2
                              ELSE price_cents END AS price_cents
                  FROM ord WHERE o_orderkey % 89 <> 0)
         SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                o.o_orderstatus AS l_o_orderstatus,
                n.o_orderstatus AS r_o_orderstatus,
                o.price_cents AS l_price_cents,
                n.price_cents AS r_price_cents,
                CASE WHEN o.o_orderkey IS NULL THEN 'added'
                     WHEN n.o_orderkey IS NULL THEN 'removed'
                     ELSE 'changed' END AS change
         FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
         WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
            OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
            OR o.price_cents IS DISTINCT FROM n.price_cents""",
    "s13_merge_upsert" ->
      """WITH merged AS (
           SELECT CASE WHEN o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
                       THEN 'U' ELSE o_orderstatus END AS st,
                  CASE WHEN o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
                       THEN o_totalprice * 2.0 ELSE o_totalprice END AS pr
           FROM orders WHERE o_orderkey % 17 <> 0
           UNION ALL
           SELECT 'N' AS st, 100.0 AS pr FROM orders WHERE o_orderkey % 29 = 0)
         SELECT st AS o_orderstatus, count(*) AS n_orders,
                CAST(sum(CAST(pr AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM merged GROUP BY 1""",
    "s14_dynamic_overwrite" ->
      """SELECT event_type, count(*) AS n_events,
                CAST(sum(CASE WHEN event_type = 'click'
                              THEN value * 2.0 ELSE value END) AS DOUBLE) AS value_sum
         FROM events
         WHERE event_type <> 'click' OR value > 0
         GROUP BY event_type""",
    "s12_schema_evolution" ->
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment END AS c_mktsegment,
                count(*) AS n,
                count(CASE WHEN c_custkey % 2 = 1 THEN c_acctbal END) AS n_with_bal,
                coalesce(CAST(sum(CASE WHEN c_custkey % 2 = 1
                  THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS bal_sum
         FROM customer GROUP BY 1""",
    "j9_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1""",
    "j8_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "s8_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "s1_parquet_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 45 AND l_returnflag = 'R'""",
    "s2_csv_roundtrip" ->
      """SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
         FROM nation GROUP BY 1""",
    "s2b_orc_roundtrip" ->
      """SELECT c_nationkey, count(*) AS n_customers,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM customer GROUP BY 1""",
    "s3_json_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM customer GROUP BY 1""",
    "s4_inmemory_values" ->
      """SELECT prio_rank, count(*) AS n_orders
         FROM orders JOIN (VALUES ('1-URGENT',1),('2-HIGH',2),('3-MEDIUM',3),
              ('4-NOT SPECIFIED',4),('5-LOW',5)) AS p(prio_name, prio_rank)
           ON o_orderpriority = prio_name
         GROUP BY 1""",
    "s5_parquet_sink" ->
      """SELECT l_returnflag, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM lineitem WHERE l_quantity > 25 GROUP BY 1""",
    "p1_project" ->
      """SELECT c_custkey AS id, upper(c_name) AS name_upper,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
                c_mktsegment
         FROM customer""",
    "p2_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice BETWEEN 1000 AND 200000
           AND o_orderstatus IN ('O','F')
           AND o_orderpriority LIKE '%URGENT%'
           AND NOT (o_custkey = 7)
           AND (o_orderkey % 2 = 0 OR o_totalprice > 150000)""",
    "p3_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                     WHEN o_totalprice < 150000 THEN 'mid'
                     ELSE 'high' END AS price_band,
                o_orderstatus, count(*) AS n_orders
         FROM orders GROUP BY 1, 2""",
    "p4_cast" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(trunc(l_quantity) AS INT) AS qty_int,
                CAST(l_quantity AS VARCHAR) AS qty_str,
                CAST(l_linenumber AS DOUBLE) AS line_dbl,
                CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day
         FROM lineitem WHERE l_orderkey <= 100""",
    "p5_nulls" ->
      """SELECT coalesce(CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END, 'NA') AS seg_or_na,
                count(*) AS n,
                CAST(sum(CAST(coalesce(CASE WHEN c_acctbal > 0 THEN c_acctbal END, -1.0)
                     AS DECIMAL(18,2))) AS DOUBLE) AS bal_filled
         FROM customer GROUP BY 1""",
    "p6_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "j1_revenue_by_nation" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY 1, 2""",
    "j2_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1""",
    "j2b_full_outer" ->
      """SELECT coalesce(b.k, r.k) AS k,
                coalesce(b.big_orders, 0) AS big_orders,
                coalesce(CAST(CAST(r.c_acctbal AS DECIMAL(18,2)) AS DOUBLE), -1.0) AS bal
         FROM (SELECT o_custkey AS k, count(*) AS big_orders FROM orders
               WHERE o_totalprice > 180000 GROUP BY 1) b
         FULL OUTER JOIN (SELECT c_custkey AS k, c_acctbal FROM customer
               WHERE c_acctbal > 4000) r
           ON b.k = r.k""",
    "j3_semi_anti" ->
      """SELECT c_nationkey,
                count(*) FILTER (WHERE has_o) AS with_orders,
                count(*) FILTER (WHERE NOT has_o) AS without_orders
         FROM (SELECT c_nationkey,
                      EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
               FROM customer)
         GROUP BY 1
         HAVING count(*) FILTER (WHERE has_o) > 0
             OR count(*) FILTER (WHERE NOT has_o) > 0""",
    "j4_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "j5_range_join" ->
      """SELECT l_returnflag, count(*) AS n_shipped_after,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM lineitem JOIN orders
           ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
         GROUP BY 1""",
    "j6_broadcast" ->
      """SELECT p_brand, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1""",
    "j7_asof_join" ->
      """SELECT p.event_id, p.user_id,
                CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_sec,
                CAST(floor(epoch(s.ts)) AS BIGINT) AS signup_sec
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.ts"""
  )
}
