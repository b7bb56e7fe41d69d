package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.StreamingOps

/** B10 batch-equivalence (SURVEY.md §5.2.2): each streaming query, replayed
  * to completion with AvailableNow, must equal its batch twin computed in
  * the same session (the DuckDB side of the same contract is checked by the
  * driver's oracle). */
class StreamingSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Set[Seq[String]] =
    df.collect().toSet.map { r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => String.valueOf(r.get(i)))
    }

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    val g = rowsOf(got.select(want.columns.map(col).toIndexedSeq: _*))
    val w = rowsOf(want)
    assert(g == w,
      s"streaming != batch; only-streaming=${(g -- w).take(3)} only-batch=${(w -- g).take(3)}")
  }

  private lazy val events = Tables.events(spark, sfDir)

  test("t1 tumbling window equals batch epoch-bucketing") {
    val got = StreamingOps.t1Tumbling(spark, sfDir)
    val want = events.groupBy(
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
    assertSameRows(got, want)
  }

  test("t5 streaming dedup equals batch distinct") {
    val got = StreamingOps.t5Dedup(spark, sfDir)
    val want = events.select(col("user_id"), col("event_type")).distinct()
    assertSameRows(got, want)
  }

  test("t6 stateful summary equals batch per-user aggregate") {
    val got = StreamingOps.t6Stateful(spark, sfDir)
      .select(col("user_id"), col("n_events"), col("total_value"), col("last_type"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = events
      .withColumn("rk", row_number().over(w))
      .withColumn("last_type", first(when(col("rk") === 1, col("event_type")),
        ignoreNulls = true).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("user_id"), col("last_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .select(col("user_id"), col("n_events"), col("total_value"), col("last_type"))
    assertSameRows(got, want)
  }

  test("t7 stream-static join equals batch join") {
    val got = StreamingOps.t7StreamStaticJoin(spark, sfDir)
    val want = events.join(
        Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
    assertSameRows(got, want)
  }

  test("t4 watermark append emits only finalized windows") {
    val got = StreamingOps.t4WatermarkAppend(spark, sfDir)
    val maxTs = events.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val starts = got.select(col("win_start")).collect().map(_.getLong(0))
    assert(starts.nonEmpty)
    assert(starts.forall(_ + 3600 <= maxTs - 7200),
      "append emitted a window not finalized by the watermark")
  }

  test("t3 session windows cover all events with positive counts") {
    val got = StreamingOps.t3Session(spark, sfDir)
    val totalEvents = events.count()
    val sessSum = got.agg(sum(col("n_events"))).head().getLong(0)
    assert(sessSum == totalEvents, s"sessions cover $sessSum of $totalEvents events")
  }

  test("t2 sliding windows count each event twice") {
    val got = StreamingOps.t2Sliding(spark, sfDir)
    val n = got.agg(sum(col("n"))).head().getLong(0)
    assert(n == 2 * events.count())
  }

  test("t8 file sink round-trips purchases") {
    val got = StreamingOps.t8FileSink(spark, sfDir)
    val purchases = events.where(col("event_type") === "purchase")
    assert(got.agg(sum(col("n_purchases"))).head().getLong(0) == purchases.count())
  }

  test("t11 doc ingest drops injected exact duplicates before the gate and rollup") {
    // the shipped fixture has no exact-text duplicates, so the declared
    // query's dropDuplicates is form; this pins the SEMANTICS by staging a
    // corpus where 40 docs arrive twice (same text, fresh doc_id, a
    // different source) and asserting the cross-source totals match the
    // batch twin computed over DISTINCT texts. Per-source rows are not
    // asserted for the duplicated texts — which copy survives a same-batch
    // tie is partition order, not a contract.
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val dups = docs.orderBy(col("doc_id")).limit(40)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("source", lit("replay_feed"))
    val fixture = graft.core.TempDirs.scratch("t11_dup_fixture")
    val tmp = graft.core.TempDirs.scratch("t11_dup_write")
    docs.unionByName(dups).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, fixture.resolve("documents.parquet"))

    val got = StreamingOps.t11DocIngest(spark, fixture.toString)
    val (gotDocs, gotTokens) = {
      val r = got.agg(sum(col("n_docs")), sum(col("total_tokens"))).head()
      (r.getLong(0), r.getLong(1))
    }
    // batch twin: one representative per distinct text (token count and
    // quality are functions of the text, so the totals are survivor-free)
    val want = docs // every duplicated text already exists in `docs`
      .withColumn("quality", StreamingOps.docQuality(col("text")))
      .where(col("quality") >= 0.4)
      .agg(count(lit(1)).as("n"),
        sum(size(split(col("text"), " ")).cast("long")).as("tok")).head()
    assert(gotDocs == want.getLong(0),
      s"deduped doc count $gotDocs != batch distinct-text count ${want.getLong(0)}")
    assert(gotTokens == want.getLong(1),
      s"deduped token total $gotTokens != batch ${want.getLong(1)}")
  }

  test("t12 streaming CDC apply over a FORCED 2-batch split equals the one-shot merge") {
    // split the change feed into two parquet files and cap the trigger at
    // one file per micro-batch: the apply loop must land exactly where
    // s13's single merge lands, proving batch-boundary independence
    val stage = graft.core.TempDirs.scratch("t12_split")
    val o = Tables.orders(spark, sfDir)
    o.where(col("o_orderkey") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/even")
    o.where(col("o_orderkey") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/odd")
    import scala.jdk.CollectionConverters._
    val files = Seq(s"$stage/even", s"$stage/odd").flatMap { dir =>
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
    }
    assert(files.size == 2, files.toString)
    val changes = StreamingOps.ordersStream(spark, sfDir,
      extraFiles = files, maxFilesPerTrigger = Some(1))
    val got = StreamingOps.t12Upsert(changes, spark, sfDir)
    val want = graft.ops.Relational.s13MergeUpsert(spark, sfDir)
    assertSameRows(got, want)
  }

  test("t15 streaming topk over a FORCED 2-batch split equals the batch top-3") {
    // the sketch buffer must survive state-store serialize between
    // micro-batches and merge the second batch into the first's state —
    // the contract that makes bounded streaming top-k correct at all
    val stage = graft.core.TempDirs.scratch("t15_split")
    val ev = Tables.events(spark, sfDir)
    ev.where(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/even")
    ev.where(col("event_id") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/odd")
    import scala.jdk.CollectionConverters._
    val files = Seq(s"$stage/even", s"$stage/odd").flatMap { dir =>
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
    }
    val stageDir = graft.core.TempDirs.scratch("t15_stream")
    files.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.createSymbolicLink(
        stageDir.resolve(f"b$i%03d.parquet"), p.toAbsolutePath)
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(stageDir.toString)
    val got = StreamingOps.t15TopkOver(stream, "t15_split_sink")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val want = ev.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("event_type"), col("event_id"), col("value"), col("rn"))
    assertSameRows(got, want)
  }

  test("t16 streaming pattern DFA resumes mid-run across a TIME-split batch boundary") {
    // split BY EVENT TIME (the CEP in-order-replay assumption): a user
    // whose v[vc]*p run straddles the boundary exercises exactly the
    // state the DFA must carry — batch 1 ends inside a run (dfa=1),
    // batch 2 must complete it from GroupState, not from scratch
    val stage = graft.core.TempDirs.scratch("t16_split")
    val ev = Tables.events(spark, sfDir)
    val mid = ev.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / 2)
        .cast("long")).head().getLong(0)
    ev.where(unix_micros(col("ts")) <= mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/early")
    ev.where(unix_micros(col("ts")) > mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/late")
    import scala.jdk.CollectionConverters._
    val files = Seq(s"$stage/early", s"$stage/late").flatMap { dir =>
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
    }
    val stageDir = graft.core.TempDirs.scratch("t16_stream")
    files.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.createSymbolicLink(
        stageDir.resolve(f"b$i%03d.parquet"), p.toAbsolutePath)
      // FileStreamSource orders batches by modification time; the two
      // staged writes land milliseconds apart, so an mtime TIE could
      // replay b001 (late events) before b000 and break the mid-run DFA
      // resume this test exists to exercise. Pin strictly increasing
      // mtimes on the targets (setLastModifiedTime follows the symlink).
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 60000 + i * 10000L))
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(stageDir.toString)
    val got = StreamingOps.t16PatternOver(stream, "t16_split_sink")
    val want = graft.ops.EventOps.queries("e14_pattern_match")(spark, sfDir)
      .select(col("user_id"), col("n_matches").cast("long"))
    assertSameRows(got, want)
  }

  test("t13 quarantine gate over a FORCED 2-batch split equals the one-pass routing") {
    val stage = graft.core.TempDirs.scratch("t13_split")
    val o = Tables.orders(spark, sfDir)
    o.where(col("o_orderkey") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/even")
    o.where(col("o_orderkey") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/odd")
    import scala.jdk.CollectionConverters._
    val files = Seq(s"$stage/even", s"$stage/odd").flatMap { dir =>
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
    }
    assert(files.size == 2, files.toString)
    val split = StreamingOps.t13Quarantine(
      StreamingOps.ordersStream(spark, sfDir,
        extraFiles = files, maxFilesPerTrigger = Some(1)), spark, sfDir)
    val onePass = StreamingOps.t13Quarantine(
      StreamingOps.ordersStream(spark, sfDir), spark, sfDir)
    assertSameRows(split, onePass)
    // the gate must actually quarantine the injected corruption
    val routes = onePass.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(routes.contains(("quarantine", "range:o_totalprice")), routes.toString)
    assert(routes.contains(("quarantine", "accepted:o_orderstatus")), routes.toString)
    assert(routes.contains(("main", "ok")), routes.toString)
  }

  test("t10 foreachBatch ingest lands batch-stamped rows matching the batch twin") {
    val (got, landingDir) = StreamingOps.t10Ingest(spark, sfDir)
    val purchases = events.where(col("event_type") === "purchase")
    assert(got.agg(sum(col("n_purchases"))).head().getLong(0) == purchases.count())
    // every landed row carries the micro-batch provenance stamp (the
    // streaming analogue of the pipeline lineage column)
    val landed = spark.read.parquet(landingDir)
    assert(landed.columns.contains("_ingest_batch"))
    assert(landed.where(col("_ingest_batch").isNull).count() == 0)
    assert(landed.count() == purchases.count())
  }

  test("t17 freshness: two CONCURRENT replays equal the batch twin (r21)") {
    // r21 starts t17's two independent streams together (runAllToMemory,
    // guide §2.6 back-fill) instead of sequentially — this pins that the
    // concurrent form computes the identical table and that BOTH queries'
    // state metrics were still captured through the shared listener
    val got = StreamingOps.t17StreamFreshness(spark, sfDir)
    val hourUs = 3600L * 1000000L
    val base = events.select(col("event_type"), unix_micros(col("ts")).as("u"))
      .withColumn("h", floor(col("u") / hourUs))
    val agg = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("u")).as("first_us"), max(col("u")).as("last_us"),
        min(col("h")).as("h0"), max(col("h")).as("h1"))
    val hours = base.select(col("event_type"), col("h")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("active_hours"))
    val joined = agg.join(hours, Seq("event_type"))
    val corpus = joined.agg(max(col("h1")).as("corpus_h"))
    val want = joined.crossJoin(broadcast(corpus))
      .select(col("event_type"), col("n_events"), col("first_us"),
        col("last_us"), (col("h1") - col("h0") + 1).as("span_hours"),
        col("active_hours"),
        round(col("active_hours").cast("double") / (col("h1") - col("h0") + 1), 6)
          .as("completeness"),
        (col("corpus_h") - col("h1")).as("staleness_hours"))
    assertSameRows(got, want)
    assert(StreamingOps.stateMetrics.contains("t17_sink"),
      "main aggregate's state metrics missing after the concurrent run")
    assert(StreamingOps.stateMetrics.contains("t17_hours_sink"),
      "hours query's state metrics missing after the concurrent run")
  }
}
