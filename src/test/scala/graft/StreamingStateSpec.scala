package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-BOUND assertions for the two priciest streaming shapes (VERDICT
  * r5 #7): session windows (t3's operator) and the stream-stream interval
  * join (t9). The 100×-scale risk is state that grows with HISTORY instead
  * of with the watermark horizon — invisible in a single-batch replay,
  * where everything arrives before the watermark ever advances. So these
  * tests replay the events fixture as TIME-ORDERED chunk files, one file
  * per micro-batch (`maxFilesPerTrigger=1`), letting the watermark advance
  * and evict between batches, then read
  * `StreamingQueryProgress.stateOperators` and assert rows were removed
  * and the per-batch state peak stays a fraction of total history. */
class StreamingStateSpec extends SparkSpec {

  /** Events staged as `chunks` parquet files in ascending time order with
    * ascending modification times (the file source's processing order). */
  private def stageChunks(chunks: Int): (String, Long) = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables.events(spark, sfDir)
    val total = ev.count()
    val stage = graft.core.TempDirs.scratch("state_chunks")
    val chunked = ev
      .withColumn("chunk", ntile(chunks).over(Window.orderBy(col("ts"))))
    for (i <- 1 to chunks) {
      val tmp = graft.core.TempDirs.scratch(s"state_chunk_$i")
      chunked.where(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = stage.resolve(f"chunk_$i%03d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    (stage.toString, total)
  }

  private def chunkStream(stage: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)

  /** Run to completion in append mode; return (result rows, progresses). */
  private def runAppend(df: DataFrame, name: String)
      : (Long, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    val q = df.writeStream
      .outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", graft.core.TempDirs.scratch(s"ckpt_$name").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (spark.table(name).count(), q.recentProgress.toSeq)
  }

  private def statTotals(ps: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) =
    ps.flatMap(_.stateOperators.map(_.numRowsTotal))
  private def statRemoved(ps: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) =
    ps.flatMap(_.stateOperators.map(_.numRowsRemoved))

  test("session windows under watermark: state evicts across micro-batches, peak stays bounded") {
    val (stage, _) = stageChunks(8)
    val agg = chunkStream(stage)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val (outRows, ps) = runAppend(agg, "t3_state_sink")
    assert(outRows > 0)
    assert(ps.count(_.numInputRows > 0) >= 4, s"expected multi-batch replay, got ${ps.size} progresses")
    val totals = statTotals(ps)
    val removed = statRemoved(ps).sum
    info(s"t3-shape sessions: out=$outRows, state peaks=${totals.max}, removed=$removed")
    // eviction must actually happen under the watermark...
    assert(removed > 0, "watermark never evicted session state across batches")
    // ...and the live-state peak must be a fraction of all sessions ever
    // emitted — state ~ watermark horizon, not ~ history
    assert(totals.max < outRows,
      s"state peak ${totals.max} not bounded vs $outRows total sessions")
  }

  test("dedup within watermark: key state evicts instead of growing with history") {
    // plain dropDuplicates keeps every key seen FOREVER (state ~ distinct
    // history — the unbounded-state trap t5 documents); the
    // WithinWatermark variant is the production form whose state is
    // bounded by the horizon. Replay chunked so the watermark advances
    // and eviction is observable.
    val (stage, totalEvents) = stageChunks(8)
    val dedup = chunkStream(stage)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
    val (outRows, ps) = runAppend(dedup, "t5_state_wm")
    assert(outRows > 0)
    assert(ps.count(_.numInputRows > 0) >= 4, s"expected multi-batch replay, got ${ps.size} progresses")
    val removed = statRemoved(ps).sum
    val totals = statTotals(ps)
    info(s"dedup-within-watermark: out=$outRows, events=$totalEvents, state peak=${totals.max}, removed=$removed")
    assert(removed > 0, "watermark never evicted dedup key state")
    assert(totals.max < totalEvents,
      s"dedup state peak ${totals.max} not bounded vs $totalEvents events seen")
  }

  test("session windows run identically on the RocksDB state store (off-heap scale path)") {
    // HDFSBackedStateStoreProvider (the default) keeps live state in
    // executor HEAP — the genuine 100 TB streaming bottleneck. Spark ships
    // RocksDBStateStoreProvider (off-heap, spill-to-disk) as the scale
    // posture; this pins that every stateful shape can run on it
    // bit-identically, so flipping the conf in production is a no-risk
    // change. The provider is sticky per checkpoint, so each run here uses
    // a fresh checkpoint dir (runAppend always does).
    val (stage, _) = stageChunks(8)
    def agg = chunkStream(stage)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val (defRows, _) = runAppend(agg, "t3_state_default_prov")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (rocksRows, ps) =
      try runAppend(agg, "t3_state_rocksdb")
      finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    assert(rocksRows == defRows, s"RocksDB run: $rocksRows rows vs default $defRows")
    assert(statRemoved(ps).sum > 0, "watermark eviction must work on RocksDB too")
    val a = spark.table("t3_state_default_prov").collect().map(_.toString).sorted
    val b = spark.table("t3_state_rocksdb").collect().map(_.toString).sorted
    assert(a.sameElements(b), "RocksDB and default state stores must agree row-for-row")
  }

  test("stream-stream interval join: both state stores evict, peak stays bounded") {
    val (stage, totalEvents) = stageChunks(8)
    val ev = chunkStream(stage)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val joined = purchases.join(signups,
      col("p_user") === col("s_user") &&
      col("s_ts") <= col("p_ts") &&
      col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
    val (outRows, ps) = runAppend(joined, "t9_state_sink")
    assert(outRows > 0)
    assert(ps.count(_.numInputRows > 0) >= 4, s"expected multi-batch replay, got ${ps.size} progresses")
    val totals = statTotals(ps)
    val removed = statRemoved(ps).sum
    info(s"t9-shape join: out=$outRows, events=$totalEvents, state peaks=${totals.max}, removed=$removed")
    assert(removed > 0, "watermarks never evicted join state across batches")
    // join state holds both sides' rows inside the watermark horizon; it
    // must never approach ALL events seen so far
    assert(totals.max < totalEvents,
      s"join state peak ${totals.max} not bounded vs $totalEvents events")
  }
}
