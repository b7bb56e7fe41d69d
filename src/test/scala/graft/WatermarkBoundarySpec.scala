package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins Spark's exact watermark/window boundary behavior with a crafted
  * fixture where max(ts) lands EXACTLY on an hour boundary — the case the
  * synthetic events never exercise (sub-second jitter). This is the
  * deterministic-replay contract SURVEY §5.2 requires for T4: append mode
  * emits a window iff watermark > window.end? or >= ? — whatever this test
  * records IS the engine's semantics, and the oracle encoding must agree. */
class WatermarkBoundarySpec extends SparkSpec {

  test("append-mode window emission at an exact watermark == window.end boundary") {
    import spark.implicits._
    // events at 00:30, 01:30, and exactly 04:00. Watermark delay 2h.
    // max ts = 04:00 -> watermark 02:00. Window [0:00,1:00) ends 1:00 < 2:00
    // -> emits. Window [1:00,2:00) ends exactly 2:00 == watermark —
    // measured: Spark 4.1 EMITS at equality (eviction predicate is
    // watermark >= window.end, inclusive), which is exactly the t4 oracle's
    // `win_start + 3600 <= watermark`. Window [4:00,5:00) is open -> held.
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:30:00")),
      (2L, Timestamp.valueOf("2024-01-01 01:30:00")),
      (3L, Timestamp.valueOf("2024-01-01 04:00:00")))
    val dir = graft.core.TempDirs.scratch("wm_boundary").resolve("data")
    rows.toDF("event_id", "ts").write.parquet(dir.toString)

    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP")
      .parquet(dir.toString)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))

    val ckpt = graft.core.TempDirs.scratch("wm_ckpt").toString
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("wm_boundary_sink").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emitted = spark.table("wm_boundary_sink")
      .select(unix_timestamp(col("window.start")).as("start"))
      .collect().map(_.getLong(0)).toSet
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val h1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime / 1000
    val h4 = Timestamp.valueOf("2024-01-01 04:00:00").getTime / 1000
    assert(emitted.contains(h0), "window fully below watermark must emit")
    assert(emitted.contains(h1),
      "window.end == watermark emits (inclusive eviction) — t4's oracle " +
        "HAVING <= encodes this; if this ever flips to exclusive, change it to <")
    assert(!emitted.contains(h4), "open window must be held back")
  }
}
