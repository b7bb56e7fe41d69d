package graft

import org.apache.spark.sql.functions._

/** Runtime re-planning evidence (the "AQE for runtime re-plan" posture):
  * these pin that the session tuning actually leaves AQE in a state where
  * (a) small post-shuffle outputs coalesce below the static partition
  * count and (b) a genuinely skewed sort-merge join is split at runtime.
  * Both are invisible in correctness results — only the executed plan
  * shows whether the engine re-planned or dragged 32 near-empty tasks /
  * one monster task through the stage. */
class AqeSpec extends SparkSpec {

  test("AQE coalesces post-shuffle partitions for small aggregations") {
    val df = graft.ops.Aggregates.g1Basic(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead coalesced"),
      s"no coalesced shuffle read in:\n${plan.take(2000)}")
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // thresholds scaled to test data (defaults are 256 MB-class); broadcast
    // disabled so the join stays sort-merge — the shape skew splitting
    // applies to
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // half of all left rows land on key 0 — one shuffle partition far
      // past threshold x factor while the median stays tiny
      val left = spark.range(300000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id" % 997L).as("k"),
          $"id".as("payload"))
      val right = spark.range(997).select($"id".as("k"), ($"id" * 2).as("r"))
      val joined = left.join(right, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"skewed join was not split at runtime:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
