package graft.core

import org.apache.spark.sql.SparkSession

/** One place for engine session tuning so Verify / Bench / tests agree.
  *
  * Cluster-scale posture: AQE on (runtime shuffle-partition coalescing,
  * skew-join splitting, dynamic broadcast), UTC session time, shuffle
  * partition count sized to the parallelism of the target (32 for the
  * local[32] harness; on a 1000-executor cluster this would be set to
  * ~2-3× total cores by conf, not code).
  */
object Sessions {
  def tune(b: SparkSession.Builder, cpus: String): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // events.parquet carries TIMESTAMP(NANOS); read as long, normalized in Tables.events
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", 32 * 1024 * 1024)
    // absolute PER-PROCESS warehouse path: saveAsTable (bucketed tables)
    // must not depend on the launcher's cwd being writable, and two JVMs
    // sharing one dir would delete each other's fixed-name tables
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_${ProcessHandle.current().pid()}")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cpus]").appName("yukispark"), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
