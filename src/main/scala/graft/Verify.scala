package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=l45_prefix_join,e14_pattern_match — local
    // iteration on a subset (mirrors Bench's SPARK_GRAFT_BENCH_ONLY).
    // Unset (the driver's mode) dumps everything; the manifest and oracle
    // json shrink with the subset so tools/check.py checks exactly it.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(ks =>
      SparkEntry.queries.filter(kv => ks(kv._1)))
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // never let a crashed query vanish from the correctness report
        // (round-7 lesson): dump a one-row error marker so the driver's
        // compare still runs and records a schema/hash mismatch for it
        try {
          import spark.implicits._
          Seq(("__QUERY_FAILED__", String.valueOf(e.getMessage).take(500)))
            .toDF("__error", "__message").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
      // sequential harness = quiescent point; don't let one query's
      // checkpoint blocks degrade the next hundred (see core.Caches)
      graft.core.Caches.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full declared-query manifest: lets the checker FAIL queries whose
    // result dir is missing (crashed above) instead of silently skipping
    Files.writeString(Paths.get(s"$outDir/queries.txt"),
      selected.keys.toSeq.sorted.mkString("\n"))
    spark.stop()
  }
}
