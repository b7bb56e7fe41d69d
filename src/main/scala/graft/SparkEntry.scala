package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared operator inventory (SURVEY.md §2 Part B): each
  * entry in [[queries]] is one operator exercised end-to-end against the
  * fixture tables in the given sf directory; [[oracleSql]] carries the DuckDB
  * twin the driver checks hashes against.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.j1RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ Windows.queries ++
      SortsSets.queries ++ Functions.queries ++ TextOps.queries ++
      VectorOps.queries ++ MultiModal.queries ++ StreamingOps.queries ++
      EventOps.queries ++ Layout.queries ++ Graphs.queries ++ TpcH.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Aggregates.oracle ++ Windows.oracle ++
      SortsSets.oracle ++ Functions.oracle ++ TextOps.oracle ++
      VectorOps.oracle ++ MultiModal.oracle ++ StreamingOps.oracle ++
      EventOps.oracle ++ Layout.oracle ++ Graphs.oracle ++ TpcH.oracle
}
