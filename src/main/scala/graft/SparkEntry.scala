package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` has one entry per implemented operator from SURVEY.md §2 Part B;
  * `oracleSql` gives the DuckDB-equivalent SQL for every oracle-checkable
  * query (keys and output column names match exactly — the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's core semantics (keyed tumbling-window counts,
    * SURVEY.md §2 A4-A6) as a batch query. */
  def entry(spark: SparkSession): DataFrame =
    StreamTwins.qStreamTumbling(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ StreamTwins.queries ++ Windows.queries ++
      Funcs.queries ++ Llm.queries ++ TextOps.queries ++ VectorOps.queries ++
      Media.queries ++ Analytics.queries ++ Behavior.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ StreamTwins.oracle ++ Windows.oracle ++
      Funcs.oracle ++ Llm.oracle ++ TextOps.oracle ++ VectorOps.oracle ++
      Media.oracle ++ Analytics.oracle ++ Behavior.oracle
}
