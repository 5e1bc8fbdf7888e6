package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CdcQueries, CurationQueries, LlmOps, MetricsOps, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the named query surface of every module; each entry in
  * [[queries]] is one operator from SURVEY.md §2, and each SQL-expressible
  * entry has DuckDB oracle SQL in [[oracleSql]] (same column names — the
  * driver's compare sorts columns by name before hashing values).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The TPC-H-Q5-shaped 6-way star join — exercises scan, broadcast + shuffle
    * joins, hash agg and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5_multi_join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ MetricsOps.queries ++ LlmOps.queries ++
      CurationQueries.queries ++ CdcQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ MetricsOps.oracleSql ++ LlmOps.oracleSql ++
      CurationQueries.oracleSql ++ CdcQueries.oracleSql
}
