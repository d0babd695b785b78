package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LlmQueries, RankQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented SURVEY §2 operator to a batch DataFrame
  * over the test tables in `sfDir`; `oracleSql` holds the equivalent DuckDB
  * SQL the driver hash-compares against (column names aligned on both
  * sides). Every registry query has an oracle entry — q31 simhash, the
  * last rows-only holdout, votes on the portable mod-2^57 fingerprint hash
  * since round 5 so DuckDB reproduces its signatures bit-for-bit (see
  * LlmQueries.simhashPairs).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.aggSum(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RankQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ RankQueries.oracles ++ LlmQueries.oracles
}
