package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.{queries => queriesPkg}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * DataFrame program over the TESTDATA tables in `sfDir`; `oracleSql` gives
  * the DuckDB-equivalent SQL for the driver's hash-compare. Modules under
  * graft.queries each contribute a (queries, oracle) pair.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ queriesPkg.Packets.queries ++
      queriesPkg.TextOps.queries ++ queriesPkg.Vectors.queries ++
      queriesPkg.Streams.queries ++ queriesPkg.Media.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ queriesPkg.Packets.oracle ++
      queriesPkg.TextOps.oracle ++ queriesPkg.Vectors.oracle ++
      queriesPkg.Streams.oracle ++ queriesPkg.Media.oracle
}
