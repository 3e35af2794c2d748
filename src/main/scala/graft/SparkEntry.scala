package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] covers one operator row of SURVEY §2 (the
  * name carries the §2 id) and, where the semantics are SQL-expressible,
  * has a DuckDB oracle twin in [[oracleSql]] with identical column names
  * (the driver sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** All registered queries, grouped by SURVEY §2 section. */
  def registry: Seq[Q] =
    AggQueries.all ++ WindowQueries.all ++ JoinQueries.all ++
      UnionScalarQueries.all ++ LlmQueries.all ++ ClusteringQueries.all ++
      StreamingQueries.all ++ GraphQueries.all ++
      RefOpQueries.all ++ CompanyProductQueries.all ++
      PricingHistoryQueries.all ++ OrdersChainQueries.all ++
      ConsolidationChainQueries.all ++ ShopifyChainQueries.all ++
      StagingChainQueries.all ++ IngestChainQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.q1PricingSummary.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
