package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark build function over an sf directory
  * plus (when SQL-expressible) the equivalent DuckDB oracle SQL. Column
  * names/aliases MUST match between the two — the driver sorts columns by
  * name and hash-compares values.
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val build: (SparkSession, String) => DataFrame)

object Q {
  def sql(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(build)

  /** Rows-only checked query (non-SQL-expressible operator). */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, None)(build)
}
