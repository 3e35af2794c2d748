package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Four-layer warehouse namespace over parquet directories — the Spark
  * stand-in for the reference's Postgres schemas raw/staging/intermediate/
  * mart (dbt_project.yml:20-33, profiles.yml:4-13).
  *
  * Materialization mirrors dbt: "view" models stay as unpersisted
  * DataFrames in [[views]]; "table" models are written to
  * `<root>/<layer>/<name>` and read back (so downstream plans scan
  * parquet with pushdown/pruning, exactly like dbt's `CREATE TABLE AS`).
  * At cluster scale the same layout is a lakehouse path per table —
  * swap `parquet` for Delta/Iceberg and writes for MERGE where needed.
  */
final class Catalog(val spark: SparkSession, val root: String) {
  private val views = scala.collection.mutable.Map[String, DataFrame]()

  private def path(layer: String, name: String) = s"$root/$layer/$name"

  /** dbt `materialized='table'`. */
  def saveTable(layer: String, name: String, df: DataFrame): DataFrame = {
    df.write.mode("overwrite").parquet(path(layer, name))
    spark.read.parquet(path(layer, name))
  }

  /** `materialized='table'` with HIVE-PARTITIONED layout: rows land in
    * one directory per `partitionCols` value, so downstream filters on
    * those columns become PARTITION PRUNING (directories never opened)
    * instead of row-level parquet filtering — the difference between
    * scanning a day and scanning 100 TB when marts are queried by date
    * range. Partition columns must be low-cardinality (year/month, not
    * raw date at daily fact volume) or the small-files problem replaces
    * the scan problem. */
  def saveTablePartitioned(layer: String, name: String, df: DataFrame,
                           partitionCols: Seq[String]): DataFrame = {
    df.write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(path(layer, name))
    spark.read.parquet(path(layer, name))
  }

  /** dbt `materialized='view'`: register the logical plan, no write. */
  def saveView(layer: String, name: String, df: DataFrame): DataFrame = {
    views(s"$layer.$name") = df
    df
  }

  def load(layer: String, name: String): DataFrame =
    views.getOrElse(s"$layer.$name", spark.read.parquet(path(layer, name)))

  /** `adapter.get_relation` existence guard (fct_orders.sql:24-55). */
  def exists(layer: String, name: String): Boolean =
    views.contains(s"$layer.$name") ||
      new java.io.File(path(layer, name)).exists()
}
