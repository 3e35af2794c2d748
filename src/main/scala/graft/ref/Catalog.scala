package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.AtomicTable

/** Four-layer warehouse namespace over parquet directories — the Spark
  * stand-in for the reference's Postgres schemas raw/staging/intermediate/
  * mart (dbt_project.yml:20-33, profiles.yml:4-13).
  *
  * Materialization mirrors dbt: "view" models stay as unpersisted
  * DataFrames in [[views]]; "table" models are written to
  * `<root>/<layer>/<name>` and read back (so downstream plans scan
  * parquet with pushdown/pruning, exactly like dbt's `CREATE TABLE AS`).
  *
  * Table writes are ATOMIC via [[graft.operators.AtomicTable]]
  * (versioned data dirs + commit markers): a dashboard reader running
  * concurrently with the nightly rebuild either sees the previous
  * committed version or the new one, never a half-written or
  * momentarily-empty table — the durability dbt gets for free from
  * Postgres DDL transactionality (the reference's `CREATE TABLE` swap
  * runs inside a transaction). The previous version is retained as a
  * grace window for in-flight readers; older versions are pruned.
  * At cluster scale the same layout is a lakehouse path per table —
  * AtomicTable's marker protocol is the connector-free equivalent of a
  * Delta/Iceberg snapshot commit.
  */
final class Catalog(val spark: SparkSession, val root: String) {
  // TrieMap: ModelDag materializes independent models from a thread
  // pool (its Par helper), so registration must be thread-safe.
  private val views = scala.collection.concurrent.TrieMap[String, DataFrame]()

  private def path(layer: String, name: String) = s"$root/$layer/$name"

  /** dbt `materialized='table'`: atomic versioned commit, then read the
    * committed snapshot back so downstream plans scan parquet. */
  def saveTable(layer: String, name: String, df: DataFrame): DataFrame = {
    val p = path(layer, name)
    AtomicTable.commit(df, p, AtomicTable.nextVersion(spark, p))
    AtomicTable.read(spark, p).get
  }

  /** [[saveTable]] with SCAN-FREE quality telemetry: an `observe` node
    * rides the commit's own write job ([[graft.quality.Observed]]), so
    * row count and per-column null counts arrive as a by-product of
    * materialization — at mart scale this replaces the quality
    * battery's extra full-table aggregate scans with zero added I/O.
    * Returns the committed snapshot and the observed check results. */
  def saveTableObserved(layer: String, name: String, df: DataFrame,
                        notNullCols: Seq[String])
      : (DataFrame, Seq[graft.quality.Checks.Result]) = {
    val pending = graft.quality.Observed.instrument(df, name, notNullCols)
    val out = saveTable(layer, name, pending.df)
    (out, pending.results())
  }

  /** `materialized='table'` with HIVE-PARTITIONED layout: rows land in
    * one directory per `partitionCols` value, so downstream filters on
    * those columns become PARTITION PRUNING (directories never opened)
    * instead of row-level parquet filtering — the difference between
    * scanning a day and scanning 100 TB when marts are queried by date
    * range. Partition columns must be low-cardinality (year/month, not
    * raw date at daily fact volume) or the small-files problem replaces
    * the scan problem. Commit protocol identical to [[saveTable]]: the
    * hive directory tree lives under the committed version dir. */
  def saveTablePartitioned(layer: String, name: String, df: DataFrame,
                           partitionCols: Seq[String]): DataFrame = {
    val p = path(layer, name)
    AtomicTable.commit(df, p, AtomicTable.nextVersion(spark, p),
      partitionCols = partitionCols)
    // The hive layout moves partition columns to the end and partition-
    // value inference retypes them (e.g. '2024-05-01' dirs → DATE), so
    // restore the model's declared column order and types: downstream
    // DAG consumers see the same frame whether or not a model is
    // partitioned, while external readers of the committed table (via
    // [[load]]) keep the raw partition column for directory pruning.
    val committed = AtomicTable.read(spark, p).get
    committed.select(df.schema.map(f =>
      committed(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  /** `materialized='table'` with Z-ORDERED layout + per-file stats
    * manifest — the `OPTIMIZE ZORDER BY` shape for marts probed on TWO
    * dimensions neither of which justifies hive partitioning (e.g.
    * pricing history by product AND period: partitioning on either
    * leaves the other unpruned; interleaving both gives every file a
    * tight bounding box in each). `dims` are (name, quantized-LONG
    * expr) pairs — the same two exprs feed [[graft.operators.ZOrder]]'s
    * Morton key and the [[graft.operators.DataSkipping]] manifest, and
    * a reader probes with `DataSkipping.readSkipping(spark, path,
    * ranges)` using buckets computed the same way. Commit protocol
    * identical to [[saveTable]]; the manifest lives inside the version
    * dir and dies with it. */
  def saveTableZOrdered(layer: String, name: String, df: DataFrame,
                        dims: Seq[(String, org.apache.spark.sql.Column)],
                        numRanges: Int): DataFrame = {
    require(dims.size == 2, "Z-order interleaves exactly two dimensions")
    val p = path(layer, name)
    val clustered = graft.operators.ZOrder.clusterBy(df,
      dims(0)._2, dims(1)._2, numRanges)
    AtomicTable.commit(clustered, p, AtomicTable.nextVersion(spark, p))
    val dataPath = AtomicTable.latestDataPath(spark, p).get
    graft.operators.DataSkipping.writeManifest(spark, dataPath, dims)
    AtomicTable.read(spark, p).get
  }

  /** Filesystem dir of a table (for stats-manifest probes in tests /
    * tooling). */
  def tablePath(layer: String, name: String): String = path(layer, name)

  /** dbt `materialized='view'`: register the logical plan, no write. */
  def saveView(layer: String, name: String, df: DataFrame): DataFrame = {
    views(s"$layer.$name") = df
    df
  }

  /** Resolve a model: registered view → latest committed atomic table →
    * legacy plain-parquet dir (pre-atomic layouts stay readable). */
  def load(layer: String, name: String): DataFrame =
    views.getOrElse(s"$layer.$name", {
      val p = path(layer, name)
      AtomicTable.read(spark, p).getOrElse(spark.read.parquet(p))
    })

  /** `adapter.get_relation` existence guard (fct_orders.sql:24-55). An
    * atomic table exists only once a version is COMMITTED; a legacy
    * plain-parquet dir (no markers but has files) also counts. An
    * orphan version dir from a crashed writer counts as neither. */
  def exists(layer: String, name: String): Boolean = {
    val p = path(layer, name)
    views.contains(s"$layer.$name") ||
      AtomicTable.committedVersions(spark, p).nonEmpty ||
      AtomicTable.hasLegacyFiles(spark, p) // Hadoop FS, not java.io —
      // legacy tables on HDFS/S3A must count too (r07 ADVICE)
  }
}
