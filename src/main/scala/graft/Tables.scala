package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-provided TPC-H-ish testdata tables
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * At 100 TB each of these would be a partitioned parquet/Delta directory;
  * the reader API is identical (`spark.read.parquet(dir)`), so everything
  * built on these functions scales transparently — Catalyst still gets
  * filter pushdown, column pruning and partition pruning on the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[Sessions]]); under that flag it surfaces as nanos-since-epoch LONG.
    * Normalize to a microsecond TimestampType column either way so every
    * consumer sees one schema. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // div, not /: SQL division on longs is DOUBLE, and epoch nanos
        // (~1.7e18) are beyond 2^53 — the rounded quotient was off by
        // up to a microsecond (caught by st_interval_join's exact
        // micros lag; whole-second surfaces never noticed).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
