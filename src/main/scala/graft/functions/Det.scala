package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic numeric aggregation helpers.
  *
  * Problem: the testdata money columns are IEEE doubles. A parallel Spark
  * sum and a sequential DuckDB (oracle) sum add in different orders, so the
  * raw double results differ in the last ulps and a hash compare fails.
  *
  * Fix: do the *reduction* in fixed-point decimal — casting each addend
  * double → DECIMAL(38,6) is an order-independent, correctly-rounded,
  * engine-identical operation, and decimal addition is exact.
  *
  * TIE CAVEAT (learned from a9_company_products): the cast IS
  * tie-sensitive — Spark rounds HALF_UP, DuckDB HALF_EVEN — and a double
  * CAN be an exact x.xxxxxx5 tie when it came from dividing a short
  * decimal by a power of two (e.g. price/32 has a terminating 7-digit
  * expansion). Products/sums of short decimals are safe (either exact at
  * ≤6dp or non-terminating); AVOID feeding power-of-two divisions into
  * dsum/davg — restructure the expression (multiply instead) so addends
  * are never exact ties.
  * The final cast back to double is again correctly rounded and identical
  * in both engines. Every scalar double op *before* the cast (e.g.
  * `price * (1 - discount)`) is a deterministic IEEE op evaluated
  * identically per-row by both engines, so the whole expression is
  * bit-reproducible end-to-end.
  *
  * Scale note: decimal sum is still a single-pass partial-aggregate
  * (map-side combine) — same shuffle shape as a double sum, just a wider
  * (16-byte) accumulator. At 100 TB this is the same plan with ~2× agg
  * buffer width; no extra shuffle, no skew change.
  *
  * Each helper has an `sql*` twin producing the equivalent DuckDB SQL for
  * the oracle (SparkEntry.oracleSql).
  */
object Det {
  private val D = DecimalType(38, 6)

  /** Order-independent exact sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Deterministic average: exact decimal sum / non-null count, in doubles. */
  def davg(c: Column): Column =
    sum(c.cast(D)).cast(DoubleType) / count(c)

  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"

  def sqlDavg(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE) / COUNT($x)"
}
