package graft

import org.apache.spark.sql.SparkSession

/** One place for session wiring so Verify, Bench, and tests agree.
  *
  * Knobs and why (local[32] now; the same settings are the right defaults
  * on a 1000-executor cluster, where only shuffle.partitions would be
  * raised to ~2-3× total cores):
  *  - shuffle.partitions = cores, not 200: avoids tiny-task overhead at
  *    test scale; AQE coalesces anyway.
  *  - AQE on: runtime join-strategy switches + skew-join splitting.
  *  - nanosAsLong: the events table is parquet TIMESTAMP(NANOS), which the
  *    vectorized reader otherwise rejects (normalized in [[Tables.events]]).
  *  - UTC session timezone: date/timestamp semantics match the DuckDB
  *    oracle and are cluster-location-independent.
  */
object Sessions {
  def local(cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
