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

  // ---- Scratch-dir hygiene (r12 VERDICT nit #1): queries that COMMIT
  // AtomicTables / stream checkpoints build under temp directories which
  // the RETURNED frame still scans — an eager delete inside the query
  // body would break the materialization that happens later (Verify's
  // write, Bench's count, PlanAudit's collect), and pinning the result
  // into a LocalRelation would hide the real executed plan from
  // PlanAudit. So query bodies allocate through [[tempDir]], and every
  // harness calls [[cleanupScratch]] AFTER materializing each query —
  // a full Verify+Bench pass leaves /tmp at its starting size instead
  // of stranding GBs of committed scratch tables.
  private val scratch =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** Create a scratch dir inside a query body and register it for
    * harness-side cleanup after the result is materialized. */
  def tempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratch.add(p)
    p
  }

  /** Delete every scratch dir registered since the last call. Harnesses
    * call this after materializing a query's result; a query re-built
    * afterwards allocates fresh dirs, so cleanup between reps is safe.
    *
    * SEQUENTIAL-HARNESS INVARIANT (r13 ADVICE): the queue is
    * process-global, so exactly ONE harness may interleave
    * build→materialize→cleanup at a time — Verify, Bench, PlanAudit and
    * the specs all run queries sequentially in-JVM, and the streaming
    * queries rely on the same single-consumer discipline for their
    * RocksDB conf scoping. A future parallel harness must scope
    * registration per pass (token from a beginScratchScope()/drain(tok)
    * pair) or two consumers would delete each other's live dirs
    * mid-materialization. */
  def cleanupScratch(): Unit = {
    var p = scratch.poll()
    while (p != null) { deleteRecursively(p); p = scratch.poll() }
  }

  /** Best-effort recursive delete (scratch dirs under /tmp). */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f =>
          try java.nio.file.Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () })
    }
}
