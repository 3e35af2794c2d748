package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector-free ATOMIC-COMMIT parquet table: versioned data
  * directories plus commit markers, so a reader NEVER observes a
  * half-written or momentarily-deleted table and a crashed writer never
  * loses committed history. This is the honest parquet-only equivalent
  * of a transactional table format's commit protocol (the reference
  * targets a warehouse MERGE, BASELINE names Delta/Iceberg; no
  * connector jar ships in this environment, so the protocol is
  * implemented directly — same idea as an Iceberg snapshot pointer,
  * minus manifests, since partition/file pruning still comes from
  * parquet itself).
  *
  * Layout under `dir/`:
  *   - `v_<n>/`        parquet data for version n (written FIRST, fully)
  *   - `_commit_<n>`   empty marker file, created ONLY after `v_<n>` is
  *                     completely written — marker creation is the
  *                     single atomic visibility point (an O(1) file
  *                     create on HDFS/S3A/local, never a rename of the
  *                     data itself)
  *
  * Invariants (the crash-safety argument):
  *   1. Readers resolve MAX committed n, then read `v_<n>` — a version
  *      is either invisible (no marker) or complete; there is no state
  *      in which the table path is empty between swaps (the r03 ADVICE
  *      crash window: delete-then-rename lost the target if the job
  *      died between the two).
  *   2. A version's data is pruned only AFTER a newer marker exists, so
  *      committed history never lives solely in a deleted path.
  *   3. `commit` is IDEMPOTENT per version: if the marker exists the
  *      call is a no-op, so a replayed streaming batch (version =
  *      batch id) re-merges exactly once; a crash after data-write but
  *      before marker leaves an orphan `v_<n>` that the replay simply
  *      overwrites.
  *
  * Scale: all driver-side operations here are O(1) metadata calls
  * (list markers, create one file, delete one dir); data writes/reads
  * are fully distributed plans. The one-previous-version retention
  * gives in-flight readers a grace window; a production deployment
  * would retain more and vacuum by age.
  */
object AtomicTable {

  private val MarkerPrefix = "_commit_"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataPath(dir: String, version: Long) = new Path(s"$dir/v_$version")
  private def markerPath(dir: String, version: Long) =
    new Path(s"$dir/$MarkerPrefix$version")

  /** All committed versions, ascending (empty if the table never
    * committed). */
  def committedVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir))) Seq.empty
    else f.listStatus(new Path(dir)).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix).toLong)
      .sorted
  }

  def isCommitted(spark: SparkSession, dir: String, version: Long): Boolean =
    fs(spark, dir).exists(markerPath(dir, version))

  /** Latest committed snapshot, if any. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    committedVersions(spark, dir).lastOption
      .map(v => spark.read.parquet(dataPath(dir, v).toString))

  /** Write `df` as version `version` and commit it. Idempotent: a
    * version that already has a marker is left untouched. Retains the
    * immediately-previous version for reader grace; prunes older ones
    * (marker first — new readers stop resolving it — then data). */
  def commit(df: DataFrame, dir: String, version: Long): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    if (isCommitted(spark, dir, version)) return
    df.write.mode("overwrite").parquet(dataPath(dir, version).toString)
    f.create(markerPath(dir, version), true).close()
    committedVersions(spark, dir).filter(_ < version - 1).foreach { v =>
      f.delete(markerPath(dir, v), false)
      f.delete(dataPath(dir, v), true)
    }
  }

  /** Next version number a batch writer should commit as. */
  def nextVersion(spark: SparkSession, dir: String): Long =
    committedVersions(spark, dir).lastOption.map(_ + 1).getOrElse(0L)
}
