package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CRASH-ATOMIC MULTI-TABLE PUBLISH over [[AtomicTable]]s — the
  * cross-model half of the reference's transactional swap (its
  * Postgres `CREATE TABLE` swaps run inside one transaction, so a
  * failed run never leaves SOME marts refreshed and others stale;
  * ADR-002's rationale). A lakehouse has no cross-directory
  * transaction, so the guarantee is rebuilt from a write-ahead
  * journal:
  *
  *   1. STAGE: every table's new version dir is fully written — no
  *      markers yet, so readers still resolve the old versions.
  *   2. JOURNAL: one `txn_<id>.json` records every (dir, version)
  *      pair. Its creation is the transaction's commit point.
  *   3. PUBLISH: per-table commit markers are created (each one an
  *      O(1) metadata op), then the journal is deleted.
  *
  * A crash anywhere is repaired by [[recover]]: a journal whose staged
  * data dirs ALL exist rolls FORWARD (create the missing markers — the
  * transaction had committed); a journal with missing data rolls BACK
  * (staged dirs deleted — the transaction never committed). A crash
  * BEFORE the journal write needs no repair at all: unmarked version
  * dirs are invisible to readers and the next writer of that version
  * number overwrites them. After recovery, either every table shows
  * its new version or none does.
  *
  * Honest scope: this is crash-atomicity of the PUBLISH, not snapshot
  * isolation across tables — a reader racing the marker loop can see
  * table A's new version before table B's for the milliseconds the
  * loop takes (the same window a multi-statement warehouse commit has
  * between lock release and the last cache invalidation). Work is
  * driver-side O(#tables) metadata on top of the fully-distributed
  * data writes, so the protocol costs the same at 100 TB. */
object TxnCommit {

  final case class Staged(dir: String, version: Long)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def journalPath(journalDir: String, id: String) =
    new Path(s"$journalDir/txn_$id.json")

  private def dataPath(dir: String, version: Long) =
    new Path(s"$dir/v_$version")

  private def markerPath(dir: String, version: Long) =
    new Path(s"$dir/_commit_$version")

  /** Journal payload. Snapshot transactions additionally record their
    * `manifestDir` so [[recover]] can REPUBLISH the manifest when it
    * rolls the transaction forward (r13 ADVICE: without it, a crash
    * between the markers and the manifest publish left snapshot readers
    * pinned to the pre-crash manifest forever). Plain [[commitAll]]
    * journals keep the bare-array format; [[readJournal]] parses both. */
  private[graft] def writeJournal(spark: SparkSession, journalDir: String,
                           id: String, staged: Seq[Staged],
                           manifestDir: Option[String] = None): Unit = {
    val f = fs(spark, journalDir)
    f.mkdirs(new Path(journalDir))
    val arr = staged.map(s =>
      s"""{"dir":"${s.dir}","version":${s.version}}""")
      .mkString("[", ",", "]")
    val json = manifestDir match {
      case Some(m) => s"""{"manifest":"$m","staged":$arr}"""
      case None => arr
    }
    val out = f.create(journalPath(journalDir, id), true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  private def journalText(spark: SparkSession, p: Path): String = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def readJournal(spark: SparkSession,
                          p: Path): Seq[Staged] =
    """\{"dir":"([^"]+)","version":(\d+)\}""".r
      .findAllMatchIn(journalText(spark, p))
      .map(m => Staged(m.group(1), m.group(2).toLong)).toSeq

  /** Manifest dir of a snapshot transaction's journal, if recorded. */
  private def readManifestDir(spark: SparkSession,
                              p: Path): Option[String] =
    """^\{"manifest":"([^"]+)"""".r
      .findFirstMatchIn(journalText(spark, p).trim).map(_.group(1))

  /** Versions already claimed by OUTSTANDING journals (crashed-but-
    * committed transactions awaiting [[recover]]), per table dir.
    * `AtomicTable.nextVersion` counts only markers, so without this a
    * new commit racing an un-recovered crash would reuse the crashed
    * transaction's version number, overwrite its staged dir, and let a
    * later recover() publish the wrong transaction's data (r11 ADVICE). */
  private def journalReserved(spark: SparkSession,
                              journalDir: String): Map[String, Long] = {
    val jf = fs(spark, journalDir)
    if (!jf.exists(new Path(journalDir))) return Map.empty
    jf.listStatus(new Path(journalDir)).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("txn_"))
      .flatMap(readJournal(spark, _))
      .groupBy(_.dir).view.mapValues(_.map(_.version).max).toMap
  }

  /** Stage-only (test seam): write every table's next version dir and
    * return the staged set — no journal, no markers. `journalDir`, when
    * given, reserves versions referenced by outstanding journals so a
    * pre-recover commit can never collide with a crashed transaction. */
  private[graft] def stage(spark: SparkSession,
                           tables: Seq[(String, DataFrame)],
                           journalDir: Option[String] = None)
      : Seq[Staged] = {
    val reserved = journalDir.map(journalReserved(spark, _))
      .getOrElse(Map.empty)
    tables.map { case (dir, df) =>
      val v = math.max(AtomicTable.nextVersion(spark, dir),
        reserved.get(dir).map(_ + 1L).getOrElse(0L))
      df.write.mode("overwrite").parquet(dataPath(dir, v).toString)
      Staged(dir, v)
    }
  }

  /** Publish markers for a staged set (each an O(1) metadata op). */
  private def markers(spark: SparkSession, staged: Seq[Staged]): Unit =
    staged.foreach { s =>
      val f = fs(spark, s.dir)
      f.create(markerPath(s.dir, s.version), true).close()
    }

  private def dropJournal(spark: SparkSession, journalDir: String,
                          id: String): Unit = {
    fs(spark, journalDir).delete(journalPath(journalDir, id), false); ()
  }

  /** Atomically publish new versions of several tables. `id` must be
    * unique per transaction (a batch id / run id). */
  def commitAll(spark: SparkSession, journalDir: String, id: String,
                tables: Seq[(String, DataFrame)]): Seq[Staged] = {
    val staged = stage(spark, tables, Some(journalDir))
    writeJournal(spark, journalDir, id, staged) // commit point
    markers(spark, staged)
    dropJournal(spark, journalDir, id)
    staged
  }

  /** [[commitAll]] + cross-table SNAPSHOT publication: after the
    * markers land, one manifest pinning every table's new version is
    * written to `manifestDir` ([[SnapshotManifest]]). Readers that
    * resolve through `SnapshotManifest.snapshot` get both-old or
    * both-new across the whole published set — the marker-loop race
    * window documented above no longer reaches them.
    *
    * The journal records `manifestDir` and outlives the manifest
    * publish: a crash anywhere after the journal write is rolled
    * FORWARD by [[recover]] including the manifest, so snapshot readers
    * can never be stranded on the pre-crash manifest (r13 ADVICE). A
    * crash between the manifest publish and the journal delete makes
    * recovery republish an extra manifest seq with an identical pin
    * map — benign by idempotence of the pins. Returns
    * (staged set, manifest seq). */
  def commitAllSnapshot(spark: SparkSession, journalDir: String,
                        manifestDir: String, id: String,
                        tables: Seq[(String, DataFrame)])
      : (Seq[Staged], Long) = {
    val staged = stage(spark, tables, Some(journalDir))
    writeJournal(spark, journalDir, id, staged, Some(manifestDir))
    markers(spark, staged)
    val seq = SnapshotManifest.publish(spark, manifestDir, staged)
    dropJournal(spark, journalDir, id)
    (staged, seq)
  }

  /** Repair after a crash: roll committed-but-unpublished transactions
    * FORWARD, roll incompletely-staged journals BACK. Returns
    * (rolledForward, rolledBack) transaction ids. */
  def recover(spark: SparkSession, journalDir: String)
      : (Seq[String], Seq[String]) = {
    val jf = fs(spark, journalDir)
    if (!jf.exists(new Path(journalDir))) return (Nil, Nil)
    val journals = jf.listStatus(new Path(journalDir)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("txn_"))
    val (fwd, back) = journals.partition { p =>
      readJournal(spark, p).forall(s =>
        fs(spark, s.dir).exists(dataPath(s.dir, s.version)))
    }
    fwd.foreach { p =>
      val staged = readJournal(spark, p)
      staged.foreach { s =>
        val f = fs(spark, s.dir)
        if (!f.exists(markerPath(s.dir, s.version)))
          f.create(markerPath(s.dir, s.version), true).close()
      }
      // snapshot transactions: REPUBLISH the manifest so snapshot
      // readers advance with latest-readers (r13 ADVICE). Idempotent
      // in the pins: if the crash fell after the pre-crash publish,
      // this writes a same-pin manifest at the next seq.
      readManifestDir(spark, p).foreach(m =>
        SnapshotManifest.publish(spark, m, staged))
      jf.delete(p, false)
    }
    back.foreach { p =>
      readJournal(spark, p).foreach { s =>
        val f = fs(spark, s.dir)
        f.delete(markerPath(s.dir, s.version), false)
        f.delete(dataPath(s.dir, s.version), true)
      }
      jf.delete(p, false)
    }
    def id(p: Path) =
      p.getName.stripPrefix("txn_").stripSuffix(".json")
    (fwd.map(id), back.map(id))
  }
}
