package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** PLAN-FINGERPRINT RESULT CACHE — materialized-view-lite: re-running
  * the SAME query over UNCHANGED inputs returns the committed result
  * of the previous run instead of recomputing (dbt's "skip unchanged
  * model" at query granularity, or a poor man's incremental
  * materialized view with full-recompute refresh).
  *
  * The cache key couples WHAT is computed with WHAT it reads:
  *   - the canonicalized optimized plan's `semanticHash` — alias
  *     names, attribute ids and cosmetic differences hash equal,
  *     semantic changes don't;
  *   - per input relation (every `HadoopFsRelation` scan in the plan):
  *     root path + file count + total bytes + max modification time —
  *     any upstream rewrite, append or recommit changes the key.
  *
  * Results are committed [[AtomicTable]]s under `cacheDir/<key>`, so
  * cache writes are crash-safe and a reader never sees a half-written
  * entry; re-validation is driver-side metadata (one file listing per
  * input). At warehouse scale this is the difference between a
  * dashboard refresh re-running a 30-minute aggregate and serving the
  * committed snapshot — with staleness exactly 'inputs unchanged',
  * never a TTL guess. */
object ResultCache {

  /** Cache key: semantic plan hash + input signatures.
    *
    * The plan hash is over the canonicalized ANALYZED plan, not the
    * optimized one: optimizer rewrites are not all run-deterministic —
    * `RewriteDistinctAggregates` (any plan with 2+ DISTINCT aggregates)
    * orders its Expand projections by a HashMap iteration over exprIds,
    * which differ across JVM runs, so byte-identical code re-planned in
    * a new run hashes differently and the cache never hits (found via
    * fct_trade_show_performance rebuilding on every unchanged re-run).
    * Analyzer rules are deterministic transformations; canonicalization
    * still normalizes exprIds and alias names, so alias renames and
    * pass-through projections hash equal (OperatorsSpec pins both). */
  def fingerprint(df: DataFrame): String = {
    val plan = df.queryExecution.analyzed
    val planHash = plan.canonicalized.semanticHash()
    val spark = df.sparkSession
    val inputs = plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map { p =>
          val hfs = p.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          // RECURSIVE walk: a hive-partitioned input keeps its data
          // files under partition subdirectories — a top-level-only
          // listing would sign them as `0|0|0` and changes inside
          // partitions would never invalidate the entry (r11 nit #1).
          val it = hfs.listFiles(p, true)
          // Hash the SORTED per-file (path, len, mtime) tuples rather
          // than aggregating to count|sumBytes|maxMtime: an in-place
          // rewrite with unchanged length and a non-advancing mtime
          // (clock rewind, restored backup, rsync -t, object-store copy
          // preserving timestamps) must still perturb the signature —
          // under skipUnchanged a collision there silently serves a
          // stale committed mart (r12 ADVICE).
          val files = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) {
            val f = it.next()
            files +=
              s"${f.getPath}|${f.getLen}|${f.getModificationTime}"
          }
          val fmd = java.security.MessageDigest.getInstance("MD5")
          files.sorted.foreach(s => fmd.update(s.getBytes("UTF-8")))
          val fileHash = fmd.digest().map("%02x".format(_)).mkString
          s"$p|${files.size}|$fileHash"
        }.mkString(";")
        case _ => "other"
      }
    }.sorted.mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(planHash.toString.getBytes("UTF-8"))
    md.update(inputs.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  final case class CacheResult(df: DataFrame, key: String, hit: Boolean)

  /** Serve `df`'s result from the cache when its fingerprint matches a
    * committed entry; otherwise compute, commit, and serve the
    * committed snapshot (so hit and miss return the same
    * parquet-backed shape). */
  def getOrCompute(df: DataFrame, cacheDir: String): CacheResult = {
    val spark = df.sparkSession
    val key = fingerprint(df)
    val entryDir = s"$cacheDir/$key"
    AtomicTable.read(spark, entryDir) match {
      case Some(cached) => CacheResult(cached, key, hit = true)
      case None =>
        AtomicTable.commit(df, entryDir,
          AtomicTable.nextVersion(spark, entryDir))
        CacheResult(AtomicTable.read(spark, entryDir).get, key,
          hit = false)
    }
  }

  /** Drop entries not touched (marker mtime) in the last `maxAgeMs` —
    * the cache's vacuum. Returns dropped keys. */
  def evict(spark: SparkSession, cacheDir: String,
            maxAgeMs: Long): Seq[String] = {
    val root = new Path(cacheDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val now = System.currentTimeMillis()
    fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      val markers = fs.listStatus(st.getPath)
        .filter(_.getPath.getName.startsWith("_commit_"))
      val newest =
        if (markers.isEmpty) 0L
        else markers.map(_.getModificationTime).max
      if (now - newest > maxAgeMs) {
        fs.delete(st.getPath, true)
        Some(st.getPath.getName)
      } else None
    }
  }
}
