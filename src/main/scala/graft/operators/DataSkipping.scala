package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL DATA SKIPPING over a committed [[AtomicTable]] — the
  * stats-manifest half of the Z-order story. [[ZOrder.clusterBy]] makes
  * every written file own a near-square tile of the (dimA, dimB) space;
  * this module records each file's min/max of the two quantized
  * dimensions in a `_file_stats.json` manifest inside the committed
  * version dir, and serves reads that touch only the files whose stats
  * overlap the query's dim ranges. Together they are the connector-free
  * equivalent of a lakehouse format's `OPTIMIZE ZORDER BY` plus its
  * per-file stats manifest (Delta data skipping / Iceberg manifests):
  * plain parquet gets row-group pruning INSIDE each file for free, but
  * nothing skips whole files of an unpartitioned table — at 100 TB the
  * difference between opening every file of a mart and opening the 2-4
  * tiles a (product, period) probe actually needs.
  *
  * Layout: `v_<n>/_file_stats.json` — an underscore file, so Spark's
  * file index never treats it as data; it travels and dies with its
  * version (commit-time retention pruning deletes the whole dir).
  *
  * Scale shape: stats collection is ONE distributed scan of the freshly
  * committed files (groupBy input_file_name → min/max per dim), with a
  * result of #files × #dims rows — driver-held JSON of a few KB even at
  * thousands of files. The skipping read is a driver-side manifest
  * filter (O(#files) metadata) followed by a normal parquet scan of the
  * selected files, so Catalyst still gets pushdown/pruning inside them.
  */
object DataSkipping {

  val ManifestName = "_file_stats.json"

  /** Per-file stats row: file name (not full path — versions move) and
    * per-dimension [min, max]. */
  final case class FileStat(file: String, mins: Map[String, Long],
                            maxs: Map[String, Long])

  /** Collect per-file min/max of each (name, expr) dimension over the
    * parquet files at `dataPath` and write the manifest there.
    * `dims` exprs must be LONG-valued (quantized buckets — the same
    * exprs handed to [[ZOrder.clusterBy]]'s key). */
  def writeManifest(spark: SparkSession, dataPath: String,
                    dims: Seq[(String, Column)]): Seq[FileStat] = {
    val aggs = dims.flatMap { case (n, c) =>
      Seq(min(c).cast("long").as(s"_min_$n"), max(c).cast("long").as(s"_max_$n"))
    }
    val stats = spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val fileName = new Path(r.getString(0)).getName
        FileStat(fileName,
          dims.map { case (n, _) =>
            n -> r.getLong(r.fieldIndex(s"_min_$n")) }.toMap,
          dims.map { case (n, _) =>
            n -> r.getLong(r.fieldIndex(s"_max_$n")) }.toMap)
      }.toSeq.sortBy(_.file)
    val json = stats.map { s =>
      val per = s.mins.keys.toSeq.sorted.map { n =>
        s""""$n":[${s.mins(n)},${s.maxs(n)}]"""
      }.mkString(",")
      s"""{"file":"${s.file}",$per}"""
    }.mkString("[", ",", "]")
    val f = new Path(dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new Path(s"$dataPath/$ManifestName"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    stats
  }

  /** Parse the manifest at `dataPath`, if present. (Hand-rolled JSON —
    * the format is fully controlled by [[writeManifest]].) */
  def readManifest(spark: SparkSession, dataPath: String)
      : Option[Seq[FileStat]] = {
    val p = new Path(s"$dataPath/$ManifestName")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val raw = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val entry = """\{"file":"([^"]+)"((?:,"[^"]+":\[-?\d+,-?\d+\])*)\}""".r
      val dim = """"([^"]+)":\[(-?\d+),(-?\d+)\]""".r
      Some(entry.findAllMatchIn(raw).map { m =>
        val dims = dim.findAllMatchIn(m.group(2)).map { d =>
          (d.group(1), d.group(2).toLong, d.group(3).toLong)
        }.toSeq
        FileStat(m.group(1),
          dims.map(d => d._1 -> d._2).toMap,
          dims.map(d => d._1 -> d._3).toMap)
      }.toSeq)
    }
  }

  val BloomManifestName = "_file_bloom.json"

  /** Per-file BLOOM manifest for POINT-LOOKUP skipping — the second
    * half of lakehouse data skipping: min/max stats prune range probes
    * on the z-dims, but a point lookup on a HIGH-CARDINALITY key (a
    * needle-in-the-mart doc_id / order id) overlaps almost every
    * file's [min, max]. A per-file Bloom filter answers "can this file
    * contain value v?" with no false negatives, so the read opens only
    * the files whose filter fires.
    *
    * Build: ONE distributed scan — groupBy input_file_name +
    * Spark's own `BloomFilterAggregate` ([[graft.plans.Bloom]]; a
    * mergeable TypedImperativeAggregate, map-side partials like any
    * aggregate) over `xxhash64(column)`. The serialized filters
    * (numBits/8 bytes each) land base64'd in `_file_bloom.json` beside
    * the stats manifest — a few hundred KB of driver-held metadata at
    * thousands of files, same as a Delta/Iceberg puffin/stats blob.
    * Probe: driver-side `BloomFilter.readFrom(...).mightContainLong`
    * per file — O(#files) metadata work BEFORE any task launches.
    * Returns the per-file filters for inspection. */
  def writeBloomManifest(spark: SparkSession, dataPath: String,
                         column: String,
                         expectedItems: Long = 1000000L,
                         numBits: Long = 1L << 23): Seq[(String, Array[Byte])] = {
    graft.plans.Bloom.register(spark)
    val rows = spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("_file"))
      .agg(expr(s"${graft.plans.Bloom.aggName}(xxhash64($column), " +
        s"${expectedItems}L, ${numBits}L)").as("bloom"))
      .collect()
      .map(r => (new Path(r.getString(0)).getName,
        r.getAs[Array[Byte]](1)))
      .toSeq.sortBy(_._1)
    val b64 = java.util.Base64.getEncoder
    val json = s"""{"column":"$column","files":[""" + rows.map {
      case (f, b) =>
        s"""{"file":"$f","bloom":"${b64.encodeToString(b)}"}"""
    }.mkString(",") + "]}"
    val fs = new Path(dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$dataPath/$BloomManifestName"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    rows
  }

  /** Parse the bloom manifest at `dataPath`: (column, file → filter
    * bytes). */
  def readBloomManifest(spark: SparkSession, dataPath: String)
      : Option[(String, Seq[(String, Array[Byte])])] = {
    val p = new Path(s"$dataPath/$BloomManifestName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val colRe = """^\{"column":"([^"]+)"""".r
      val entry = """\{"file":"([^"]+)","bloom":"([^"]+)"\}""".r
      val column = colRe.findFirstMatchIn(raw).map(_.group(1))
      val dec = java.util.Base64.getDecoder
      column.map { c =>
        (c, entry.findAllMatchIn(raw)
          .map(m => (m.group(1), dec.decode(m.group(2)))).toSeq)
      }
    }
  }

  /** Read the latest committed version touching ONLY files whose Bloom
    * filter might contain ANY of `values` (values must be literals of
    * the indexed column's type — the probe hashes them with the same
    * `xxhash64` the build used). No false negatives: the selection is a
    * superset of matching rows, callers still apply the row predicate.
    * Falls back to the full snapshot when no manifest (or a manifest
    * for a different column) exists. */
  def readBloomSkipping(spark: SparkSession, tableDir: String,
                        column: String, values: Seq[Any]): DataFrame = {
    val dataPath = AtomicTable.latestDataPath(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $tableDir"))
    readBloomManifest(spark, dataPath) match {
      case Some((c, files)) if c == column && files.nonEmpty =>
        // ONE local job hashes every probe value (one row, N columns) —
        // a per-value spark.range(1).head() loop launches O(values)
        // driver-side jobs for what is a pure function (r11 nit #2).
        val row = spark.range(1)
          .select(values.map(v => xxhash64(lit(v))): _*).head()
        val hashes = values.indices.map(row.getLong(_))
        val keep = files.filter { case (_, bytes) =>
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bytes))
          hashes.exists(bf.mightContainLong)
        }.map { case (f, _) => s"$dataPath/$f" }
        if (keep.isEmpty) spark.read.parquet(dataPath).limit(0)
        else spark.read.parquet(keep: _*)
      case _ => spark.read.parquet(dataPath)
    }
  }

  /** Read the latest committed version touching ONLY files whose stats
    * overlap every `ranges` interval (dim name → inclusive [lo, hi]).
    * File selection is a SUPERSET of the matching rows — callers still
    * apply their row predicate; skipping only reduces I/O. Falls back
    * to the full snapshot when no manifest exists or nothing matches
    * semantics-wise (empty selection reads nothing via limit(0) on the
    * full schema, keeping downstream plans resolvable). */
  def readSkipping(spark: SparkSession, tableDir: String,
                   ranges: Map[String, (Long, Long)]): DataFrame = {
    val dataPath = AtomicTable.latestDataPath(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $tableDir"))
    readManifest(spark, dataPath) match {
      case None => spark.read.parquet(dataPath)
      case Some(stats) =>
        val keep = stats.filter { s =>
          ranges.forall { case (n, (lo, hi)) =>
            // unknown dim name => cannot prune on it => keep the file
            s.mins.get(n).forall(mn => s.maxs(n) >= lo && mn <= hi)
          }
        }.map(s => s"$dataPath/${s.file}")
        if (keep.isEmpty)
          spark.read.parquet(dataPath).limit(0)
        else spark.read.parquet(keep: _*)
    }
  }
}
