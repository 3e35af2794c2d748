package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.operators.{AtomicTable, MergeUpsert}

/** STORAGE HALF of the daily-crawl dedup discipline: a versioned,
  * committed corpus-fingerprint index that [[Dedup.incrementalExact]]
  * batches dedup against and append to. Day N's work reads the
  * committed index (one scan ∝ |index|), never the corpus itself, and
  * commits index+delta as the next [[AtomicTable]] version — so a
  * crashed run leaves the previous index intact and the batch is safely
  * re-runnable (the commit is idempotent per version, and re-deduping
  * the same batch against the pre-batch index yields the same delta).
  *
  * At 100 TB the index is fingerprints only (16-byte md5 per KEPT doc),
  * orders of magnitude smaller than the corpus; the upsert shuffles on
  * the uniformly-distributed fingerprint — no skew, and the same
  * MERGE-INTO shape a lakehouse sink would take (MergeUpsert scaladoc).
  */
object CorpusIndex {

  val FpCol = "content_fp"

  /** Latest committed index at `dir`; empty (zero-row) index when no
    * version is committed yet — day 1 bootstraps against it. */
  def load(spark: SparkSession, dir: String): DataFrame =
    AtomicTable.read(spark, dir).getOrElse(
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(Seq(StructField(FpCol, StringType)))))

  /** One daily batch: annotate via the REAL [[Dedup.incrementalExact]]
    * against the committed index, commit index ∪ kept-fingerprints as
    * the next version, return the annotated batch (whose plan reads the
    * PRE-batch index — the semantics a re-run must see). */
  def processBatch(spark: SparkSession, dir: String, batch: DataFrame,
                   id: Column, text: Column): DataFrame = {
    val annotated = Dedup.incrementalExact(load(spark, dir), batch, id, text)
    val delta = annotated.filter(col("keep")).select(col(FpCol)).distinct()
    val next = MergeUpsert.upsert(load(spark, dir), delta, Seq(FpCol))
    AtomicTable.commit(next, dir, AtomicTable.nextVersion(spark, dir))
    annotated
  }
}

/** NEAR-DUP sibling of [[CorpusIndex]] — the daily-crawl discipline for
  * FUZZY duplicates: the committed index holds the MinHash LSH band
  * keys of every kept document ((band, band_key) distinct — a few
  * 16-byte keys per doc, corpus-text-free), and a new batch is flagged
  * `hit_index` when ANY of its band keys collides with the index (the
  * standard LSH decision: same recall knobs — bands × rowsPerBand — as
  * [[Dedup.lshCandidates]], no text re-read of history). Kept docs'
  * bands are upserted as the next [[AtomicTable]] version, so day-N
  * work is one band equi-join against uniformly-hashed committed keys —
  * never a re-scan of the historical corpus, and the commit semantics
  * (crash-safe, idempotent per version, re-runnable against the
  * pre-batch index) are exactly [[CorpusIndex.processBatch]]'s.
  *
  * Scope: batch-INTERNAL near-dup clustering stays with the composed
  * `simhashNearDups → connectedComponents → representative` chain
  * (`dd_cluster_canonical`); this operator decides batch-vs-HISTORY.
  * At extreme index sizes the probe composes with the same
  * build-small/probe-big Bloom prune as [[Dedup.incrementalExactBloom]]
  * (build over the batch's band keys, prune the index scan). */
object NearDupIndex {

  /** Latest committed band index at `dir`; empty when none committed. */
  def load(spark: SparkSession, dir: String): DataFrame =
    AtomicTable.read(spark, dir).getOrElse(
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(Seq(
          StructField("band", org.apache.spark.sql.types.IntegerType),
          StructField("band_key", StringType)))))

  /** One daily batch: shingle → [[Dedup.minhashBands]] → flag docs
    * sharing any band with the committed index → commit index ∪ kept
    * docs' bands as the next version. Returns (doc_id, hit_index,
    * keep); docs too short to shingle have no bands — never flagged,
    * never indexed. `version`/`writerId` let a STREAMING caller pin
    * the commit to its micro-batch id under its checkpoint lineage
    * ([[graft.streaming.EventStream.nearDupDedupSink]]) so a replayed
    * batch is an idempotent already-committed no-op — the same
    * contract as [[PhashIndex.processBatch]]; batch callers take the
    * default next-version numbering. */
  def processBatch(spark: SparkSession, dir: String, batch: DataFrame,
                   id: Column, text: Column,
                   nBands: Int = 4, rowsPerBand: Int = 2,
                   shingleN: Int = 3,
                   version: Option[Long] = None,
                   writerId: Option[String] = None): DataFrame = {
    val base = batch.select(id.as("doc_id"), text.as("text"))
    val shingled = TextAnalysis.shingleRows(base, col("doc_id"),
      col("text"), shingleN).distinct()
    val bb = Dedup.minhashBands(shingled, nBands, rowsPerBand)
    val idx = load(spark, dir)
    val hits = bb.join(idx, Seq("band", "band_key"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("hit_index", lit(true))
    val annotated = base.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("hit_index", coalesce(col("hit_index"), lit(false)))
      .withColumn("keep", !col("hit_index"))
    val keptBands = bb
      .join(annotated.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select(col("band"), col("band_key")).distinct()
    val next = MergeUpsert.upsert(idx, keptBands, Seq("band", "band_key"))
    AtomicTable.commit(next, dir,
      version.getOrElse(AtomicTable.nextVersion(spark, dir)),
      writerId = writerId)
    annotated
  }
}

/** IMAGE sibling of [[NearDupIndex]] — persisted perceptual-hash index
  * for daily-crawl image dedup: the committed index holds, for every
  * kept image, its 4×16-bit dHash pigeonhole band rows WITH the full
  * 64-bit hash ((band, band_key, hash_lo, hash_hi)). A probe batch
  * joins on (band, band_key) — candidates only, never all-pairs — and
  * then VERIFIES Hamming ≤ maxHamming against the indexed hash before
  * flagging. The verify step is load-bearing at scale: 16-bit band keys
  * saturate as the index grows (≈ |index|·4/65536 expected candidates
  * per probe), so band collision alone would flag nearly everything;
  * carrying the hash into the index makes the decision exact-recall
  * (pigeonhole, Hamming ≤ 3) AND exact-precision, unlike the text
  * index whose 128-bit md5 band keys never collide by accident.
  * Commit semantics (crash-safe, idempotent per version, re-runnable
  * against the pre-batch index) are [[CorpusIndex.processBatch]]'s. */
object PhashIndex {

  /** Latest committed band+hash index at `dir`; empty when none. */
  def load(spark: SparkSession, dir: String): DataFrame =
    AtomicTable.read(spark, dir).getOrElse(
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(Seq(
          StructField("band", org.apache.spark.sql.types.IntegerType),
          StructField("band_key", org.apache.spark.sql.types.LongType),
          StructField("hash_lo", org.apache.spark.sql.types.LongType),
          StructField("hash_hi", org.apache.spark.sql.types.LongType)))))

  /** One daily image batch: real decode → dHash → band-join the
    * committed index → Hamming-verify → flag; kept images' band rows
    * are upserted as the next version. Returns (doc_id, hit_index,
    * keep). `version`/`writerId` let a STREAMING caller pin the commit
    * to its micro-batch id under its checkpoint lineage
    * ([[graft.streaming.EventStream.phashDedupSink]]) so a replayed
    * batch is an idempotent already-committed no-op; batch callers
    * take the default next-version numbering. */
  def processBatch(spark: SparkSession, dir: String, images: DataFrame,
                   maxHamming: Int = 3,
                   version: Option[Long] = None,
                   writerId: Option[String] = None): DataFrame = {
    val hashes = Multimodal.dHash64(images)
    val bands = Multimodal.phashBands(hashes)
    val idx = load(spark, dir)
    val hits = bands.join(
        idx.withColumnRenamed("hash_lo", "idx_lo")
          .withColumnRenamed("hash_hi", "idx_hi"),
        Seq("band", "band_key"))
      .filter(expr("bit_count(hash_lo ^ idx_lo) + " +
        s"bit_count(hash_hi ^ idx_hi) <= $maxHamming"))
      .select("doc_id").distinct()
      .withColumn("hit_index", lit(true))
    val annotated = hashes.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .withColumn("hit_index", coalesce(col("hit_index"), lit(false)))
      .withColumn("keep", !col("hit_index"))
    val keptBands = bands
      .join(annotated.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select("band", "band_key", "hash_lo", "hash_hi").distinct()
    val next = MergeUpsert.upsert(idx, keptBands,
      Seq("band", "band_key", "hash_lo", "hash_hi"))
    AtomicTable.commit(next, dir,
      version.getOrElse(AtomicTable.nextVersion(spark, dir)),
      writerId = writerId)
    annotated
  }
}
