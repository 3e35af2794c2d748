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
