package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-CONTAMINATION detection for training corpora: flag corpus
  * documents that share word n-grams with a held-out benchmark/eval set
  * (the standard decontamination step before pretraining — n-gram
  * collision against the eval suites).
  *
  * Plan shape (the part that must survive 100 TB): both sides reduce to
  * DISTINCT (doc, shingle) / (shingle) rows, the collision is ONE
  * equi-join keyed by shingle — never a cross join, never per-pair
  * comparison — and the verdict is a per-doc aggregate. The benchmark
  * side is deduplicated to unique shingles first, so a shingle repeated
  * across benchmark items can't fan out corpus rows; join skew on
  * ubiquitous n-grams is bounded by that dedup (worst case one corpus
  * row matches one bench row per shingle). The benchmark shingle set is
  * usually small enough to broadcast — left to AQE's runtime sizing
  * rather than forced, since eval suites can still be millions of
  * shingles.
  */
object Contamination {

  /** Per-corpus-document contamination scores against `benchmark`:
    * distinct n-gram count, how many collide with any benchmark n-gram,
    * the collision ratio, and the threshold flag. Corpus docs with
    * fewer than `n` tokens have no shingles and drop out. */
  def contaminationScores(corpus: DataFrame, benchmark: DataFrame,
                          id: Column, text: Column, n: Int = 3,
                          threshold: Double = 0.05): DataFrame = {
    val corpusSh = TextAnalysis.shingleRows(corpus, id, text, n)
      .distinct()
    val benchSh = TextAnalysis.shingleRows(benchmark, id, text, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1L))
    corpusSh.join(benchSh, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination_ratio",
        col("n_contaminated").cast("double") /
          col("n_shingles").cast("double"))
      .withColumn("is_contaminated",
        col("contamination_ratio") >= threshold)
  }
}
