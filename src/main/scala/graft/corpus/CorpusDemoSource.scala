package graft.corpus

import org.apache.spark.sql.SparkSession

/** Deterministic batch-drop generator for the corpus pipeline's
  * self-demo and e2e spec — the LLM-side sibling of
  * [[graft.cli.DemoSource]]. Three batches with PLANTED duplicate
  * structure whose detection is certain, not probabilistic:
  *
  *   - batch_001: docs 0–199. Docs 150–159 are EXACT copies of 0–9
  *     (in-batch exact dups — the batch-canonical keeps the min id).
  *   - batch_002: docs 200–299. Docs 290–299 are exact copies of
  *     docs 10–19 (CROSS-batch — caught by the committed
  *     [[graft.llm.CorpusIndex]], not by the batch window); docs
  *     280–289 are DOUBLE-SPACED copies of docs 20–29: a different
  *     content fingerprint (`md5(lower(trim(text)))` sees the extra
  *     spaces) but the IDENTICAL token sequence, hence the identical
  *     simhash at every width — Hamming 0 ≤ 3 guarantees the
  *     near-dup index clusters them, deterministically, where a
  *     token-perturbed "near" dup would make spec assertions
  *     probabilistic.
  *   - batch_003: docs 300–379. Docs 370–379 are double-spaced
  *     copies of docs 200–209 (cross-SHARD near-dups: their cluster
  *     merge exercises [[graft.llm.ShardedNearDupIndex.addShard]]'s
  *     committed-index collision path).
  *
  * Texts are 24 words drawn deterministically from a vocabulary that
  * includes stopwords, so every original passes the curation gates
  * ([[CorpusPipeline.MinTokens]]/[[CorpusPipeline.MinQuality]]). One
  * doc (id 190) is a planted curation REJECT (too short). Doc 191
  * plants a PII email that the scrub must redact. */
object CorpusDemoSource {

  private val stops: Vector[String] = Vector(
    "the", "a", "and", "is", "of", "to", "in", "for", "with", "on", "an")

  /** Deterministic 24-word text for an ORIGINAL doc id: every third
    * position draws a stopword (quality gate + langId need them), the
    * rest draw from an EFFECTIVE 397-token synthetic vocabulary
    * (`w<k>`). Two design constraints, both learned from failed
    * drafts: (1) texts must be injective in id — the first draft's
    * `(id·13 + f(j)) mod 40` depended on id only through id mod 40
    * and the whole corpus collapsed to 40 exact-dup texts; here the
    * j=1 token alone is injective for id < 397. (2) docs must share
    * FEW content tokens — a 41-word vocabulary left every pair of
    * docs ~14 tokens overlapped, simhash signatures correlated, and
    * accidental Hamming ≤ 3 clusters merged half the demo corpus;
    * 24 draws from 397 overlap ~1.4 tokens, making planted
    * (double-spaced, Hamming 0) near-dups the only systematic
    * clusters. */
  private def text(id: Long): String = {
    val a = (id % 397).toInt
    val b = (31 * (id % 397) + 7).toInt
    (0 until 24).map { j =>
      if (j % 3 == 0) stops((a + j) % stops.size)
      else "w" + ((a + b * (j + 3) + j * j * 5) % 397)
    }.mkString(" ")
  }

  private def docText(id: Long): String = id match {
    case i if i >= 150 && i <= 159 => text(i - 150)      // exact, in-batch
    case i if i >= 290 && i <= 299 => text(i - 280)      // exact, cross-batch
    case i if i >= 280 && i <= 289 =>                    // near-dup (tokens ==)
      text(i - 260).replace(" ", "  ")
    case i if i >= 370 && i <= 379 =>                    // near-dup, cross-shard
      text(i - 170).replace(" ", "  ")
    case 190 => "too short"                              // curation reject
    case 191 => text(191) + " contact alice@example.com today"
    case i => text(i)
  }

  private val ranges = Seq(
    "batch_001" -> (0L until 200L),
    "batch_002" -> (200L until 300L),
    "batch_003" -> (300L until 380L))

  /** Write the first `upTo` batches under `dir/batches/<name>` (one
    * parquet directory per batch drop); returns `dir`. Idempotent per
    * batch (overwrite). */
  def write(spark: SparkSession, dir: java.nio.file.Path,
            upTo: Int = 3): String = {
    import spark.implicits._
    ranges.take(upTo).foreach { case (name, ids) =>
      ids.map(i => (i, docText(i), "en", s"demo/$name")).toSeq
        .toDF("doc_id", "text", "lang", "source")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/batches/$name")
    }
    dir.toString
  }
}
