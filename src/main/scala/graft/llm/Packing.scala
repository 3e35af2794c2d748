package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEQUENCE PACKING for LLM pretraining: the concat-and-chunk discipline
  * (documents concatenated in a deterministic order, split every
  * `budget` tokens into fixed-length training sequences). The plan
  * assigns every document its pack id, its token offset inside the
  * pack, and whether it spans a pack boundary — the bookkeeping a
  * packed-dataset writer needs to emit fixed-length samples and mask
  * cross-document attention.
  *
  * SCALE SHAPE: a single global running sum would be one partition — a
  * non-starter at corpus scale. Real packed-pretraining pipelines pack
  * PER SHARD (each output shard is its own token stream), which is
  * exactly window-parallel: shard = pmod(doc_id, nShards), running sum
  * partitioned by shard ordered by doc_id. nShards = O(cluster cores)
  * keeps every window partition independent; pack ids are globally
  * unique via the (shard, pack-within-shard) composite. Deterministic:
  * same inputs → same packs, no RNG, no timestamps.
  */
object Packing {

  /** Per-doc pack assignment. `nTokens` must be a non-negative integer
    * column. Emits (doc_id, shard, n_tokens, cum_before, pack_id,
    * offset_in_pack, spans_boundary). */
  def packSequences(docs: DataFrame, id: Column, nTokens: Column,
                    budget: Long, nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(id.as("doc_id"),
        pmod(id, lit(nShards.toLong)).as("shard"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // div: integer division on longs stays in integer space (a
      // double floor would be exact only below 2^53 — avoid the cliff)
      .withColumn("pack_id",
        col("shard") * 1000000L + expr(s"cum_before div ${budget}L"))
      .withColumn("offset_in_pack", pmod(col("cum_before"), lit(budget)))
      .withColumn("spans_boundary",
        col("offset_in_pack") + col("n_tokens") > budget)
  }
}
