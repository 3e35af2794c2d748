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
  * keeps every window partition independent. The authoritative pack
  * identity is the (shard, pack_in_shard) PAIR — both emitted as
  * columns; `pack_id` is a convenience composite shard·2^40 +
  * pack_in_shard, collision-free up to 2^40 packs per shard (≈2.2e15
  * tokens/shard at budget 2048 — beyond any single shard's stream) and
  * up to 2^23 shards before overflowing a signed long. Deterministic:
  * same inputs → same packs, no RNG, no timestamps.
  */
object Packing {

  /** Packs per shard before the composite `pack_id` would collide. */
  val PackIdRadix: Long = 1L << 40

  /** Per-doc pack assignment. `nTokens` must be a non-negative integer
    * column. Emits (doc_id, shard, n_tokens, cum_before, pack_in_shard,
    * pack_id, offset_in_pack, spans_boundary). */
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
      .withColumn("pack_in_shard", expr(s"cum_before div ${budget}L"))
      .withColumn("pack_id",
        col("shard") * PackIdRadix + col("pack_in_shard"))
      .withColumn("offset_in_pack", pmod(col("cum_before"), lit(budget)))
      .withColumn("spans_boundary",
        col("offset_in_pack") + col("n_tokens") > budget)
  }

  /** TOKEN-WINDOW DOCUMENT CHUNKING — the context-window prep step
    * (long doc → overlapping `chunkSize`-token windows every `stride`
    * tokens, e.g. for embedding models or RAG indexing). One chunk per
    * start offset 0, stride, 2·stride, … while the offset is inside the
    * doc; the tail chunk may be short. Emits (doc_id, chunk_idx,
    * start_tok, chunk_tokens, chunk_text).
    *
    * SCALE SHAPE: pure scan — tokens, `sequence` over chunk starts,
    * one `posexplode`, `slice`+`array_join` per row; no shuffle, no
    * window, no interpreted HOF (slice/array_join/sequence are
    * codegen'd expressions). Work ∝ output chunks. Empty docs produce
    * no chunks (the `sequence(0,-1)` guard — same trap as frameSample). */
  def chunkDocuments(docs: DataFrame, id: Column, toks: Column,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride size=$chunkSize")
    docs.select(id.as("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(expr(s"sequence(0L, (n - 1) div ${stride}L)"))
          .as(Seq("chunk_idx", "k")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("k") * stride).as("start_tok"),
        slice(col("toks"), (col("k") * stride + 1).cast("int"),
          lit(chunkSize))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
