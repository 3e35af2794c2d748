package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.QuantDot

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scoring uses the codegen'd [[graft.plans.QuantDot]] expression:
  * per-dimension integer quantization (`round(double(v)*1e6)` as long)
  * summed in a tight per-row loop. Integer math makes scores
  * bit-reproducible across engines (decimal casts of floats are not),
  * and the custom expression keeps pair scoring scan-shaped — the
  * composable explode-on-position/join/re-aggregate alternative
  * shuffles O(pairs × dims) rows.
  *
  * Scale path: brute force is O(|Q|·|C|) with the query side broadcast;
  * [[signLshTopK]] bounds candidates by bucketing on the sign pattern of
  * the leading dimensions — a degenerate but real random-hyperplane LSH
  * (axis-aligned hyperplanes); production would use seeded random
  * hyperplanes + multi-probe, same plan shape: bucket equi-join, score
  * within bucket. An IVF variant = k-means centroids as buckets.
  */
object Similarity {

  private def scoreAndRank(pairs: DataFrame, k: Int,
                           extraCols: Seq[String]): DataFrame = {
    val dot = expr("graft_quant_dot(q_vec, c_vec)")
    val qSq = expr("graft_quant_dot(q_vec, q_vec)")
    val cSq = expr("graft_quant_dot(c_vec, c_vec)")
    val scored = pairs
      .withColumn("cosine",
        dot.cast("double") /
          (sqrt(qSq.cast("double")) * sqrt(cSq.cast("double"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select((Seq("query_id", "cand_id") ++ extraCols ++
        Seq("cosine", "rank")).map(col): _*)
  }

  /** Brute-force cosine top-k of `queries` against `corpus` (both
    * (id, vec) frames), excluding self-matches. Deterministic ranking:
    * cosine DESC, candidate id ASC. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    QuantDot.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
    val pairs = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("cand_id"))
    scoreAndRank(pairs, k, Seq.empty)
  }

  /** Sign-pattern bucket key over the first `bits` dimensions. */
  def signBucket(vecCol: String, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(col(vecCol), i + 1) >= 0, "1").otherwise("0")): _*)

  /** LSH-bucketed cosine top-k: candidates limited to the query's sign
    * bucket (bucket equi-join carries both vectors; scoring is a
    * per-row expression). Recall < 1 by construction; the scale path. */
  def signLshTopK(emb: DataFrame, queryIds: DataFrame, k: Int, bits: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    QuantDot.register(emb.sparkSession)
    val bucketed = emb.withColumn("bucket", signBucket(vecCol, bits))
    val q = bucketed.join(broadcast(queryIds), Seq(idCol))
      .select(col(idCol).as("query_id"), col("bucket"),
        col(vecCol).as("q_vec"))
    val c = bucketed.select(col(idCol).as("cand_id"), col("bucket"),
      col(vecCol).as("c_vec"))
    val pairs = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
    scoreAndRank(pairs, k, Seq("bucket"))
  }
}
