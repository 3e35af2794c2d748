package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — explode embeddings to
  * (id, pos, val) rows, equi-join query-side to corpus-side on `pos`,
  * aggregate dot products. Scores are computed over per-dimension
  * integer quantization (`round(double(v) * 1e6)` as long): float→double
  * widening, the multiply, and away-from-zero tie rounding are identical
  * in every engine, and the integer sums are exact — so scores and
  * rankings are bit-reproducible across engines (decimal casts of floats
  * are NOT: DuckDB rounds them through float arithmetic). Quantization
  * error is ~1e-6 on a unit-scale cosine — irrelevant for neighbor
  * ranking, and applied identically to both sides of every comparison.
  *
  * Scale path: brute force is O(|Q|·|C|); [[signLshTopK]] bounds
  * candidates by bucketing on the sign pattern of the leading dimensions
  * — a degenerate but real random-hyperplane LSH (axis-aligned
  * hyperplanes); production would use seeded random hyperplanes +
  * multi-probe, same plan shape: groupBy bucket, join within bucket. An
  * IVF variant = k-means centroids as buckets.
  */
object Similarity {

  /** Deterministic integer quantization of a float/double value. */
  def quant(c: Column): Column =
    round(c.cast("double") * 1000000).cast("long")

  /** (id, pos, qval) exploded + quantized view of an embeddings frame. */
  def exploded(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("id"), col("pos"), quant(col("v")).as("qval"))

  /** Exact integer squared-norms per id (÷1e12 deferred to the caller's
    * double math). */
  def sqNorms(expl: DataFrame): DataFrame =
    expl.groupBy("id")
      .agg(sum(col("qval") * col("qval")).as("sqnorm"))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def cosine(dot: Column, sqA: Column, sqB: Column): Column =
    dot.cast("double") / (sqrt(sqA.cast("double")) * sqrt(sqB.cast("double")))

  /** Brute-force cosine top-k of `queries` against `corpus` (both
    * (id, vec) frames), excluding self-matches. Deterministic ranking:
    * cosine DESC, candidate id ASC. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = exploded(queries, idCol, vecCol)
      .toDF("query_id", "pos", "qv")
    val c = exploded(corpus, idCol, vecCol)
      .toDF("cand_id", "pos", "cv")
    val dots = q.join(c, Seq("pos"))
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("qv") * col("cv")).as("dot"))
    val qn = sqNorms(exploded(queries, idCol, vecCol))
      .toDF("query_id", "q_sqnorm")
    val cn = sqNorms(exploded(corpus, idCol, vecCol))
      .toDF("cand_id", "c_sqnorm")
    val scored = dots.join(broadcast(qn), Seq("query_id"))
      .join(cn, Seq("cand_id"))
      .withColumn("cosine",
        cosine(col("dot"), col("q_sqnorm"), col("c_sqnorm")))
    rankTopK(scored, k).select("query_id", "cand_id", "cosine", "rank")
  }

  /** Sign-pattern bucket key over the first `bits` dimensions. */
  def signBucket(vecCol: String, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(col(vecCol), i + 1) >= 0, "1").otherwise("0")): _*)

  /** LSH-bucketed cosine top-k: candidates limited to the query's sign
    * bucket. Recall < 1 by construction; this is the scale path. */
  def signLshTopK(emb: DataFrame, queryIds: DataFrame, k: Int, bits: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.withColumn("bucket", signBucket(vecCol, bits))
    val qs = bucketed.join(broadcast(queryIds), Seq(idCol))
    // Candidate pairs FIRST (bucket equi-join); dot products only for
    // them — that's the point of the bucketing.
    val qb = qs.select(col(idCol).as("query_id"), col("bucket"))
    val cb = bucketed.select(col(idCol).as("cand_id"), col("bucket"))
    val candPairs = qb.join(cb, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
    val q = exploded(qs, idCol, vecCol).toDF("query_id", "pos", "qv")
    val c = exploded(bucketed, idCol, vecCol).toDF("cand_id", "pos", "cv")
    val dots = candPairs
      .join(q, Seq("query_id"))
      .join(c, Seq("cand_id", "pos"))
      .groupBy("query_id", "cand_id", "bucket")
      .agg(sum(col("qv") * col("cv")).as("dot"))
    val n = sqNorms(exploded(bucketed, idCol, vecCol))
    val scored = dots
      .join(broadcast(n.toDF("query_id", "q_sqnorm")), Seq("query_id"))
      .join(n.toDF("cand_id", "c_sqnorm"), Seq("cand_id"))
      .withColumn("cosine",
        cosine(col("dot"), col("q_sqnorm"), col("c_sqnorm")))
    rankTopK(scored, k)
      .select("query_id", "cand_id", "bucket", "cosine", "rank")
  }
}
