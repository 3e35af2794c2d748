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

  private[llm] def scoreAndRank(pairs: DataFrame, k: Int,
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

  /** CORPUS-VERSION EMBEDDING DRIFT — the population-stability check an
    * embedding pipeline runs between corpus snapshots (did the encoder
    * change, did the source mix shift): both snapshots bucket by the
    * same [[signBucket]] sign pattern, per-bucket counts are compared
    * with a CROSS-MULTIPLIED integer statistic
    * `|n_old·tot_new − n_new·tot_old|` — the exact-integer form of the
    * proportion difference |p_old − p_new| scaled by tot_old·tot_new
    * (the same integer cross-multiplication discipline as weighted
    * sampling), so the drift report is bit-identical across engines
    * with no float ratios. Scale shape: two scans + one 2^bits-row
    * full-outer join; totals broadcast. At 100 TB this is a metadata-
    * cheap nightly alarm on a mart of billions of vectors. */
  def embeddingDrift(oldEmb: DataFrame, newEmb: DataFrame,
                     bits: Int = 6,
                     vecCol: String = "embedding"): DataFrame = {
    def histo(df: DataFrame, as: String) =
      df.select(signBucket(vecCol, bits).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(as))
    val joined = histo(oldEmb, "n_old")
      .join(histo(newEmb, "n_new"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = joined.agg(sum("n_old").as("tot_old"),
      sum("n_new").as("tot_new"))
    joined.crossJoin(broadcast(tot))
      .withColumn("cross_diff",
        abs(col("n_old") * col("tot_new") - col("n_new") * col("tot_old")))
  }

  /** LSH-bucketed cosine top-k: candidates limited to the query's sign
    * bucket (bucket equi-join carries both vectors; scoring is a
    * per-row expression). Recall < 1 by construction. Degenerate
    * axis-aligned hyperplanes — kept as the simple baseline; the
    * production path is [[randomHyperplaneLshTopK]]. */
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

  private val highHex =
    Seq("8", "9", "a", "b", "c", "d", "e", "f").map(lit(_))

  /** Seeded random-hyperplane (Rademacher ±1) bucket signatures,
    * computed from exploded (id, pos, value) rows: bit j of the bucket
    * is the sign of Σ_d sgn(seed,j,d)·q(v_d), where sgn is a ±1 drawn
    * from md5(seed|j|pos) and q is the integer quantization
    * (round(double(v)·1e6)) — integer sums, so signatures are exact and
    * engine-portable. ONE codegen'd hash aggregate computes all `bits`
    * sums (same shape as SimHash's 32 conditional sums); no interpreted
    * higher-order functions. */
  def rademacherBuckets(emb: DataFrame, bits: Int, seed: String,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val rows = emb.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
    val q = round(col("v").cast("double") * 1e6).cast("long")
    def sgn(j: Int): Column =
      when(substring(md5(concat(lit(s"rh$seed|$j|"),
        col("pos").cast("string"))), 1, 1).isin(highHex: _*), 1L)
        .otherwise(-1L)
    val sums = (0 until bits).map(j => sum(q * sgn(j)).as(s"s$j"))
    rows.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol),
        concat((0 until bits).map(j =>
          when(col(s"s$j") >= 0, "1").otherwise("0")): _*).as("bucket"))
  }

  /** Bit-flip probes of a bucket string: the bucket itself (p=0) plus
    * each single-bit flip (p=1..bits). */
  private def probeExprs(bucket: Column, bits: Int): Seq[Column] =
    (0 to bits).map {
      case 0 => bucket
      case p =>
        concat(
          substring(bucket, 1, p - 1),
          when(substring(bucket, p, 1) === "1", "0").otherwise("1"),
          substring(bucket, p + 1, bits - p))
    }

  /** Production ANN path (the scale-hardened variant of
    * [[signLshTopK]]): seeded random hyperplanes instead of axis signs,
    * single-bit-flip MULTI-PROBE on the query side (recall back without
    * more tables), and a deterministic PER-BUCKET CANDIDATE CAP (first
    * `maxBucketSize` ids per bucket) so one hot bucket — real embedding
    * distributions concentrate mass in few sign patterns — can never go
    * quadratic: pairs per query ≤ (bits+1)·maxBucketSize regardless of
    * corpus skew. Probe-duplicate pairs are deduped before scoring. */
  def randomHyperplaneLshTopK(emb: DataFrame, queryIds: DataFrame, k: Int,
                              bits: Int, seed: String,
                              maxBucketSize: Int = Int.MaxValue,
                              multiProbe: Boolean = true,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    QuantDot.register(emb.sparkSession)
    val buckets = rademacherBuckets(emb, bits, seed, idCol, vecCol)
    val bucketed = emb.join(buckets, Seq(idCol))
    val capped =
      if (maxBucketSize == Int.MaxValue) bucketed
      else {
        val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
        bucketed.withColumn("cap_rn", row_number().over(w))
          .filter(col("cap_rn") <= maxBucketSize).drop("cap_rn")
      }
    val qSide = bucketed.join(broadcast(queryIds), Seq(idCol))
    val probed =
      if (multiProbe)
        qSide.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
          explode(array(probeExprs(col("bucket"), bits): _*)).as("bucket"))
      else
        qSide.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
          col("bucket"))
    val c = capped.select(col(idCol).as("cand_id"), col("bucket"),
      col(vecCol).as("c_vec"))
    // No pair dedup needed: the probe set (original + single-bit flips)
    // is pairwise-distinct and each candidate lives in exactly ONE
    // bucket, so a (query, cand) pair can match at most one probe — a
    // dropDuplicates here would shuffle every wide vector row for
    // nothing.
    val pairs = probed.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
    scoreAndRank(pairs, k, Seq.empty)
  }

  /** IVF (inverted-file) ANN top-k — the clustering alternative to the
    * hyperplane LSH path. Deterministic and oracle-portable in place of
    * iterative k-means: centroids are a stride-sample of the corpus
    * (every `centroidStride`-th id), each vector is assigned to its
    * nearest centroid by quantized cosine (ONE scan × broadcast
    * centroid table — the m ≪ n centroid list is the classic IVF coarse
    * quantizer shape), and each query probes its `nProbe` nearest
    * cells. Candidates are bounded by cell sizes; a vector lives in
    * exactly one cell and probe cells are distinct, so pairs are unique
    * without dedup. At 100 TB the same plan holds: centroid table
    * broadcast, assignment scan-shaped, candidate join keyed by cell. */
  def ivfTopK(emb: DataFrame, queryIds: DataFrame, k: Int,
              centroidStride: Int, nProbe: Int,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    QuantDot.register(emb.sparkSession)
    val cent = emb.filter(col(idCol) % centroidStride === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cent_vec"))
    val dot = expr(s"graft_quant_dot($vecCol, cent_vec)")
    val vSq = expr(s"graft_quant_dot($vecCol, $vecCol)")
    val cSq = expr("graft_quant_dot(cent_vec, cent_vec)")
    val scored = emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cent))
      .withColumn("c_cos",
        dot.cast("double") /
          (sqrt(vSq.cast("double")) * sqrt(cSq.cast("double"))))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("c_cos").desc, col("centroid_id"))
    val ranked = scored.withColumn("crank", row_number().over(w))
    val assign = ranked.filter(col("crank") === 1)
      .select(col(idCol).as("cand_id"), col("centroid_id"),
        col(vecCol).as("c_vec"))
    val probes = ranked.filter(col("crank") <= nProbe)
      .join(broadcast(queryIds), Seq(idCol))
      .select(col(idCol).as("query_id"), col("centroid_id"),
        col(vecCol).as("q_vec"))
    val pairs = probes.join(assign, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
    scoreAndRank(pairs, k, Seq.empty)
  }

  /** Embedding-cosine NEAR-DUP detection (the dedup-family variant of
    * the ANN path): same-bucket pairs (a < b) under the seeded
    * random-hyperplane signatures, scored with the quantized dot and
    * thresholded — identical/near-identical vectors always share a
    * bucket (identical signatures), so recall on true duplicates is 1
    * within quantization. Candidate generation is bounded by bucket
    * sizes (cap optional), never O(n²); pair-level canonical id is the
    * smaller member, feeding the same connected-components/canonical
    * step as the MinHash pairs. */
  def embeddingNearDups(emb: DataFrame, bits: Int, seed: String,
                        threshold: Double,
                        maxBucketSize: Int = Int.MaxValue,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    QuantDot.register(emb.sparkSession)
    val bucketed = emb.join(
      rademacherBuckets(emb, bits, seed, idCol, vecCol), Seq(idCol))
    val capped =
      if (maxBucketSize == Int.MaxValue) bucketed
      else {
        val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
        bucketed.withColumn("cap_rn", row_number().over(w))
          .filter(col("cap_rn") <= maxBucketSize).drop("cap_rn")
      }
    val l = capped.select(col("bucket"), col(idCol).as("doc_a"),
      col(vecCol).as("q_vec"))
    val r = capped.select(col("bucket"), col(idCol).as("doc_b"),
      col(vecCol).as("c_vec"))
    val dot = expr("graft_quant_dot(q_vec, c_vec)")
    val qSq = expr("graft_quant_dot(q_vec, q_vec)")
    val cSq = expr("graft_quant_dot(c_vec, c_vec)")
    l.join(r, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine",
        dot.cast("double") /
          (sqrt(qSq.cast("double")) * sqrt(cSq.cast("double"))))
      .filter(col("cosine") >= threshold)
      .withColumn("canonical_id", least(col("doc_a"), col("doc_b")))
      .select("doc_a", "doc_b", "cosine", "canonical_id")
  }
}
