package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{CorpusIndex, Dedup, Multimodal, NearDupIndex, Packing, Similarity, TextAnalysis => TA}

/** Training-data-pipeline operators (builder-prompt first-class set):
  * text analysis, dedup family, similarity search, multimodal plumbing —
  * all over the documents/embeddings tables, oracle-checked where
  * SQL-expressible.
  */
object LlmQueries {

  private val toksSql =
    """list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)"""

  /** Text analysis — token counting (whitespace + length stats). */
  val tTokens: Q = Q.sql(
    "t_text_tokens",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_measured,
      |  CASE WHEN len(toks) > 0
      |       THEN CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(toks)
      |       ELSE 0.0 END AS avg_token_len
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = TA.tokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_measured"),
      when(size(toks) > 0,
        length(regexp_replace(col("text"), "\\s", "")).cast("double")
          / size(toks)).otherwise(0.0).as("avg_token_len"))
      .orderBy("doc_id")
  }

  /** Text analysis — n-gram/marker-word language ID heuristic. */
  val tLangId: Q = {
    val markerSql = TA.langMarkers.map { case (code, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(toks, x -> list_contains($lst, x))) AS BIGINT) AS ${code}_hits"
    }.mkString(",\n      |  ")
    Q.sql(
      "t_text_langid",
      s"""WITH t AS (
        |  SELECT doc_id, lang, $toksSql AS toks FROM documents
        |), h AS (
        |  SELECT doc_id, lang, $markerSql
        |  FROM t
        |), b AS (
        |  SELECT *, GREATEST(en_hits, es_hits, de_hits, fr_hits) AS best FROM h
        |)
        |SELECT doc_id, lang AS labeled_lang, en_hits, es_hits, de_hits, fr_hits,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN en_hits = best THEN 'en'
        |       WHEN es_hits = best THEN 'es'
        |       WHEN de_hits = best THEN 'de'
        |       ELSE 'fr' END AS predicted_lang
        |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = TA.tokens(col("text"))
      val withHits = Tables.documents(s, d).select(
        Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
          TA.langMarkers.map { case (code, ws) =>
            TA.markerHits(toks, ws).cast("long").as(s"${code}_hits")
          }: _*)
      val best = greatest(col("en_hits"), col("es_hits"), col("de_hits"),
        col("fr_hits"))
      withHits.withColumn("predicted_lang",
        when(best === 0, "und")
          .when(col("en_hits") === best, "en")
          .when(col("es_hits") === best, "es")
          .when(col("de_hits") === best, "de")
          .otherwise("fr"))
        .orderBy("doc_id")
    }
  }

  /** Text analysis — BPE-ish sub-word token counting (letter runs,
    * digit runs, single marks — the dialect-safe pre-tokenizer core),
    * with per-class counts. */
  val tTokensBpe: Q = Q.sql(
    "t_text_tokens_bpe",
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpeish,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_alpha_runs,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
      |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS BIGINT) AS n_marks
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      TA.bpeishCount(col("text")).cast("long").as("n_bpeish"),
      TA.bpeishCount(col("text"), "[a-zA-Z]+").cast("long")
        .as("n_alpha_runs"),
      TA.bpeishCount(col("text"), "[0-9]+").cast("long")
        .as("n_digit_runs"),
      TA.bpeishCount(col("text"), "[^a-zA-Z0-9\\s]").cast("long")
        .as("n_marks"))
      .orderBy("doc_id")
  }

  /** Tokenizer training — one distributed BPE pair-count round: global
    * adjacent-pair frequencies over the BPE-ish pre-tokens, deterministic
    * top-50 (count desc, pair asc — total order, engine-stable limit).
    * DuckDB twin builds the pairs by direct list indexing
    * (`toks[i]`/`toks[i+1]` zipped via parallel unnest); Spark uses the
    * codegen'd posexplode + lead-window row form (HOFs are interpreted). */
  val tBpePairCounts: Q = Q.sql(
    "t_bpe_pair_counts",
    """WITH t AS (
      |  SELECT regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]') AS toks
      |  FROM documents
      |), p AS (
      |  SELECT
      |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS left_tok,
      |    unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS right_tok
      |  FROM t
      |)
      |SELECT left_tok, right_tok, CAST(COUNT(*) AS BIGINT) AS pair_count
      |FROM p GROUP BY left_tok, right_tok
      |ORDER BY pair_count DESC, left_tok, right_tok LIMIT 50""".stripMargin) {
    (s, d) =>
      TA.bpePairStats(Tables.documents(s, d), col("doc_id"), col("text"),
        k = 50)
  }

  /** Text analysis — quality scoring (length/punct/stopword/diversity). */
  val tQuality: Q = Q.sql(
    "t_text_quality",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CASE WHEN length(text) > 0
      |         THEN CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
      |         ELSE 0.0 END AS punct_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','for','on','with'], x))) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS distinct_token_ratio
      |  FROM t
      |)
      |SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, distinct_token_ratio,
      |  LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      |    + (1.0 - punct_ratio) * 0.2 + stopword_ratio * 0.2
      |    + distinct_token_ratio * 0.2 AS quality_score
      |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
    TA.withQuality(Tables.documents(s, d), col("text"))
      .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
        "distinct_token_ratio", "quality_score")
      .orderBy("doc_id")
  }

  /** Corpus-hygiene threshold — keep the top 3/4 of documents by the
    * composite quality score, EXACT quantile at scale: score-value
    * histogram + descending cumulative (a window over distinct
    * quantized scores, never corpus rows), threshold re-broadcast as
    * one row; ties at the threshold kept. Integer-exact: quantized
    * score, cross-multiplied target predicate `cum·4 ≥ n·3` — no
    * division in either engine. */
  /** QUALITY-DECILE PROFILE — the signal-correlation report a corpus
    * curator reads before picking thresholds: docs bucketed into score
    * deciles (histogram-based — thresholds from the cumulative
    * distribution over DISTINCT quantized scores, so equal scores
    * share a decile and the plan never sorts the corpus; 9 broadcast
    * thresholds assign deciles scan-side), each decile profiled with
    * its exact-duplicate rate and token mass. Crossing dedup state
    * with the quality signal is the point: if low deciles aren't
    * duplicate-heavier, the score isn't measuring what the pipeline
    * assumes. All integer counts under the gate. */
  val tQualityDecileProfile: Q = Q.sql(
    "t_quality_decile_profile",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CASE WHEN length(text) > 0
      |         THEN CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
      |         ELSE 0.0 END AS punct_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','for','on','with'], x))) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS distinct_token_ratio
      |  FROM t
      |), q AS (
      |  SELECT doc_id, n_tokens, CAST(ROUND((
      |    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      |      + (1.0 - punct_ratio) * 0.2 + stopword_ratio * 0.2
      |      + distinct_token_ratio * 0.2) * 1000000) AS BIGINT) AS qscore
      |  FROM f
      |), dup AS (
      |  SELECT doc_id,
      |    doc_id <> MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text))))
      |      AS is_dup
      |  FROM t
      |), hist AS (
      |  SELECT qscore, CAST(COUNT(*) AS BIGINT) AS cnt FROM q GROUP BY 1
      |), cum AS (
      |  SELECT qscore, CAST(SUM(cnt) OVER (ORDER BY qscore
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum
      |  FROM hist
      |), tot AS (
      |  SELECT MAX(cum) AS n_total FROM cum
      |), thr AS (
      |  SELECT k, MIN(qscore) AS t_k
      |  FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k),
      |    tot
      |  WHERE cum * 10 >= n_total * k
      |  GROUP BY k
      |), dec AS (
      |  SELECT q.doc_id, q.n_tokens, q.qscore,
      |    CAST(1 + (SELECT COUNT(*) FROM thr WHERE q.qscore > thr.t_k)
      |      AS BIGINT) AS decile
      |  FROM q
      |)
      |SELECT dec.decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN dup.is_dup THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dups,
      |  CAST(SUM(dec.n_tokens) AS BIGINT) AS sum_tokens,
      |  MIN(dec.qscore) AS min_qscore, MAX(dec.qscore) AS max_qscore
      |FROM dec JOIN dup ON dup.doc_id = dec.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val toks = TA.tokens(col("text"))
    val q = TA.withQuality(docs, col("text"))
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        round(col("quality_score") * 1e6).cast("long").as("qscore"))
    val dup = docs.select(col("doc_id"),
      (col("doc_id") =!= min(col("doc_id")).over(
        Window.partitionBy(md5(lower(trim(col("text"))))))).as("is_dup"))
    val hist = q.groupBy("qscore").agg(count(lit(1)).cast("long").as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("qscore"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    val tot = cum.agg(max(col("cum")).as("n_total"))
    val ks = s.range(1, 10).select(col("id").as("k"))
    val thr = cum.crossJoin(broadcast(ks)).crossJoin(broadcast(tot))
      .filter(col("cum") * 10 >= col("n_total") * col("k"))
      .groupBy("k").agg(min(col("qscore")).as("t_k"))
    // decile = 1 + #thresholds below: a 9-row broadcast theta-join
    // (HOFs over a literal array would leave codegen — README rule)
    val dec = q.join(broadcast(thr), col("qscore") > col("t_k"), "left")
      .groupBy("doc_id", "n_tokens", "qscore")
      .agg((lit(1L) + count(col("t_k"))).cast("long").as("decile"))
    dec.join(dup, Seq("doc_id"))
      .groupBy("decile")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).cast("long")
          .as("n_dups"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        min(col("qscore")).as("min_qscore"),
        max(col("qscore")).as("max_qscore"))
      .orderBy("decile")
  }

  /** CURRICULUM ORDERING — the training-schedule construction built
    * from two existing primitives: docs are banded by quality decile
    * (same histogram thresholds as `t_quality_decile_profile`) and
    * SHUFFLED within each band by the seeded portable hash (the
    * corpusShuffle discipline — reproducible, no rand()), yielding a
    * total order easy→hard (or the reverse) with randomness inside
    * each difficulty band. Emits (doc_id, band, band_pos); a writer
    * consuming this order materializes the curriculum. Window is
    * partitioned per band (bounded partitions), never a global sort
    * of the corpus by hash. */
  val tCurriculumOrder: Q = Q.sql(
    "t_curriculum_order",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CASE WHEN length(text) > 0
      |         THEN CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
      |         ELSE 0.0 END AS punct_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','for','on','with'], x))) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS distinct_token_ratio
      |  FROM t
      |), q AS (
      |  SELECT doc_id, CAST(ROUND((
      |    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      |      + (1.0 - punct_ratio) * 0.2 + stopword_ratio * 0.2
      |      + distinct_token_ratio * 0.2) * 1000000) AS BIGINT) AS qscore
      |  FROM f
      |), hist AS (
      |  SELECT qscore, CAST(COUNT(*) AS BIGINT) AS cnt FROM q GROUP BY 1
      |), cum AS (
      |  SELECT qscore, CAST(SUM(cnt) OVER (ORDER BY qscore
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum
      |  FROM hist
      |), tot AS (
      |  SELECT MAX(cum) AS n_total FROM cum
      |), thr AS (
      |  SELECT k, MIN(qscore) AS t_k
      |  FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k),
      |    tot
      |  WHERE cum * 10 >= n_total * k
      |  GROUP BY k
      |), banded AS (
      |  SELECT q.doc_id, q.qscore,
      |    CAST(1 + (SELECT COUNT(*) FROM thr WHERE q.qscore > thr.t_k)
      |      AS BIGINT) AS band
      |  FROM q
      |)
      |SELECT doc_id, band,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY band
      |    ORDER BY md5('cur1|' || CAST(doc_id AS VARCHAR)), doc_id)
      |    AS BIGINT) AS band_pos
      |FROM banded
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val q = TA.withQuality(docs, col("text"))
      .select(col("doc_id"),
        round(col("quality_score") * 1e6).cast("long").as("qscore"))
    val hist = q.groupBy("qscore").agg(count(lit(1)).cast("long").as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("qscore"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    val tot = cum.agg(max(col("cum")).as("n_total"))
    val ks = s.range(1, 10).select(col("id").as("k"))
    val thr = cum.crossJoin(broadcast(ks)).crossJoin(broadcast(tot))
      .filter(col("cum") * 10 >= col("n_total") * col("k"))
      .groupBy("k").agg(min(col("qscore")).as("t_k"))
    val banded = q.join(broadcast(thr), col("qscore") > col("t_k"), "left")
      .groupBy("doc_id", "qscore")
      .agg((lit(1L) + count(col("t_k"))).cast("long").as("band"))
    banded.select(col("doc_id"), col("band"),
        row_number().over(Window.partitionBy(col("band"))
          .orderBy(md5(concat(lit("cur1|"), col("doc_id").cast("string"))),
            col("doc_id")))
          .cast("long").as("band_pos"))
      .orderBy("doc_id")
  }

  val tQualityQuantile: Q = Q.sql(
    "t_quality_quantile",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CASE WHEN length(text) > 0
      |         THEN CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
      |         ELSE 0.0 END AS punct_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','for','on','with'], x))) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS distinct_token_ratio
      |  FROM t
      |), q AS (
      |  SELECT doc_id, CAST(ROUND((
      |    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      |      + (1.0 - punct_ratio) * 0.2 + stopword_ratio * 0.2
      |      + distinct_token_ratio * 0.2) * 1000000) AS BIGINT) AS qscore
      |  FROM f
      |), hist AS (
      |  SELECT qscore, CAST(COUNT(*) AS BIGINT) AS cnt FROM q GROUP BY 1
      |), cum AS (
      |  SELECT qscore, CAST(SUM(cnt) OVER (ORDER BY qscore DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM hist
      |), tot AS (
      |  SELECT MAX(cum) AS n_total FROM cum
      |), thr AS (
      |  SELECT MAX(qscore) AS threshold FROM cum, tot
      |  WHERE cum * 4 >= n_total * 3
      |)
      |SELECT q.doc_id, q.qscore, thr.threshold,
      |  (q.qscore >= thr.threshold) AS is_kept
      |FROM q, thr ORDER BY q.doc_id""".stripMargin) { (s, d) =>
    val scored = TA.withQuality(Tables.documents(s, d), col("text"))
      .select(col("doc_id"),
        round(col("quality_score") * 1e6).cast("long").as("qscore"))
    TA.quantileKeep(scored, "qscore", keepNum = 3, keepDen = 4)
      .select("doc_id", "qscore", "threshold", "is_kept")
      .orderBy("doc_id")
  }

  /** ROBUST OUTLIER FLAGGING — MAD rule over the quality score: both
    * medians (value, then absolute deviation) computed exactly from
    * histograms over DISTINCT quantized scores (never a corpus row
    * sort), every comparison integer, so the robust-z flag is
    * hash-gated per doc. k=2: on this corpus ~uniform quality scores
    * put the max deviation near 2·MAD, so the flag isolates exactly
    * the distribution's tails. */
  val tMadOutliers: Q = Q.sql(
    "t_mad_outliers",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |), f AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CASE WHEN length(text) > 0
      |         THEN CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
      |         ELSE 0.0 END AS punct_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','for','on','with'], x))) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS distinct_token_ratio
      |  FROM t
      |), q AS (
      |  SELECT doc_id, CAST(ROUND((
      |    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      |      + (1.0 - punct_ratio) * 0.2 + stopword_ratio * 0.2
      |      + distinct_token_ratio * 0.2) * 1000000) AS BIGINT) AS qscore
      |  FROM f
      |), hist1 AS (
      |  SELECT qscore AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM q GROUP BY 1
      |), cum1 AS (
      |  SELECT v, CAST(SUM(cnt) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum
      |  FROM hist1
      |), tot1 AS (
      |  SELECT MAX(cum) AS n FROM cum1
      |), medc AS (
      |  SELECT MIN(v) AS med FROM cum1, tot1 WHERE cum * 2 >= n
      |), devs AS (
      |  SELECT q.doc_id, q.qscore, ABS(q.qscore - medc.med) AS dev,
      |    medc.med
      |  FROM q, medc
      |), hist2 AS (
      |  SELECT dev AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM devs GROUP BY 1
      |), cum2 AS (
      |  SELECT v, CAST(SUM(cnt) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum
      |  FROM hist2
      |), tot2 AS (
      |  SELECT MAX(cum) AS n FROM cum2
      |), madc AS (
      |  SELECT MIN(v) AS mad FROM cum2, tot2 WHERE cum * 2 >= n
      |)
      |SELECT d.doc_id, d.qscore, d.dev, d.med, madc.mad,
      |  (d.dev > 2 * madc.mad) AS is_outlier
      |FROM devs d, madc ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val scored = TA.withQuality(Tables.documents(s, d), col("text"))
      .select(col("doc_id"),
        round(col("quality_score") * 1e6).cast("long").as("qscore"))
    TA.madOutliers(scored, "qscore", k = 2)
      .select("doc_id", "qscore", "dev", "med", "mad", "is_outlier")
      .orderBy("doc_id")
  }

  /** Per-LANGUAGE exact quantile threshold (the CCNet per-bucket
    * discipline): each language keeps its own top 3/4 by quality, so
    * low-resource languages are not drowned by a global cutoff. Same
    * histogram + partitioned-cumulative plan as `t_quality_quantile`,
    * thresholds joined back group-keyed. */
  val tQualityQuantileByLang: Q = Q.sql(
    "t_quality_quantile_by_lang",
    s"""WITH t AS (
      |  SELECT doc_id, lang, text, $toksSql AS toks FROM documents
      |), f AS (
      |  SELECT doc_id, lang,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CASE WHEN length(text) > 0
      |         THEN CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
      |         ELSE 0.0 END AS punct_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','for','on','with'], x))) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN len(toks) > 0
      |         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |         ELSE 0.0 END AS distinct_token_ratio
      |  FROM t
      |), q AS (
      |  SELECT doc_id, lang, CAST(ROUND((
      |    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      |      + (1.0 - punct_ratio) * 0.2 + stopword_ratio * 0.2
      |      + distinct_token_ratio * 0.2) * 1000000) AS BIGINT) AS qscore
      |  FROM f
      |), hist AS (
      |  SELECT lang, qscore, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM q GROUP BY 1, 2
      |), cum AS (
      |  SELECT lang, qscore, CAST(SUM(cnt) OVER (PARTITION BY lang
      |    ORDER BY qscore DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM hist
      |), tot AS (
      |  SELECT lang, MAX(cum) AS n_total FROM cum GROUP BY lang
      |), thr AS (
      |  SELECT cum.lang, MAX(qscore) AS threshold
      |  FROM cum JOIN tot ON tot.lang = cum.lang
      |  WHERE cum * 4 >= n_total * 3
      |  GROUP BY cum.lang
      |)
      |SELECT q.doc_id, q.lang, q.qscore, thr.threshold,
      |  (q.qscore >= thr.threshold) AS is_kept
      |FROM q JOIN thr ON thr.lang = q.lang
      |ORDER BY q.doc_id""".stripMargin) { (s, d) =>
    val scored = TA.withQuality(Tables.documents(s, d), col("text"))
      .select(col("doc_id"), col("lang"),
        round(col("quality_score") * 1e6).cast("long").as("qscore"))
    TA.groupedQuantileKeep(scored, "lang", "qscore",
      keepNum = 3, keepDen = 4)
      .select("doc_id", "lang", "qscore", "threshold", "is_kept")
      .orderBy("doc_id")
  }

  /** Round CTEs for the DuckDB twin of [[TA.bpeTrainApply]]: per round
    * t, `p{t}` pairs symbols with LEAD, `top{t}` learns the most
    * frequent pair (count DESC, binary pair order), `pr{t}` marks the
    * greedy-leftmost applications via gaps-and-islands parity, and
    * `r{t}` drops right halves and renumbers. Expects `r0` =
    * (doc_id, tok_idx, pos, sym). */
  private def bpeRoundCtes(rounds: Int,
                           fixed: Seq[(String, String)] = Nil): String = {
    val sb = new StringBuilder
    for (t <- 1 to rounds) {
      val topSql =
        if (fixed.nonEmpty) {
          // apply-only: the merge table is given, not learned
          val (l, r) = fixed(t - 1)
          s"SELECT '$l' AS m_l, '$r' AS m_r"
        } else
          s"""SELECT sym AS m_l, nxt AS m_r FROM (
        |    SELECT sym, nxt, COUNT(*) AS pc FROM p$t
        |    WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |  ORDER BY pc DESC, sym, nxt LIMIT 1""".stripMargin
      sb ++= s""", p$t AS (
        |  SELECT doc_id, tok_idx, pos, sym, LEAD(sym) OVER (
        |    PARTITION BY doc_id, tok_idx ORDER BY pos) AS nxt
        |  FROM r${t - 1}
        |), top$t AS (
        |  $topSql
        |), m$t AS (
        |  SELECT p.*, (p.sym = t.m_l AND p.nxt = t.m_r) AS is_pair
        |  FROM p$t p, top$t t
        |), pr$t AS (
        |  SELECT doc_id, tok_idx, pos, (ROW_NUMBER() OVER (
        |    PARTITION BY doc_id, tok_idx, grp ORDER BY pos) % 2 = 1)
        |    AS do_merge
        |  FROM (
        |    SELECT doc_id, tok_idx, pos, pos - ROW_NUMBER() OVER (
        |      PARTITION BY doc_id, tok_idx ORDER BY pos) AS grp
        |    FROM m$t WHERE is_pair)
        |), a$t AS (
        |  SELECT doc_id, tok_idx, pos, sym, nxt, do_merge,
        |    COALESCE(LAG(do_merge) OVER (
        |      PARTITION BY doc_id, tok_idx ORDER BY pos), FALSE)
        |      AS prev_dm
        |  FROM (
        |    SELECT m.doc_id, m.tok_idx, m.pos, m.sym, m.nxt,
        |      COALESCE(pr.do_merge, FALSE) AS do_merge
        |    FROM m$t m LEFT JOIN pr$t pr
        |      ON pr.doc_id = m.doc_id AND pr.tok_idx = m.tok_idx
        |     AND pr.pos = m.pos)
        |), r$t AS (
        |  SELECT doc_id, tok_idx, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id, tok_idx ORDER BY pos) AS pos,
        |    CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
        |  FROM a$t WHERE NOT prev_dm
        |)""".stripMargin
    }
    sb.toString
  }

  /** Tokenizer training + application — two full distributed BPE
    * rounds: learn the globally most frequent adjacent symbol pair,
    * apply it greedy-leftmost inside pre-token boundaries, renumber,
    * repeat on the merged symbols. Both engines replay the identical
    * two-round chain (learned merges included in the output), so
    * training AND application are hash-gated end to end. */
  val tBpeTrainApply: Q = Q.sql(
    "t_bpe_train_apply",
    s"""WITH tk AS (
      |  SELECT doc_id, tok_idx, tok FROM (
      |    SELECT doc_id,
      |      unnest(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS tok,
      |      unnest(generate_series(1, len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))) AS tok_idx
      |    FROM documents)
      |), r0 AS (
      |  SELECT doc_id, tok_idx, i AS pos, substr(tok, i, 1) AS sym
      |  FROM (SELECT doc_id, tok_idx, tok,
      |          unnest(generate_series(1, length(tok))) AS i
      |        FROM tk)
      |)${bpeRoundCtes(2)}
      |, bef AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_syms_before
      |  FROM r0 GROUP BY 1
      |), aft AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_syms_after
      |  FROM r2 GROUP BY 1
      |)
      |SELECT bef.doc_id, n_syms_before, n_syms_after,
      |  (SELECT m_l || '+' || m_r FROM top1) AS merge_1,
      |  (SELECT m_l || '+' || m_r FROM top2) AS merge_2
      |FROM bef JOIN aft ON aft.doc_id = bef.doc_id
      |ORDER BY bef.doc_id""".stripMargin) { (s, d) =>
    TA.bpeTrainApply(Tables.documents(s, d), col("doc_id"), col("text"),
      rounds = 2)
      .select("doc_id", "n_syms_before", "n_syms_after",
        "merge_1", "merge_2")
      .orderBy("doc_id")
  }

  /** Fixed merge table for the tokenizer-APPLY oracle: the corpus's own
    * first learned merges (e+r, then the chained er+e — exercises a
    * merge whose left half is itself a merged symbol) plus two common
    * English pairs. */
  private val ApplyMerges =
    Seq(("e", "r"), ("er", "e"), ("i", "n"), ("a", "n"))

  /** Tokenizer APPLY — tokenize with a FIXED learned merge table (the
    * merges.txt serving path: train once, apply everywhere). Both
    * engines replay the identical 4-merge chain from literal pairs —
    * no counting, no top-1 — and report per-doc symbol totals plus the
    * per-merge output-symbol counts, so the application semantics
    * (greedy leftmost, rank order, pre-token boundaries) are hash-gated
    * without the training half. */
  val tBpeApplyMerges: Q = Q.sql(
    "t_bpe_apply_merges",
    s"""WITH tk AS (
      |  SELECT doc_id, tok_idx, tok FROM (
      |    SELECT doc_id,
      |      unnest(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS tok,
      |      unnest(generate_series(1, len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))) AS tok_idx
      |    FROM documents)
      |), r0 AS (
      |  SELECT doc_id, tok_idx, i AS pos, substr(tok, i, 1) AS sym
      |  FROM (SELECT doc_id, tok_idx, tok,
      |          unnest(generate_series(1, length(tok))) AS i
      |        FROM tk)
      |)${bpeRoundCtes(ApplyMerges.size, ApplyMerges)}
      |, bef AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_syms_before
      |  FROM r0 GROUP BY 1
      |), aft AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_syms_after,
      |${ApplyMerges.zipWithIndex.map { case ((l, r), i) =>
            s"    CAST(SUM(CASE WHEN sym = '$l$r' THEN 1 ELSE 0 END) " +
              s"AS BIGINT) AS n_merge_${i + 1}"
          }.mkString(",\n")}
      |  FROM r${ApplyMerges.size} GROUP BY 1
      |)
      |SELECT bef.doc_id, n_syms_before, n_syms_after,
      |  ${ApplyMerges.indices.map(i => s"n_merge_${i + 1}").mkString(", ")}
      |FROM bef JOIN aft ON aft.doc_id = bef.doc_id
      |ORDER BY bef.doc_id""".stripMargin) { (s, d) =>
    TA.bpeApplyMerges(Tables.documents(s, d), col("doc_id"), col("text"),
      ApplyMerges)
      .orderBy("doc_id")
  }

  /** COUNT-MIN SKETCH — fixed-size frequency summary (d=3 hash rows ×
    * w=1024 buckets) built in one scan + one map-side-combined
    * aggregate over the corpus 3-GRAM stream (tens of thousands of
    * distinct shingles ⇒ real bucket collisions at w=1024 — the
    * documents vocabulary alone is only 31 tokens, which would make
    * the sketch trivially exact), then point-estimates for the exact
    * top-20. The CM guarantee (estimate ≥ true count, overshoot ≤
    * corpus/w per row) is hash-gated row by row: both engines build
    * the sketch from the same engine-portable md5→hex6 bucket hashing,
    * so counters — collisions included — are bit-identical. */
  val tCountMin: Q = {
    import graft.llm.Sketches
    val (d2, w2) = (3, 1024)
    def bucketUnion(src: String): String =
      (0 until d2).map(i =>
        s"SELECT token, $i AS hash_idx, " +
          s"${Sketches.cmBucketSql(i, "token", w2)} AS bucket FROM $src")
        .mkString("\n      |  UNION ALL ")
    Q.sql(
      "t_countmin_topk",
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), tok AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS token
        |  FROM t
        |), hashed AS (
        |  ${bucketUnion("tok")}
        |), sk AS (
        |  SELECT hash_idx, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM hashed GROUP BY 1, 2
        |), c AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM tok GROUP BY 1
        |), top AS (
        |  SELECT token, freq, CAST(ROW_NUMBER() OVER (
        |    ORDER BY freq DESC, token) AS BIGINT) AS rank
        |  FROM c QUALIFY rank <= 20
        |), probes AS (
        |  ${bucketUnion("top")}
        |), est AS (
        |  SELECT probes.token, MIN(sk.cnt) AS cm_estimate
        |  FROM probes JOIN sk USING (hash_idx, bucket)
        |  GROUP BY 1
        |)
        |SELECT tp.rank, tp.token, tp.freq, e.cm_estimate
        |FROM top tp JOIN est e ON e.token = tp.token
        |ORDER BY tp.rank""".stripMargin) { (s, d) =>
      val tokens = TA.shingleRows(Tables.documents(s, d),
        col("doc_id"), col("text"), 3)
        .select(col("shingle").as("token"))
      val sketch = Sketches.countMinSketch(tokens, "token", d2, w2)
      val counts = tokens.groupBy("token")
        .agg(count(lit(1)).cast("long").as("freq"))
      val top = counts
        .orderBy(col("freq").desc, col("token")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("freq").desc, col("token"))).cast("long"))
      val est = Sketches.countMinEstimate(sketch,
        top.select("token"), "token", d2, w2)
      top.join(est, Seq("token"))
        .select(col("rank"), col("token"), col("freq"),
          col("cm_estimate"))
        .orderBy("rank")
    }
  }

  /** HYPERLOGLOG — fixed-size distinct-cardinality sketch (m=256
    * registers, ~6.5% standard error) over the corpus 3-GRAM stream
    * (tens of thousands of distinct shingles — far above the 2.5·m
    * small-range threshold, so the raw estimator is in its valid
    * regime and every register is touched; the 31-token vocabulary
    * would sit in linear-counting territory where the raw estimator is
    * honest-to-goodness wrong). Register state is per-register MAX of
    * the leading-zero rank of the portable hash, merged across
    * partitions by the aggregate itself (max is the merge). The
    * register sum is carried as the exact integer Σ2^(maxρ−ρ) so the
    * whole sketch state is hash-gated; the closing α·m²·2^maxρ/S is
    * one correctly-rounded IEEE divide of identical inputs, estimate
    * gated too, next to the exact distinct count it approximates. */
  val tHll: Q = {
    import graft.llm.Sketches
    val m2 = 256
    val bits = Sketches.hllValueBits(m2) // 16
    val maxRho = bits + 1
    Q.sql(
      "t_hll_distinct",
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), tok AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS token
        |  FROM t
        |), h AS (
        |  SELECT ${TA.hex6Expr("md5(token)")} AS hv FROM tok
        |), regs AS (
        |  SELECT hv % $m2 AS reg,
        |    MAX(${Sketches.rhoSql(s"(hv // $m2)", bits)}) AS max_rho
        |  FROM h GROUP BY 1
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_registers,
        |    CAST(SUM(CAST(1 AS BIGINT) << ($maxRho - max_rho))
        |      AS BIGINT) AS s_present
        |  FROM regs
        |)
        |SELECT CAST($m2 AS BIGINT) AS m,
        |  (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) FROM tok)
        |    AS n_exact,
        |  n_registers,
        |  CAST(s_present + ($m2 - n_registers) * ${1L << maxRho}
        |    AS BIGINT) AS sum_scaled,
        |  CAST(ROUND(${Sketches.hllNumerator(m2)} /
        |    CAST(s_present + ($m2 - n_registers) * ${1L << maxRho}
        |      AS DOUBLE)) AS BIGINT) AS estimate
        |FROM agg""".stripMargin) { (s, d) =>
      val tokens = TA.shingleRows(Tables.documents(s, d),
        col("doc_id"), col("text"), 3)
        .select(col("shingle").as("token"))
      val exact = tokens.agg(
        count_distinct(col("token")).cast("long").as("n_exact"))
      Sketches.hllEstimate(Sketches.hllRegisters(tokens, "token", m2), m2)
        .crossJoin(broadcast(exact))
        .select("m", "n_exact", "n_registers", "sum_scaled", "estimate")
    }
  }

  /** HLL MERGEABILITY — the property that makes the sketch a 100 TB
    * tool: registers built independently per source (per partition,
    * per day, per shard...) merge by per-register MAX into exactly the
    * registers a direct global build produces, so a corpus-wide
    * distinct count is a rollup over tiny per-shard states instead of
    * a re-scan. This query proves the algebra under the hash gate:
    * 20 per-source estimates, their MAX-merge, and the independent
    * direct build — the `__merged__` and `__direct__` rows must be
    * identical, and both engines must agree on all 22. Same portable
    * integer register state as [[tHll]] (see that scaladoc). */
  val tHllMerge: Q = {
    import graft.llm.Sketches
    val m2 = 256
    val bits = Sketches.hllValueBits(m2) // 16
    val maxRho = bits + 1
    val numer = Sketches.hllNumerator(m2)
    def estSql(regsRel: String, scopeExpr: String, groupBy: String) =
      s"""SELECT $scopeExpr AS scope, CAST(COUNT(*) AS BIGINT) AS n_registers,
        |    CAST(SUM(CAST(1 AS BIGINT) << ($maxRho - max_rho))
        |      AS BIGINT) AS s_present
        |  FROM $regsRel $groupBy""".stripMargin
    Q.sql(
      "t_hll_merge",
      s"""WITH t AS (
        |  SELECT source, $toksSql AS toks FROM documents
        |), tok AS (
        |  SELECT source,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS token
        |  FROM t
        |), h AS (
        |  SELECT source, ${TA.hex6Expr("md5(token)")} AS hv FROM tok
        |), regs AS (
        |  SELECT source, hv % $m2 AS reg,
        |    MAX(${Sketches.rhoSql(s"(hv // $m2)", bits)}) AS max_rho
        |  FROM h GROUP BY 1, 2
        |), merged_regs AS (
        |  SELECT reg, MAX(max_rho) AS max_rho FROM regs GROUP BY 1
        |), direct_regs AS (
        |  SELECT hv % $m2 AS reg,
        |    MAX(${Sketches.rhoSql(s"(hv // $m2)", bits)}) AS max_rho
        |  FROM h GROUP BY 1
        |), pre AS (
        |  ${estSql("regs", "source", "GROUP BY 1")}
        |  UNION ALL
        |  ${estSql("merged_regs", "'__merged__'", "")}
        |  UNION ALL
        |  ${estSql("direct_regs", "'__direct__'", "")}
        |)
        |SELECT scope, n_registers,
        |  CAST(s_present + ($m2 - n_registers) * ${1L << maxRho}
        |    AS BIGINT) AS sum_scaled,
        |  CAST(ROUND($numer /
        |    CAST(s_present + ($m2 - n_registers) * ${1L << maxRho}
        |      AS DOUBLE)) AS BIGINT) AS estimate
        |FROM pre
        |ORDER BY scope""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tokens = TA.shingleRows(docs, col("doc_id"), col("text"), 3)
        .join(broadcast(docs.select(col("doc_id"), col("source"))),
          Seq("doc_id"))
        .select(col("source"), col("shingle").as("token"))
      // per-(source, reg) state: ONE grouped aggregate, ≤ sources·m rows
      val regs = tokens
        .select(col("source"), md5(col("token")).as("hhex"))
        .select(col("source"), expr(TA.hex6Expr("hhex")).as("hv"))
        .select(col("source"),
          expr(s"cast(hv % $m2 as bigint)").as("reg"),
          expr(s"hv div $m2").as("wv"))
        .select(col("source"), col("reg"),
          expr(Sketches.rhoSql("wv", bits)).as("rho"))
        .groupBy(col("source"), col("reg"))
        .agg(max(col("rho")).cast("long").as("max_rho"))
      def estimate(rs: DataFrame,
                   scope: org.apache.spark.sql.Column): DataFrame =
        rs.groupBy(scope.as("scope"))
          .agg(count(lit(1)).cast("long").as("n_registers"),
            sum(expr(s"shiftleft(1L, $maxRho - cast(max_rho as int))"))
              .cast("long").as("s_present"))
          .select(col("scope"), col("n_registers"),
            (col("s_present") + (lit(m2.toLong) - col("n_registers")) *
              lit(1L << maxRho)).as("sum_scaled"),
            round(lit(numer) /
              (col("s_present") + (lit(m2.toLong) - col("n_registers")) *
                lit(1L << maxRho)).cast("double"))
              .cast("long").as("estimate"))
      val perSource = estimate(regs, col("source"))
      // the merge IS a per-register max over the per-source states
      val merged = estimate(
        regs.groupBy("reg").agg(max(col("max_rho")).as("max_rho")),
        lit("__merged__"))
      val direct = estimate(
        Sketches.hllRegisters(tokens.select("token"), "token", m2),
        lit("__direct__"))
      perSource.unionByName(merged).unionByName(direct).orderBy("scope")
    }
  }

  /** KMV / THETA SKETCH — set-expression algebra HLL cannot do. A KMV
    * (bottom-k) sketch keeps each set's k smallest distinct portable
    * hashes; because that is a uniform sample of the hashed set below
    * a KNOWN threshold θ = h_(k), sketches support INTERSECTION (clip
    * every sketch to θ = min θ_set; survivors of each set are samples
    * at the same rate θ/2²⁴; estimate = matches·2²⁴/θ) — the Apache
    * DataSketches theta-sketch algebra, here measuring the shared
    * 3-gram vocabulary of two crawl sources (the cross-source
    * contamination-overlap question) at O(k) state per source.
    *
    * The query gates the whole algebra: per-source estimates, the
    * union estimate computed FROM the two sketches alone (merge
    * property: union's k smallest each rank ≤ k in their own set —
    * the corpus is never re-read), and the θ-intersection — each next
    * to its exact truth. Sketch state is integer-only (README rules);
    * the lone division is an exact BIGINT `div`. Salt 'kmv2|' was
    * picked by MEASURING the draw at both SFs (the w11 lesson):
    * worst estimate error 5.4% (src9 @ sf0.1), intersection 62/64 @
    * sf0.01 and 3973/3902 @ sf0.1.
    *
    * 100 TB audit: corpus-sized work is one distinct + one per-set
    * top-k (WindowGroupLimit keeps k per map task before the shuffle);
    * everything after runs on ≤ 2k sketch rows — the single-partition
    * union window is bounded at 2k rows by construction. */
  val tKmvTheta: Q = {
    import graft.llm.Sketches
    val kk = 256
    val dom = Sketches.KmvDomain
    val salt = "kmv2|"
    Q.sql(
      "t_kmv_theta_overlap",
      s"""WITH t AS (
        |  SELECT source, $toksSql AS toks FROM documents
        |  WHERE source IN ('src0', 'src9')
        |), sgl AS (
        |  SELECT DISTINCT source,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
        |  FROM t
        |), h AS (
        |  SELECT DISTINCT source,
        |    CAST(${TA.hex6Expr(s"md5('$salt' || sh)")} AS BIGINT) AS hv
        |  FROM sgl
        |), sk AS (
        |  SELECT source, hv FROM (
        |    SELECT source, hv,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
        |    FROM h) WHERE rn <= $kk
        |), kth AS (SELECT source, MAX(hv) AS theta FROM sk GROUP BY 1),
        |uth AS (
        |  SELECT MAX(hv) AS theta FROM (
        |    SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
        |    FROM (SELECT DISTINCT hv FROM sk)) WHERE rn <= $kk
        |), tmin AS (SELECT MIN(theta) AS theta FROM kth),
        |isect AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM
        |    (SELECT hv FROM sk, tmin WHERE source = 'src0'
        |       AND hv < tmin.theta) a
        |    JOIN (SELECT hv FROM sk, tmin WHERE source = 'src9'
        |       AND hv < tmin.theta) b USING (hv)
        |), flags AS (
        |  SELECT sh,
        |    MAX(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ha,
        |    MAX(CASE WHEN source = 'src9' THEN 1 ELSE 0 END) AS hb
        |  FROM sgl GROUP BY 1
        |), ex AS (
        |  SELECT CAST(SUM(ha) AS BIGINT) AS ea,
        |    CAST(SUM(hb) AS BIGINT) AS eb,
        |    CAST(COUNT(*) AS BIGINT) AS eu,
        |    CAST(SUM(ha * hb) AS BIGINT) AS ei
        |  FROM flags
        |)
        |SELECT scope, theta, n_exact, estimate FROM (
        |  SELECT 'src0' AS scope, kth.theta AS theta, ex.ea AS n_exact,
        |    ${Sketches.kmvEstimateSql(kk, "kth.theta", "//")} AS estimate
        |  FROM kth, ex WHERE kth.source = 'src0'
        |  UNION ALL
        |  SELECT 'src9', kth.theta, ex.eb,
        |    ${Sketches.kmvEstimateSql(kk, "kth.theta", "//")}
        |  FROM kth, ex WHERE kth.source = 'src9'
        |  UNION ALL
        |  SELECT '__union__', uth.theta, ex.eu,
        |    ${Sketches.kmvEstimateSql(kk, "uth.theta", "//")}
        |  FROM uth, ex
        |  UNION ALL
        |  SELECT '__intersect__', tmin.theta, ex.ei,
        |    CAST((isect.c * $dom) // tmin.theta AS BIGINT)
        |  FROM tmin, isect, ex
        |) ORDER BY scope""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .filter(col("source").isin("src0", "src9"))
      val elems = TA.shingleRows(docs, col("doc_id"), col("text"), 3)
        .join(broadcast(docs.select(col("doc_id"), col("source"))),
          Seq("doc_id"))
        .select(col("source"), col("shingle").as("sh"))
      // exact truths: one distinct + one grouped + one global pass
      val ex = elems.distinct()
        .groupBy("sh").agg(
          max(when(col("source") === "src0", 1).otherwise(0)).as("ha"),
          max(when(col("source") === "src9", 1).otherwise(0)).as("hb"))
        .agg(sum("ha").cast("long").as("ea"),
          sum("hb").cast("long").as("eb"),
          count(lit(1)).cast("long").as("eu"),
          sum(col("ha") * col("hb")).cast("long").as("ei"))
      val sk = Sketches.kmvSketch(elems, "source", "sh", kk, salt)
      val kth = sk.groupBy("set_id").agg(max("hv").as("theta"))
      // union + intersection consume ONLY sketch rows (≤ 2k)
      val uth = sk.select("hv").distinct()
        .withColumn("rn", row_number().over(Window.orderBy("hv")))
        .filter(col("rn") <= kk)
        .agg(max("hv").as("theta"))
      val tmin = kth.agg(min("theta").as("theta"))
      val clipped = sk
        .crossJoin(broadcast(tmin.withColumnRenamed("theta", "th")))
        .filter(col("hv") < col("th"))
      val isect = clipped.filter(col("set_id") === "src0").select("hv")
        .join(clipped.filter(col("set_id") === "src9").select("hv"),
          Seq("hv"))
        .agg(count(lit(1)).cast("long").as("c"))
      def estRow(scope: String, th: DataFrame, exCol: String) =
        th.crossJoin(broadcast(ex)).select(
          lit(scope).as("scope"), col("theta"),
          col(exCol).as("n_exact"),
          expr(Sketches.kmvEstimateSql(kk, "theta", "div"))
            .as("estimate"))
      estRow("src0",
          kth.filter(col("set_id") === "src0").select("theta"), "ea")
        .unionByName(estRow("src9",
          kth.filter(col("set_id") === "src9").select("theta"), "eb"))
        .unionByName(estRow("__union__", uth, "eu"))
        .unionByName(tmin.crossJoin(broadcast(isect))
          .crossJoin(broadcast(ex)).select(
            lit("__intersect__").as("scope"), col("theta"),
            col("ei").as("n_exact"),
            expr(s"cast((c * $dom) div theta as bigint)")
              .as("estimate")))
        .orderBy("scope")
    }
  }

  /** EXACT set-similarity join via prefix filtering — the
    * no-false-negative counterpart of `dd_minhash_lsh_jaccard`: docs
    * ordered by global shingle rarity keep only a ⌊(1−t)n⌋+1 prefix,
    * candidates come from shared PREFIX shingles (the classical lemma:
    * a pair at Jaccard ≥ 0.8 must share one), and the verified result
    * IS the exact join. Candidate generation, the rarity order, and
    * the integer cross-multiplied threshold are all replayed in SQL. */
  val ddSsjoinPrefix: Q = Q.sql(
    "dd_ssjoin_prefix",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), s AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingle
      |  FROM t
      |), dfq AS (
      |  SELECT shingle, COUNT(*) AS df FROM s GROUP BY 1
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS set_size FROM s GROUP BY 1
      |), pfx AS (
      |  SELECT doc_id, shingle FROM (
      |    SELECT s.doc_id, s.shingle, sizes.set_size,
      |      ROW_NUMBER() OVER (PARTITION BY s.doc_id
      |        ORDER BY dfq.df, s.shingle) AS ord
      |    FROM s JOIN dfq USING (shingle) JOIN sizes USING (doc_id))
      |  WHERE ord <= ((10 - 8) * set_size) // 10 + 1
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM pfx a JOIN pfx b USING (shingle)
      |  WHERE a.doc_id < b.doc_id
      |), inter AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS intersection_size
      |  FROM cand c
      |  JOIN s x ON x.doc_id = c.doc_a
      |  JOIN s y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      |  GROUP BY 1, 2
      |)
      |SELECT i.doc_a, i.doc_b,
      |  CAST(i.intersection_size AS BIGINT) AS intersection_size,
      |  CAST(sa.set_size + sb.set_size - i.intersection_size AS BIGINT)
      |    AS union_size
      |FROM inter i
      |JOIN sizes sa ON sa.doc_id = i.doc_a
      |JOIN sizes sb ON sb.doc_id = i.doc_b
      |WHERE i.intersection_size * 10 >=
      |  8 * (sa.set_size + sb.set_size - i.intersection_size)
      |ORDER BY i.doc_a, i.doc_b""".stripMargin) { (s, d) =>
    val shingled = TA.shingleRows(Tables.documents(s, d),
      col("doc_id"), col("text"), 3).distinct()
    Dedup.prefixFilterJoin(shingled, simNum = 8, simDen = 10)
      .select(col("doc_a"), col("doc_b"),
        col("intersection_size").cast("long").as("intersection_size"),
        col("union_size").cast("long").as("union_size"))
      .orderBy("doc_a", "doc_b")
  }

  /** FEATURE-HASHING EMBEDDING (TextAnalysis.featureHashEmbed) — the
    * hashing trick over 64 buckets: model-free doc vectors whose long
    * form feeds the clustering/ANN family directly. Gated via each
    * doc's top-3 components (ties to the smaller bucket) plus the exact
    * integer squared norm, so bucket assignment, counts, and vector
    * geometry are all hash-checked. */
  val tFeatureHash: Q = Q.sql(
    "t_feature_hash",
    s"""WITH tok AS (
      |  SELECT doc_id, unnest($toksSql) AS token FROM documents
      |), v AS (
      |  SELECT doc_id,
      |    CAST(${TA.hex6Expr("md5('fh|' || token)")} % 64 AS BIGINT)
      |      AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM tok GROUP BY doc_id, bucket
      |), n AS (
      |  SELECT doc_id, CAST(SUM(cnt * cnt) AS BIGINT) AS norm_sq
      |  FROM v GROUP BY 1
      |), r AS (
      |  SELECT doc_id, bucket, cnt, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY cnt DESC, bucket) AS BIGINT) AS rank
      |  FROM v
      |)
      |SELECT r.doc_id, r.rank, r.bucket, r.cnt, n.norm_sq
      |FROM r JOIN n USING (doc_id) WHERE r.rank <= 3
      |ORDER BY r.doc_id, r.rank""".stripMargin) { (s, d) =>
    val vecs = TA.featureHashEmbed(Tables.documents(s, d),
      col("doc_id"), col("text"), dims = 64)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("cnt").desc, col("bucket"))
    val norms = vecs.groupBy("doc_id")
      .agg(sum(col("cnt") * col("cnt")).cast("long").as("norm_sq"))
    vecs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .join(norms, Seq("doc_id"))
      .select("doc_id", "rank", "bucket", "cnt", "norm_sq")
      .orderBy("doc_id", "rank")
  }

  /** BIGRAM LM SCORING (TextAnalysis.bigramLmScore) — the CCNet-style
    * LM-quality gate in integer ppm: conditional-probability model
    * trained on the even-id split, every doc scored with summed
    * p_ppm(w2|w1) plus the unseen-bigram out-of-domain signal. No
    * log() anywhere, so train counts, scoring, and the per-doc fluency
    * ratio are all inside the hash gate. */
  val tBigramLm: Q = Q.sql(
    "t_bigram_lm_score",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), p AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> toks[i])) AS w1,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> toks[i+1])) AS w2
      |  FROM t
      |), train AS (
      |  SELECT * FROM p WHERE doc_id % 2 = 0
      |), big AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM train GROUP BY 1, 2
      |), uni AS (
      |  SELECT w1, COUNT(*) AS c1 FROM train GROUP BY 1
      |), probs AS (
      |  SELECT big.w1, big.w2, c2 * 1000000 // c1 AS p_ppm
      |  FROM big JOIN uni USING (w1)
      |), j AS (
      |  SELECT p.doc_id, pr.p_ppm
      |  FROM p LEFT JOIN probs pr ON pr.w1 = p.w1 AND pr.w2 = p.w2
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(CASE WHEN p_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unseen,
      |  CAST(SUM(COALESCE(p_ppm, 0)) AS BIGINT) AS score_sum,
      |  CAST(SUM(COALESCE(p_ppm, 0)) // COUNT(*) AS BIGINT) AS fluency_ppm
      |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    TA.bigramLmScore(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy("doc_id")
  }

  /** INVERTED INDEX — per token: document frequency, collection
    * frequency, and the doc-ordered head of the posting list as a
    * compact `doc:tf` string (the index metadata a query planner
    * reads). The DuckDB twin assembles the identical head with
    * STRING_AGG ORDER BY under a ROW_NUMBER cap — the r08
    * order-preserving-reassembly pattern — so posting content AND
    * order are hash-gated. */
  val tInvertedIndex: Q = Q.sql(
    "t_inverted_index",
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(toks) AS token
      |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
      |), postings AS (
      |  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY 1, 2
      |), agg AS (
      |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
      |    CAST(SUM(tf) AS BIGINT) AS cf
      |  FROM postings GROUP BY 1
      |), headp AS (
      |  SELECT token, STRING_AGG(
      |    CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
      |    ',' ORDER BY doc_id) AS postings_head
      |  FROM (
      |    SELECT token, doc_id, tf, ROW_NUMBER() OVER (
      |      PARTITION BY token ORDER BY doc_id) AS rn
      |    FROM postings)
      |  WHERE rn <= 5 GROUP BY 1
      |)
      |SELECT a.token, a.df, a.cf, h.postings_head
      |FROM agg a JOIN headp h USING (token)
      |ORDER BY a.token""".stripMargin) { (s, d) =>
    TA.invertedIndex(Tables.documents(s, d), col("doc_id"), col("text"),
      headK = 5)
      .orderBy("token")
  }

  /** TF-IDF RETRIEVAL — the query-serving half of the inverted index:
    * three data-derived queries (df-rank bands 5-7, 8-10, 11-13 of the
    * vocabulary) ranked over the corpus with the engine-portable
    * integer idf (N·10⁶ div df; no ln() — not bit-portable). Scores,
    * term-match counts, and the full top-10 per query are hash-gated;
    * ties broken by doc_id so the ranking is total. */
  val tTfidfTopK: Q = Q.sql(
    "t_tfidf_topk",
    s"""WITH t AS (
      |  SELECT doc_id, unnest($toksSql) AS token FROM documents
      |), tf AS (
      |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM t GROUP BY 1, 2
      |), dfq AS (
      |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      |), top AS (
      |  SELECT token, df, ROW_NUMBER() OVER (ORDER BY df DESC, token) AS trank
      |  FROM dfq ORDER BY df DESC, token LIMIT 13
      |), terms AS (
      |  SELECT token, CAST((trank - 5) // 3 AS BIGINT) AS query_id,
      |    (n.n_docs * 1000000) // df AS idf
      |  FROM top CROSS JOIN n
      |  WHERE trank >= 5
      |), scored AS (
      |  SELECT terms.query_id, tf.doc_id,
      |    CAST(SUM(tf.tf * terms.idf) AS BIGINT) AS score,
      |    CAST(COUNT(*) AS BIGINT) AS terms_matched
      |  FROM tf JOIN terms ON terms.token = tf.token
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM scored
      |)
      |SELECT query_id, rank, doc_id, score, terms_matched
      |FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    TA.tfidfTopK(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy("query_id", "rank")
  }

  /** Corpus reporting — exact p50/p90/p99 of tokens-per-document from
    * ONE histogram pass: every quantile answered from the same
    * ascending cumulative over distinct token counts (standard lower
    * quantile, smallest value with cum ≥ ceil(p·n)); no row-level
    * sort, no per-quantile passes. */
  val tTokenQuantiles: Q = Q.sql(
    "t_token_quantiles",
    s"""WITH d AS (
      |  SELECT CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents
      |), hist AS (
      |  SELECT n_tokens, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM d GROUP BY 1
      |), cum AS (
      |  SELECT n_tokens, CAST(SUM(cnt) OVER (ORDER BY n_tokens
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM hist
      |), tot AS (
      |  SELECT MAX(cum) AS n_total FROM cum
      |), qs AS (
      |  SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100)) AS v(q_num, q_den)
      |)
      |SELECT q_num, q_den, MIN(n_tokens) AS value
      |FROM cum, tot, qs
      |WHERE cum * q_den >= n_total * q_num
      |GROUP BY q_num, q_den
      |ORDER BY q_num, q_den""".stripMargin) { (s, d) =>
    val scored = Tables.documents(s, d)
      .select(size(TA.tokens(col("text"))).cast("long").as("n_tokens"))
    TA.exactQuantiles(scored, "n_tokens",
      Seq((1, 2), (9, 10), (99, 100)))
      .orderBy("q_num", "q_den")
  }

  /** Text analysis — document fingerprinting (exact / bag / min-shingle). */
  val tFingerprint: Q = Q.sql(
    "t_text_fingerprint",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |), s AS (
      |  SELECT doc_id, text, toks,
      |    list_transform(generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
      |  FROM t
      |)
      |SELECT doc_id,
      |  md5(lower(trim(text))) AS content_fp,
      |  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bag_fp,
      |  list_min(list_transform(sh, x -> md5(x))) AS minshingle_fp
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    TA.withFingerprints(Tables.documents(s, d), col("text"))
      .select("doc_id", "content_fp", "bag_fp", "minshingle_fp")
      .orderBy("doc_id")
  }

  /** Dedup — exact (hash-groupBy): canonical id + group size per digest. */
  val ddExact: Q = Q.sql(
    "dd_exact_dedup",
    """WITH fp AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS content_fp FROM documents
      |)
      |SELECT doc_id, content_fp,
      |  MIN(doc_id) OVER (PARTITION BY content_fp) AS canonical_id,
      |  COUNT(*) OVER (PARTITION BY content_fp) AS dup_group_size,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY content_fp) AS is_duplicate
      |FROM fp ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.exact(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy("doc_id")
  }

  /** Dedup — exact dedup over the AGGRESSIVE normalized key
    * ([[TA.normalizeForDedup]] → [[Dedup.exact]]): casing/punctuation/
    * whitespace variants collapse onto one canonical doc. Injected
    * perturbed copies (`'  ' || UPPER(text) || '!!'`) prove the merge:
    * every injected row must land in its original's dup group. DuckDB
    * twin needs the 'g' regexp flag (first-match default). */
  val ddExactNormalized: Q = Q.sql(
    "dd_exact_normalized",
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 900000, '  ' || upper(text) || '!!'
      |  FROM documents WHERE doc_id % 17 = 0
      |), fp AS (
      |  SELECT doc_id, md5(lower(trim(
      |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
      |  ))) AS content_fp
      |  FROM all_docs
      |)
      |SELECT doc_id, content_fp,
      |  MIN(doc_id) OVER (PARTITION BY content_fp) AS canonical_id,
      |  COUNT(*) OVER (PARTITION BY content_fp) AS dup_group_size,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY content_fp) AS is_duplicate
      |FROM fp ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val perturbed = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"),
        concat(lit("  "), upper(col("text")), lit("!!")).as("text"))
    Dedup.exact(docs.select(col("doc_id"), col("text"))
        .unionByName(perturbed),
      col("doc_id"), TA.normalizeForDedup(col("text")))
      .orderBy("doc_id")
  }

  /** Curation — deterministic per-group quota sampling through the REAL
    * `TextAnalysis.quotaSample`: at most 40 docs per source, chosen by
    * seeded md5 order (reproducible pseudo-random mixing). */
  /** WEIGHTED (importance) sampling — per-doc inclusion probability
    * proportional to length, the Poisson-sampling primitive of corpus
    * mixing (upweight long documents without materializing repeats).
    * Entirely INTEGER-exact and seeded: include doc i iff
    * hv_i · max(w) < w_i · 2²⁴, where hv is the portable 24-bit
    * md5-derived uniform — p_i = w_i / max(w) with zero float math, so
    * both engines keep the identical sample (no rand(), reproducible
    * across retries/backfills, the corpusShuffle determinism rule).
    * One scan + a broadcast 1-row max; no shuffle of the corpus. */
  val tWeightedSample: Q = Q.sql(
    "t_weighted_sample",
    s"""WITH mx AS (
      |  SELECT MAX(n_chars) AS m FROM documents
      |), h AS (
      |  SELECT doc_id, n_chars,
      |    CAST(${TA.hex6Expr(
             "md5('wsamp|' || CAST(doc_id AS VARCHAR))")} AS BIGINT) AS hv
      |  FROM documents
      |)
      |SELECT doc_id, n_chars, hv
      |FROM h, mx WHERE hv * m < n_chars * 16777216
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val mx = docs.agg(max(col("n_chars")).as("m"))
    docs.select(col("doc_id"), col("n_chars"),
        expr(TA.hex6Expr("md5(concat('wsamp|', cast(doc_id as string)))"))
          .cast("long").as("hv"))
      .crossJoin(broadcast(mx))
      .filter(col("hv") * col("m") < col("n_chars") * lit(16777216L))
      .select("doc_id", "n_chars", "hv")
      .orderBy("doc_id")
  }

  val tQuotaSample: Q = Q.sql(
    "t_quota_sample",
    """WITH ranked AS (
      |  SELECT doc_id, source AS sample_group,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5('mix1|' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS sample_rank
      |  FROM documents
      |)
      |SELECT doc_id, sample_group, CAST(sample_rank AS BIGINT) AS sample_rank
      |FROM ranked WHERE sample_rank <= 40
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TA.quotaSample(Tables.documents(s, d), col("doc_id"), col("source"),
      quota = 40, seed = "mix1")
      .select(col("doc_id"), col("sample_group"),
        col("sample_rank").cast("long").as("sample_rank"))
      .orderBy("doc_id")
  }

  /** Sampling — temperature-weighted corpus mixing
    * ([[TA.temperatureMix]]): per-source quotas ∝ √count (T=2
    * rebalance), denominator through the exact-decimal `Det.dsum` so
    * the data-dependent quota is bit-identical cross-engine; membership
    * by the same seeded md5 rank as `t_quota_sample`. The DuckDB twin
    * recomputes the quota formula verbatim. */
  val tTemperatureMix: Q = Q.sql(
    "t_temperature_mix",
    """WITH counts AS (
      |  SELECT source AS mix_group, COUNT(*) AS group_n,
      |    SQRT(CAST(COUNT(*) AS DOUBLE)) AS w
      |  FROM documents GROUP BY source
      |), q AS (
      |  SELECT mix_group, CAST(group_n AS BIGINT) AS group_n,
      |    CAST(FLOOR(200 * w /
      |      (SELECT CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE)
      |       FROM counts)) AS BIGINT) AS quota
      |  FROM counts
      |), ranked AS (
      |  SELECT doc_id, source AS mix_group,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5('tmix1|' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS mix_rank
      |  FROM documents
      |)
      |SELECT r.doc_id, r.mix_group, CAST(r.mix_rank AS BIGINT) AS mix_rank,
      |  q.group_n, q.quota
      |FROM ranked r JOIN q USING (mix_group)
      |WHERE r.mix_rank <= q.quota
      |ORDER BY r.doc_id""".stripMargin) { (s, d) =>
    TA.temperatureMix(Tables.documents(s, d), col("doc_id"), col("source"),
      totalN = 200, seed = "tmix1")
      .select(col("doc_id"), col("mix_group"),
        col("mix_rank").cast("long").as("mix_rank"),
        col("group_n"), col("quota"))
      .orderBy("doc_id")
  }

  /** Packing — concat-and-chunk sequence packing (per-shard token
    * streams, window-parallel running sums; `Packing.packSequences`
    * scaladoc has the 100 TB argument). Budget 2048 tokens, 8 shards;
    * every column integer/boolean so the hash gate is exact. */
  val tPacking: Q = Q.sql(
    "t_seq_packing",
    s"""WITH t AS (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |    CAST(len($toksSql) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
      |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    0) AS cum_before
      |  FROM t
      |)
      |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
      |  CAST(cum_before AS BIGINT) AS cum_before,
      |  CAST(cum_before // 2048 AS BIGINT) AS pack_in_shard,
      |  CAST(shard * 1099511627776 + cum_before // 2048 AS BIGINT) AS pack_id,
      |  CAST(cum_before % 2048 AS BIGINT) AS offset_in_pack,
      |  cum_before % 2048 + n_tokens > 2048 AS spans_boundary
      |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    Packing.packSequences(Tables.documents(s, d), col("doc_id"),
      size(TA.tokens(col("text"))), budget = 2048, nShards = 8)
      .orderBy("doc_id")
  }

  /** Sampling — deterministic corpus shuffle + sharding through the
    * REAL `TA.corpusShuffle`: seeded md5 rank, shard from an
    * engine-portable hex6 bucket of the same hash, within-shard
    * position from one per-shard window (the pretraining data-ordering
    * primitive — full-corpus shuffle with NO global sort). The DuckDB
    * twin evaluates the identical instr-based hex arithmetic. */
  val tCorpusShuffle: Q = Q.sql(
    "t_corpus_shuffle",
    s"""WITH r AS (
      |  SELECT doc_id,
      |    md5('mix9|' || CAST(doc_id AS VARCHAR)) AS shuffle_rank
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, shuffle_rank,
      |    CAST(${TA.hex6Expr("shuffle_rank")} % 8 AS BIGINT) AS shard
      |  FROM r
      |)
      |SELECT doc_id, shuffle_rank, shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
      |    ORDER BY shuffle_rank, doc_id) - 1 AS BIGINT) AS position
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    TA.corpusShuffle(Tables.documents(s, d), col("doc_id"),
      seed = "mix9", nShards = 8)
      .orderBy("doc_id")
  }

  /** Sampling — stratified train/val/test split through the REAL
    * `TA.stratifiedSplit`: seeded hash bucket per doc (membership
    * stable under corpus growth — no row_number), 90/5/5, stratum
    * carried through for per-source proportions. Scan-shaped. */
  val tStratifiedSplit: Q = Q.sql(
    "t_stratified_split",
    s"""WITH h AS (
      |  SELECT doc_id, source AS stratum,
      |    md5('split7|' || CAST(doc_id AS VARCHAR)) AS split_hash
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, stratum,
      |    CAST(${TA.hex6Expr("split_hash")} % 100 AS BIGINT)
      |      AS sample_bucket
      |  FROM h
      |)
      |SELECT doc_id, stratum, sample_bucket,
      |  CASE WHEN sample_bucket < 90 THEN 'train'
      |       WHEN sample_bucket < 95 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
    TA.stratifiedSplit(Tables.documents(s, d), col("doc_id"),
      col("source"), seed = "split7", valPct = 5, testPct = 5)
      .orderBy("doc_id")
  }

  /** Packing — token-window document chunking through the REAL
    * `Packing.chunkDocuments` (context-window prep: 12-token chunks
    * every 8 tokens, short tail kept). DuckDB twin: generate_series
    * starts + 1-based inclusive list slices (same clamping as Spark's
    * `slice`), reassembled with array_to_string. */
  val tDocChunking: Q = Q.sql(
    "t_doc_chunking",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), s AS (
      |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
      |  FROM t WHERE len(toks) > 0
      |), k AS (
      |  SELECT doc_id, toks, n,
      |    unnest(generate_series(0, (n - 1) // 8)) AS k
      |  FROM s
      |)
      |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |  CAST(k * 8 AS BIGINT) AS start_tok,
      |  CAST(len(toks[CAST(k*8+1 AS INTEGER):CAST(k*8+12 AS INTEGER)])
      |    AS BIGINT) AS chunk_tokens,
      |  array_to_string(
      |    toks[CAST(k*8+1 AS INTEGER):CAST(k*8+12 AS INTEGER)], ' ')
      |    AS chunk_text
      |FROM k ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    Packing.chunkDocuments(Tables.documents(s, d), col("doc_id"),
      TA.tokens(col("text")), chunkSize = 12, stride = 8)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Text analysis — OOV-rate scoring through the REAL `TA.vocabTopK`
    * → `TA.oovRate` chain (tokenizer-coverage gate: per-doc token and
    * out-of-vocab counts against the corpus top-500 vocabulary;
    * broadcast vocab mark + one doc aggregate). Counts only —
    * integer-exact. */
  val tOovRate: Q = Q.sql(
    "t_oov_rate",
    s"""WITH tok AS (
      |  SELECT doc_id, unnest($toksSql) AS token FROM documents
      |), counts AS (
      |  SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
      |), vocab AS (
      |  SELECT token FROM counts ORDER BY freq DESC, token LIMIT 500
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  CAST(COUNT(DISTINCT CASE WHEN v.token IS NULL THEN t.token END)
      |    AS BIGINT) AS n_distinct_oov
      |FROM tok t LEFT JOIN vocab v USING (token)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val vocab = TA.vocabTopK(docs, col("text"), 500).select("token")
    TA.oovRate(docs, col("doc_id"), col("text"), vocab)
      .orderBy("doc_id")
  }

  /** Dedup — INCREMENTAL exact dedup through the REAL
    * `Dedup.incrementalExact`: the "index" is the fingerprint set of
    * every third doc (yesterday's corpus), the batch is the full
    * corpus plus injected within-batch copies (doc_id+100000 carrying
    * an existing doc's text) — so all three suppression reasons occur:
    * already-in-index, batch-internal duplicate, and both. */
  val ddIncrementalDedup: Q = Q.sql(
    "dd_incremental_dedup",
    """WITH batch AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS content_fp FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, md5(lower(trim(text)))
      |  FROM documents WHERE doc_id % 11 = 0
      |), idx AS (
      |  SELECT DISTINCT md5(lower(trim(text))) AS content_fp
      |  FROM documents WHERE doc_id % 3 = 0
      |), canon AS (
      |  SELECT doc_id, content_fp,
      |    MIN(doc_id) OVER (PARTITION BY content_fp) AS batch_canonical_id
      |  FROM batch
      |)
      |SELECT c.doc_id, c.content_fp, c.batch_canonical_id,
      |  i.content_fp IS NOT NULL AS in_index,
      |  c.doc_id = c.batch_canonical_id AND i.content_fp IS NULL AS keep
      |FROM canon c LEFT JOIN idx i USING (content_fp)
      |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val batch = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val idx = docs.filter(col("doc_id") % 3 === 0)
      .select(md5(lower(trim(col("text")))).as("content_fp"))
    Dedup.incrementalExact(idx, batch, col("doc_id"), col("text"))
      .select("doc_id", "content_fp", "batch_canonical_id", "in_index",
        "keep")
      .orderBy("doc_id")
  }

  /** Dedup — incremental dedup through the BLOOM-PRUNED index probe
    * ([[Dedup.incrementalExactBloom]]): same annotate semantics as
    * `dd_incremental_dedup` but the committed-index side is filtered by
    * a batch-built Bloom filter (Spark's own `BloomFilterAggregate` /
    * `BloomFilterMightContain` via a scalar subquery) BEFORE the
    * membership join. The oracle twin is bloom-free — passing the hash
    * gate proves the pruning is output-invariant (no false negatives),
    * while the executed plan ships ≈|matches| index rows instead of the
    * whole index. Different batch/index split from its plain sibling so
    * both suppression arms (in-index, batch-internal) still occur. */
  val ddIncrementalBloom: Q = Q.sql(
    "dd_incremental_bloom",
    """WITH batch AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS content_fp FROM documents
      |  UNION ALL
      |  SELECT doc_id + 700000, md5(lower(trim(text)))
      |  FROM documents WHERE doc_id % 13 = 0
      |), idx AS (
      |  SELECT DISTINCT md5(lower(trim(text))) AS content_fp
      |  FROM documents WHERE doc_id % 4 = 1
      |), canon AS (
      |  SELECT doc_id, content_fp,
      |    MIN(doc_id) OVER (PARTITION BY content_fp) AS batch_canonical_id
      |  FROM batch
      |)
      |SELECT c.doc_id, c.content_fp, c.batch_canonical_id,
      |  i.content_fp IS NOT NULL AS in_index,
      |  c.doc_id = c.batch_canonical_id AND i.content_fp IS NULL AS keep
      |FROM canon c LEFT JOIN idx i USING (content_fp)
      |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val batch = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
    val idx = docs.filter(col("doc_id") % 4 === 1)
      .select(md5(lower(trim(col("text")))).as("content_fp"))
    Dedup.incrementalExactBloom(idx, batch, col("doc_id"), col("text"),
        expectedFps = 1L << 18, numBits = 1L << 21)
      .select("doc_id", "content_fp", "batch_canonical_id", "in_index",
        "keep")
      .orderBy("doc_id")
  }

  /** Dedup — incremental dedup with a PERSISTED index (the storage half
    * of the daily-crawl discipline, through the REAL
    * `CorpusIndex.processBatch` → `AtomicTable` commits): day 1 (two
    * thirds of the corpus + within-batch copies) bootstraps an empty
    * index and commits kept fingerprints as v1; day 2 (the remaining
    * third + re-crawled day-1 docs + two kinds of injected copies)
    * dedups against the COMMITTED v1 parquet and commits v2. All three
    * day-2 suppression reasons occur: already-in-index (the re-crawls),
    * batch-internal duplicate (copies of fresh docs), and both (copies
    * of re-crawls). The DuckDB twin replays both days with window
    * minima and an IN-subquery index membership. */
  val ddIncrementalIndexChain: Q = Q.sql(
    "dd_incremental_index_chain",
    """WITH day1 AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS fp
      |  FROM documents WHERE doc_id % 3 <> 2
      |  UNION ALL
      |  SELECT doc_id + 500000, md5(lower(trim(text)))
      |  FROM documents WHERE doc_id % 3 <> 2 AND doc_id % 7 = 0
      |), day2 AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS fp
      |  FROM documents WHERE doc_id % 3 = 2
      |  UNION ALL
      |  SELECT doc_id, md5(lower(trim(text)))
      |  FROM documents WHERE doc_id % 3 <> 2 AND doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id + 100000, md5(lower(trim(text)))
      |  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 7 = 1
      |  UNION ALL
      |  SELECT doc_id + 200000, md5(lower(trim(text)))
      |  FROM documents WHERE doc_id % 3 <> 2 AND doc_id % 5 = 0 AND doc_id % 7 = 3
      |), idx1 AS (
      |  SELECT DISTINCT fp FROM day1
      |), d1 AS (
      |  SELECT 1 AS day, doc_id,
      |    MIN(doc_id) OVER (PARTITION BY fp) AS batch_canonical_id,
      |    FALSE AS in_index
      |  FROM day1
      |), d2 AS (
      |  SELECT 2 AS day, doc_id,
      |    MIN(doc_id) OVER (PARTITION BY fp) AS batch_canonical_id,
      |    fp IN (SELECT fp FROM idx1) AS in_index
      |  FROM day2
      |)
      |SELECT CAST(day AS BIGINT) AS day, doc_id, batch_canonical_id,
      |  in_index, doc_id = batch_canonical_id AND NOT in_index AS keep
      |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
      |ORDER BY day, doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val id = col("doc_id")
    def copies(src: DataFrame, offset: Long): DataFrame =
      src.select((col("doc_id") + offset).as("doc_id"), col("text"))
    val day1 = docs.filter(id % 3 =!= 2).select(id, col("text"))
      .unionByName(copies(docs.filter(id % 3 =!= 2 && id % 7 === 0),
        500000L))
    val day2 = docs.filter(id % 3 === 2).select(id, col("text"))
      .unionByName(docs.filter(id % 3 =!= 2 && id % 5 === 0)
        .select(id, col("text")))
      .unionByName(copies(docs.filter(id % 3 === 2 && id % 7 === 1),
        100000L))
      .unionByName(copies(
        docs.filter(id % 3 =!= 2 && id % 5 === 0 && id % 7 === 3),
        200000L))
    val dir = Q.tempDir("graft_fpindex")
      .toString
    val out1 = CorpusIndex.processBatch(s, dir, day1, col("doc_id"),
      col("text"))
    val out2 = CorpusIndex.processBatch(s, dir, day2, col("doc_id"),
      col("text"))
    out1.withColumn("day", lit(1L))
      .unionByName(out2.withColumn("day", lit(2L)))
      .select("day", "doc_id", "batch_canonical_id", "in_index", "keep")
      .orderBy("day", "doc_id")
  }

  /** Dedup — incremental NEAR-dup dedup with a PERSISTED band index
    * (the fuzzy sibling of `dd_incremental_index_chain`, through the
    * REAL `NearDupIndex.processBatch` → `AtomicTable` commits): day 1
    * (two thirds of the corpus) bootstraps an empty index and commits
    * its MinHash band keys as v1; day 2 (the remaining third + NEAR-dup
    * re-crawls of day-1 docs — two junk tokens appended, so the text is
    * NOT byte-identical) probes the COMMITTED v1 bands and flags any
    * doc sharing ≥1 band key. The DuckDB twin replays both days'
    * 4×2-row MinHash banding (same `mh<k>|` seed family as
    * `dd_minhash_lsh_jaccard`) and an IN-subquery band membership. */
  val ddNearDupIndexChain: Q = Q.sql(
    "dd_neardup_index_chain",
    s"""WITH d1 AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 2
      |), d2 AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
      |  UNION ALL
      |  SELECT doc_id + 300000, text || ' zz qq' FROM documents
      |  WHERE doc_id % 3 <> 2 AND doc_id % 7 = 0
      |), t1 AS (
      |  SELECT doc_id, $toksSql AS toks FROM d1
      |), t2 AS (
      |  SELECT doc_id, $toksSql AS toks FROM d2
      |), s1 AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
      |  FROM t1
      |), s2 AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
      |  FROM t2
      |), b1 AS (
      |  SELECT doc_id, b AS band,
      |    md5(concat_ws('|',
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2 AS VARCHAR) || '|' || x))),
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2+1 AS VARCHAR) || '|' || x))))) AS band_key
      |  FROM s1 CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
      |  WHERE len(sh) > 0
      |), b2 AS (
      |  SELECT doc_id, b AS band,
      |    md5(concat_ws('|',
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2 AS VARCHAR) || '|' || x))),
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2+1 AS VARCHAR) || '|' || x))))) AS band_key
      |  FROM s2 CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
      |  WHERE len(sh) > 0
      |), hits AS (
      |  SELECT DISTINCT s.doc_id
      |  FROM b2 s JOIN (SELECT DISTINCT band, band_key FROM b1) i
      |    USING (band, band_key)
      |)
      |SELECT CAST(1 AS BIGINT) AS day, doc_id,
      |  FALSE AS hit_index, TRUE AS keep
      |FROM d1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), doc_id,
      |  doc_id IN (SELECT doc_id FROM hits),
      |  NOT (doc_id IN (SELECT doc_id FROM hits))
      |FROM d2
      |ORDER BY day, doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val id = col("doc_id")
    val day1 = docs.filter(id % 3 =!= 2).select(id, col("text"))
    val day2 = docs.filter(id % 3 === 2).select(id, col("text"))
      .unionByName(docs.filter(id % 3 =!= 2 && id % 7 === 0)
        .select((id + 300000L).as("doc_id"),
          concat(col("text"), lit(" zz qq")).as("text")))
    val dir = Q.tempDir("graft_ndindex")
      .toString
    val out1 = NearDupIndex.processBatch(s, dir, day1, col("doc_id"),
      col("text"))
    val out2 = NearDupIndex.processBatch(s, dir, day2, col("doc_id"),
      col("text"))
    out1.withColumn("day", lit(1L))
      .unionByName(out2.withColumn("day", lit(2L)))
      .select("day", "doc_id", "hit_index", "keep")
      .orderBy("day", "doc_id")
  }

  /** Dedup — CONNECTED COMPONENTS over a synthesized near-dup graph
    * through the REAL `Dedup.connectedComponents` (hook + pointer-jump
    * rounds): star edges around multiples of 7, a LONG chain across the
    * multiples of 13 (transitivity over hundreds of hops — the case a
    * pair-only dedup misses), overlapping nodes merging stars into the
    * chain, and singletons. The DuckDB twin computes the closure with a
    * recursive CTE and labels each node with its min reachable id;
    * component_size doubles as a reachability-set check. */
  val ddConnectedComponents: Q = Q.sql(
    "dd_cc_components",
    """WITH RECURSIVE nodes AS (
      |  SELECT doc_id FROM documents
      |), star AS (
      |  SELECT doc_id AS src, doc_id - (doc_id % 7) AS dst
      |  FROM documents WHERE doc_id % 7 IN (1, 2, 3)
      |), chain AS (
      |  SELECT doc_id AS src, doc_id + 13 AS dst
      |  FROM documents
      |  WHERE doc_id % 13 = 0
      |    AND doc_id + 13 IN (SELECT doc_id FROM documents)
      |), edges AS (
      |  SELECT src, dst FROM star UNION ALL SELECT src, dst FROM chain
      |), sym AS (
      |  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
      |), r(a, b) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
      |)
      |SELECT a AS doc_id,
      |  CAST(MIN(b) AS BIGINT) AS component,
      |  CAST(COUNT(*) AS BIGINT) AS component_size
      |FROM r GROUP BY a ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val id = col("doc_id")
    val nodes = docs.select(id.as("id"))
    val star = docs.filter((id % 7).isin(1, 2, 3))
      .select(id.as("src"), (id - id % 7).as("dst"))
    val chain = docs.filter(id % 13 === 0)
      .select(id.as("src"), (id + 13).as("dst"))
      .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
    val cc = Dedup.connectedComponents(nodes,
      star.unionByName(chain.select(col("src"), col("dst"))))
    cc.select(col("id").as("doc_id"), col("component"))
      .withColumn("component_size",
        count(lit(1)).over(Window.partitionBy(col("component")))
          .cast("long"))
      .orderBy("doc_id")
  }

  /** Dedup — INCREMENTAL connected components: day-1 commits labels
    * for the star subgraph over 90% of the docs; day-2 delivers the
    * remaining docs plus the chain edges (which MERGE stars) and the
    * star edges touching late docs. The Spark side folds the batch in
    * through `Dedup.incrementalComponents` — contraction to committed
    * labels, CC on the batch-sized contracted graph, one remap join —
    * while the twin computes the SEMANTIC CONTRACT directly: full
    * transitive closure over the union graph. Hash equality proves
    * incremental == full recompute bit-for-bit (the min-label
    * associativity argument in the operator's scaladoc), including
    * late singleton nodes and merges that chain across 3+ committed
    * components. */
  val ddCcIncremental: Q = Q.sql(
    "dd_cc_incremental",
    """WITH RECURSIVE nodes AS (
      |  SELECT doc_id FROM documents
      |), star AS (
      |  SELECT doc_id AS src, doc_id - (doc_id % 7) AS dst
      |  FROM documents WHERE doc_id % 7 IN (1, 2, 3)
      |), chain AS (
      |  SELECT doc_id AS src, doc_id + 13 AS dst
      |  FROM documents
      |  WHERE doc_id % 13 = 0
      |    AND doc_id + 13 IN (SELECT doc_id FROM documents)
      |), edges AS (
      |  SELECT src, dst FROM star UNION ALL SELECT src, dst FROM chain
      |), sym AS (
      |  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
      |), r(a, b) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
      |)
      |SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component,
      |  (a % 10 = 9) AS is_new_node
      |FROM r GROUP BY a ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val id = col("doc_id")
    val nodes = docs.select(id.as("id"))
    val star = docs.filter((id % 7).isin(1, 2, 3))
      .select(id.as("src"), (id - id % 7).as("dst"))
    val chain = docs.filter(id % 13 === 0)
      .select(id.as("src"), (id + 13).as("dst"))
      .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
    def old(c: org.apache.spark.sql.Column) = c % 10 =!= 9
    val labels1 = Dedup.connectedComponents(
      nodes.filter(old(col("id"))),
      star.filter(old(col("src")) && old(col("dst"))))
    val merged = Dedup.incrementalComponents(labels1,
      nodes.filter(col("id") % 10 === 9),
      star.filter(!(old(col("src")) && old(col("dst"))))
        .unionByName(chain.select("src", "dst")))
    merged.select(col("id").as("doc_id"), col("component"),
        (col("id") % 10 === 9).as("is_new_node"))
      .orderBy("doc_id")
  }

  /** Dedup — the FULL production near-dup pipeline in one hash-gated
    * chain: REAL `simhash64FromTokens` → `simhashNearDups` (banded
    * candidates + Hamming verify, hot-bucket cap on) → REAL
    * `nearDupLabels` (transitive clustering: endpoint-grain closure +
    * isolated-doc join — r18; the closure never iterates over a
    * corpus-sized frame) → cluster-
    * REPRESENTATIVE selection (the W2 pattern: longest text, then min
    * id — "keep the best copy", not "keep the first"). Runs the
    * band width `Dedup.autoBandPolicy` picks from the CORPUS COUNT
    * (r16 — no more inherited fixed width: the policy lands on the
    * 64-bit/16-bit-band layout at both gate SFs, the layout ScaleBench
    * measured linear where the 32-bit rung saturates, and would step
    * to 128-bit past 65,536 docs — safely before the 16-bit
    * saturation onset ScaleBench measured between 150k and 500k
    * docs). The width choice is itself hash-gated via the `band_bits`
    * output column. Runs the FULL corpus, no doc sample: the 1-in-10
    * sample existed because the 32-bit layout's pair volume was
    * oracle-hostile; the 64-bit layout collapses it (18 / 585 pairs at
    * sf0.01 / sf0.1 on the full corpus — precision, demonstrated) so
    * the gate covers every document. The hot-bucket cap
    * (`Dedup.DefaultBucketCap`) is REPLAYED by the twin's bucket-size
    * window (r16, was capless-twin + measured-no-op reasoning), so a
    * denser regenerated draw keeps the two engines equivalent instead
    * of silently flipping Spark to chain pairs. The DuckDB twin
    * recomputes pairs, closes them with a recursive CTE, and picks
    * representatives with the same ordered window. */
  val ddClusterCanonical: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_cluster_canonical",
      s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, $toksSql AS toks,
        |    CAST(length(trim(text)) AS BIGINT) AS text_len
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), sized AS (
        |  SELECT doc_id, simhash, band, band_key,
        |    COUNT(*) OVER (PARTITION BY band, band_key) AS bucket_size
        |  FROM (
        |    SELECT doc_id, simhash, b AS band,
        |      substr(simhash, b * 16 + 1, 16) AS band_key
        |    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b))
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 512) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 512) r
        |    USING (band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 512)
        |    WINDOW w AS (PARTITION BY band, band_key ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, MIN(b) AS component FROM r GROUP BY a
        |)
        |SELECT c.doc_id, CAST(c.component AS BIGINT) AS component,
        |  CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT)
        |    AS component_size,
        |  FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.component
        |    ORDER BY t.text_len DESC, c.doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS representative_id,
        |  c.doc_id = FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.component
        |    ORDER BY t.text_len DESC, c.doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS is_representative,
        |  CAST(64 AS BIGINT) AS band_bits
        |FROM comp c JOIN t USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tokenRows = docs.select(col("doc_id"),
        explode(TA.tokens(col("text"))).as("token"))
      // Width from Dedup.autoBandPolicy (r16): picks 64-bit at both
      // gate SFs (500/5,000 docs inside the (256, 65536] window);
      // the choice itself is GATED via the band_bits
      // output column (twin pins 64), so a regenerated-testdata draw
      // that flips the policy fails the hash gate on a self-naming
      // column instead of a confusing pair-set diff. The cap
      // (DefaultBucketCap=512) is REPLAYED by the twin's bucket-size
      // window, so equivalence no longer rests on the cap staying a
      // no-op (r15 ADVICE). Sizing count is the memoized
      // Tables.documentsCount — one action per JVM, not per run
      // (r16 ADVICE, the knownN pattern).
      val bits = Dedup.autoBandPolicy(Tables.documentsCount(s, d))
      val pairs = Dedup.simhashNearDups(
        Dedup.simhashForWidth(bits, tokenRows), bits = bits)
      val cc = Dedup.nearDupLabels(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val w = Window.partitionBy(col("component"))
        .orderBy(col("text_len").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cc.select(col("id").as("doc_id"), col("component"))
        .join(docs.select(col("doc_id"),
          length(trim(col("text"))).cast("long").as("text_len")),
          Seq("doc_id"))
        .withColumn("component_size",
          count(lit(1)).over(Window.partitionBy(col("component")))
            .cast("long"))
        .withColumn("representative_id", first(col("doc_id")).over(w))
        .withColumn("is_representative",
          col("doc_id") === col("representative_id"))
        .withColumn("band_bits", lit(bits).cast("long"))
        .select("doc_id", "component", "component_size",
          "representative_id", "is_representative", "band_bits")
        .orderBy("doc_id")
    }
  }

  /** Dedup — CROSS-SHARD near-dup merge through the REAL
    * [[Dedup.shardedNearDupLabels]] (r15 VERDICT task #6): the corpus
    * is split into 3 salted shards (doc_id % 3 — every shard sees the
    * same doc mix, the deployment shape where each shard's banded
    * pass is bounded by SHARD size), per-shard pairs come from ONE
    * (shard, band, band_key)-keyed banded pass, cross-shard
    * band-collision edges are Hamming-verified and contracted to
    * per-shard labels, and a label-grain closure merges them into a
    * corpus-level labeling. The gate is the EXACTNESS theorem itself:
    * the DuckDB twin computes the SINGLE-PASS closure (same recursive
    * CTE + replayed cap as dd_cluster_canonical), so the hash match
    * proves sharded labels == single-pass labels row-for-row —
    * min-label associativity made concrete cross-engine at both SFs.
    * Width pinned at 64-bit in both engines (oracle override, the
    * autoCoarsePolicy precedent): the theorem needs both arms on ONE
    * width, and the twin's band substrings are 16 chars. */
  val ddShardedClusterMerge: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_sharded_cluster_merge",
      s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), sized AS (
        |  SELECT doc_id, shard, simhash, band, band_key,
        |    COUNT(*) OVER (PARTITION BY shard, band, band_key)
        |      AS bucket_size
        |  FROM (
        |    SELECT doc_id, doc_id % 3 AS shard, simhash, b AS band,
        |      substr(simhash, b * 16 + 1, 16) AS band_key
        |    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b))
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 512) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 512) r
        |    USING (shard, band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 512)
        |    WINDOW w AS (PARTITION BY shard, band, band_key
        |      ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |  UNION ALL
        |  SELECT l.doc_id, r.doc_id, l.simhash, r.simhash
        |  FROM sized l JOIN sized r USING (band, band_key)
        |  WHERE l.shard <> r.shard AND l.doc_id < r.doc_id
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component
        |  FROM r GROUP BY a
        |)
        |SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS shard, component,
        |  CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
        |    AS component_size
        |FROM comp ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tokenRows = docs.select(col("doc_id"),
        explode(TA.tokens(col("text"))).as("token"))
      val sharded = Dedup.simhash64FromTokens(tokenRows)
        .withColumn("shard", col("doc_id") % 3)
      // Node set seeded from Tables.documents, not from the signature
      // frame (r16 ADVICE): a doc tokenizing to empty has no signature
      // row — it can't pair with anything, so its component is itself —
      // while the twin seeds the closure from every documents row.
      val labels = docs.select(col("doc_id").as("id"))
        .join(Dedup.shardedNearDupLabels(sharded, bits = 64),
          Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
      labels.select(col("id").as("doc_id"),
          (col("id") % 3).cast("long").as("shard"), col("component"))
        .withColumn("component_size",
          count(lit(1)).over(Window.partitionBy(col("component")))
            .cast("long"))
        .orderBy("doc_id")
    }
  }

  /** Dedup — INCREMENTAL cross-shard merge through the REAL persisted
    * [[graft.llm.ShardedNearDupIndex]] chain (r16 VERDICT task #2 —
    * the deployment form `shardedNearDupLabels`'s scaladoc promised is
    * now code): the corpus's 3 salted shards are folded into COMMITTED
    * state ONE AT A TIME — seed shard 0 through the bulk migration
    * path (seedShards: labels upsert-delta v0 + band-row delta via
    * AtomicTable), add shard 1 against the committed band index,
    * commit ONLY the changed label rows (r18 upsert-delta layout),
    * add shard 2 — and the final committed labels (last-writer-wins
    * resolved view) are compared against a DuckDB twin computing the
    * SINGLE-PASS closure over the whole corpus. The hash match IS the left-fold exactness
    * theorem: per-shard banding + committed-index cross probes +
    * min-label incremental merge == one all-shards pass == the
    * unsharded labels, row-for-row at both SFs. The ACROSS work per
    * step touches ONE shard's banded rows against a scanned index —
    * never all shards' rows in one join (the r16 weak mark). Width
    * pinned at 64-bit in both engines (oracle override; the twin's
    * band substrings are 16 chars); node set seeded from
    * Tables.documents in both engines (r16 ADVICE). */
  val ddShardedIncrementalMerge: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_sharded_incremental_merge",
      s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), sized AS (
        |  SELECT doc_id, shard, simhash, band, band_key,
        |    COUNT(*) OVER (PARTITION BY shard, band, band_key)
        |      AS bucket_size
        |  FROM (
        |    SELECT doc_id, doc_id % 3 AS shard, simhash, b AS band,
        |      substr(simhash, b * 16 + 1, 16) AS band_key
        |    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b))
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 512) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 512) r
        |    USING (shard, band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 512)
        |    WINDOW w AS (PARTITION BY shard, band, band_key
        |      ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |  UNION ALL
        |  SELECT l.doc_id, r.doc_id, l.simhash, r.simhash
        |  FROM sized l JOIN sized r USING (band, band_key)
        |  WHERE l.shard <> r.shard AND l.doc_id < r.doc_id
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component
        |  FROM r GROUP BY a
        |)
        |SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS shard, component,
        |  CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
        |    AS component_size,
        |  CAST(3 AS BIGINT) AS shards_processed
        |FROM comp ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tokenRows = docs.select(col("doc_id"),
        explode(TA.tokens(col("text"))).as("token"))
      // One signature pass shared by the seed and both addShard calls
      // (between-plans materialization: each step runs several
      // separately-executed commit jobs over its shard's slice).
      val sig = Dedup.simhash64FromTokens(tokenRows).localCheckpoint(true)
      val dir = Q.tempDir("graft_shardinc").toString
      // Seed shard 0 through the BULK migration path (seedShards — the
      // r18 trim: the left-fold theorem needs folds over committed
      // state, not a maximal replay, and seeding exercises the
      // single-pass bootstrap the deployment migration uses), then fold
      // shards 1 and 2 through the committed chain.
      graft.llm.ShardedNearDupIndex.seedShards(s, dir,
        sig.filter(col("doc_id") % 3 === 0).withColumn("shard", lit(0L)),
        bits = 64)
      (1 to 2).foreach { k =>
        graft.llm.ShardedNearDupIndex.addShard(s, dir,
          sig.filter(col("doc_id") % 3 === k), bits = 64)
        ()
      }
      val labels = graft.llm.ShardedNearDupIndex.loadLabels(s, dir)
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("doc_id") % 3).cast("long").as("shard"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .withColumn("component_size",
          count(lit(1)).over(Window.partitionBy(col("component")))
            .cast("long"))
        .withColumn("shards_processed", lit(3L))
        .orderBy("doc_id")
    }
  }

  /** Dedup — HOT-BUCKET CAP fixture for the SHARDED near-dup paths
    * (r16 ADVICE #2): the single-pass sharded gate's twin replays a
    * corpus-level cap, so its equivalence holds only while the cap is
    * a no-op. Here a deliberately homogeneous slice (12 shared tokens
    * + one of 3 variant tokens, the dd_simhash_hot_bucket_chain
    * fixture) drives whole variant groups to IDENTICAL signatures
    * split across 2 shards, a tiny cap (8) ENGAGES inside every
    * shard's buckets, and the gate pins THREE computations equal:
    * [[Dedup.shardedNearDupLabels]] (single-pass, per-shard-keyed
    * caps, uncapped cross stage) as `component`, the incremental
    * [[graft.llm.ShardedNearDupIndex]] fold as `incr_component`, and
    * a DuckDB twin that STRUCTURALLY REPLAYS the shared semantics —
    * per-(shard, band, band_key) bucket windows with capped all-pairs
    * + over-cap lead-chains, plus uncapped cross-shard candidates —
    * then closes. The two Spark forms share `verifiedPairs`' cap
    * structure exactly (per-shard buckets partition identically
    * whether keyed in one pass or banded shard-at-a-time), so
    * engine equivalence in the cap-ENGAGED regime is now gated, not
    * reasoned. */
  val ddShardedHotBucketMerge: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_sharded_hot_bucket_merge",
      s"""WITH RECURSIVE ids AS (
        |  SELECT doc_id, CAST((doc_id // 10) % 2 AS BIGINT) AS shard
        |  FROM documents WHERE doc_id % 10 = 0
        |), tok AS (
        |  SELECT doc_id,
        |    'w' || CAST(unnest(generate_series(0, 11)) AS VARCHAR) AS token
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 'v' || CAST(doc_id % 3 AS VARCHAR) FROM ids
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), sized AS (
        |  SELECT s.doc_id, i.shard, s.simhash, b.band,
        |    substr(s.simhash, b.band * 16 + 1, 16) AS band_key,
        |    COUNT(*) OVER (PARTITION BY i.shard, b.band,
        |      substr(s.simhash, b.band * 16 + 1, 16)) AS bucket_size
        |  FROM sh s JOIN ids i USING (doc_id)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 8) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 8) r
        |    USING (shard, band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 8)
        |    WINDOW w AS (PARTITION BY shard, band, band_key
        |      ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |  UNION ALL
        |  SELECT l.doc_id, r.doc_id, l.simhash, r.simhash
        |  FROM sized l JOIN sized r USING (band, band_key)
        |  WHERE l.shard <> r.shard AND l.doc_id < r.doc_id
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM ids
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component
        |  FROM r GROUP BY a
        |)
        |SELECT c.doc_id, i.shard, c.component,
        |  c.component AS incr_component,
        |  CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT)
        |    AS component_size
        |FROM comp c JOIN ids i USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ids = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          expr("(doc_id div 10) % 2").cast("long").as("shard"))
      val tokenRows = ids.select(col("doc_id"),
          explode(array((0 until 12).map(i => lit(s"w$i")): _*)).as("token"))
        .unionByName(ids.select(col("doc_id"),
          concat(lit("v"), (col("doc_id") % 3).cast("string")).as("token")))
      val sig = Dedup.simhash64FromTokens(tokenRows).localCheckpoint(true)
      val sharded = sig.join(ids, Seq("doc_id"))
      val single = Dedup.shardedNearDupLabels(sharded,
          maxBucketSize = 8, bits = 64)
        .withColumnRenamed("id", "doc_id")
      val dir = Q.tempDir("graft_shardhot").toString
      (0 to 1).foreach { k =>
        graft.llm.ShardedNearDupIndex.addShard(s, dir,
          sig.join(ids.filter(col("shard") === k).select("doc_id"),
            Seq("doc_id"), "left_semi"),
          bits = 64, maxBucketSize = 8)
        ()
      }
      val incr = graft.llm.ShardedNearDupIndex.loadLabels(s, dir)
        .select(col("id").as("doc_id"),
          col("component").as("incr_component"))
      ids.select(col("doc_id"), col("shard"))
        .join(single, Seq("doc_id"))
        .join(incr, Seq("doc_id"))
        .withColumn("component_size",
          count(lit(1)).over(Window.partitionBy(col("component")))
            .cast("long"))
        .select("doc_id", "shard", "component", "incr_component",
          "component_size")
        .orderBy("doc_id")
    }
  }

  /** Dedup — INDEX-SIDE PROBE CAP for the incremental cross-shard
    * merge (r18; VERDICT r17 stretch #8): a pathologically hot band
    * key in a 100-TB committed index makes one probe's candidates
    * ∝ index, so [[graft.llm.Dedup.addShardNearDups]]'s `probeCap`
    * ranks committed index rows per (band, band_key) by doc_id and
    * probes only rank ≤ cap — deterministic, replayable. Here the
    * homogeneous fixture (the hot-bucket construction: 12 shared
    * tokens + one of 3 variants over a 2-shard split) drives identical
    * signatures, shard 0 is seeded, and shard 1 folds with
    * `probeCap = 4` ENGAGED (variant buckets are ~an order of
    * magnitude over it). The twin replays the exact rank rule with
    * ROW_NUMBER over shard 0's banded rows and closes over
    * within(both shards) ∪ capped-across — the gate pins the capped
    * fold == the replayed closure cross-engine at both SFs (min-label
    * associativity: fold == one closure over the union of its edge
    * sets). Exactness vs the UNCAPPED single pass is deliberately
    * sacrificed when the cap engages — same graceful-degradation
    * contract as `maxBucketSize`. */
  val ddShardedProbeCapMerge: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_sharded_probe_cap_merge",
      s"""WITH RECURSIVE ids AS (
        |  SELECT doc_id, CAST((doc_id // 10) % 2 AS BIGINT) AS shard
        |  FROM documents WHERE doc_id % 10 = 0
        |), tok AS (
        |  SELECT doc_id,
        |    'w' || CAST(unnest(generate_series(0, 11)) AS VARCHAR) AS token
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 'v' || CAST(doc_id % 3 AS VARCHAR) FROM ids
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), banded AS (
        |  SELECT s.doc_id, i.shard, s.simhash, b.band,
        |    substr(s.simhash, b.band * 16 + 1, 16) AS band_key
        |  FROM sh s JOIN ids i USING (doc_id)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
        |), sized AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY shard, band, band_key)
        |    AS bucket_size
        |  FROM banded
        |), idxcap AS (
        |  SELECT * FROM (
        |    SELECT doc_id, simhash, band, band_key,
        |      ROW_NUMBER() OVER (PARTITION BY band, band_key
        |        ORDER BY doc_id) AS rk
        |    FROM banded WHERE shard = 0)
        |  WHERE rk <= 4
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 512) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 512) r
        |    USING (shard, band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 512)
        |    WINDOW w AS (PARTITION BY shard, band, band_key
        |      ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |  UNION ALL
        |  SELECT l.doc_id, r.doc_id, l.simhash, r.simhash
        |  FROM idxcap l
        |  JOIN (SELECT * FROM banded WHERE shard = 1) r
        |    USING (band, band_key)
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3 AND doc_a <> doc_b
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM ids
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component
        |  FROM r GROUP BY a
        |)
        |SELECT c.doc_id, i.shard, c.component,
        |  CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT)
        |    AS component_size
        |FROM comp c JOIN ids i USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ids = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          expr("(doc_id div 10) % 2").cast("long").as("shard"))
      val tokenRows = ids.select(col("doc_id"),
          explode(array((0 until 12).map(i => lit(s"w$i")): _*)).as("token"))
        .unionByName(ids.select(col("doc_id"),
          concat(lit("v"), (col("doc_id") % 3).cast("string")).as("token")))
      val sig = Dedup.simhash64FromTokens(tokenRows).localCheckpoint(true)
      val dir = Q.tempDir("graft_shardpcap").toString
      graft.llm.ShardedNearDupIndex.seedShards(s, dir,
        sig.join(ids.filter(col("shard") === 0).select("doc_id"),
            Seq("doc_id"), "left_semi")
          .withColumn("shard", lit(0L)),
        bits = 64)
      graft.llm.ShardedNearDupIndex.addShard(s, dir,
        sig.join(ids.filter(col("shard") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi"),
        bits = 64, probeCap = Some(4))
      val labels = graft.llm.ShardedNearDupIndex.loadLabels(s, dir)
        .withColumnRenamed("id", "doc_id")
      ids.select(col("doc_id"), col("shard"))
        .join(labels, Seq("doc_id"))
        .withColumn("component_size",
          count(lit(1)).over(Window.partitionBy(col("component")))
            .cast("long"))
        .select("doc_id", "shard", "component", "component_size")
        .orderBy("doc_id")
    }
  }

  /** Dedup — STORED probe rank (r19; VERDICT r18 task #2): compaction
    * materializes `probe_rk` per (band, band_key) on the committed
    * band index ([[graft.llm.ShardedNearDupIndex.compactBands]]), so a
    * capped fold FILTERS the compacted bulk instead of windowing the
    * whole index, and only post-compaction delta rows are ranked live
    * — AFTER the capped base rows per key ("first committed wins probe
    * slots", stable across folds). Chain: seed shard 0 → compactBands
    * (ranks committed) → fold shard 1 capped (probes stored ranks) →
    * fold shard 2 capped (probes stored ranks ∪ shard 1's delta rows
    * rank-continued behind them). The twin replays BOTH tiers with
    * ROW_NUMBER + the base-count continuation and closes over
    * within(3 shards) ∪ across(fold 1) ∪ across(fold 2). probeCap = 12
    * so the sf0.01 draw exercises rank CONTINUATION (shard-0 variant
    * buckets ≈ 5–6 < 12 leave slots for shard-1 rows) and the sf0.1
    * draw exercises base SATURATION (buckets ≈ 55 > 12 — delta tier
    * contributes zero), covering both regimes across the gate SFs. */
  val ddShardedProbeRankCompact: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_sharded_probe_rank_compact",
      s"""WITH RECURSIVE ids AS (
        |  SELECT doc_id, CAST((doc_id // 10) % 3 AS BIGINT) AS shard
        |  FROM documents WHERE doc_id % 10 = 0
        |), tok AS (
        |  SELECT doc_id,
        |    'w' || CAST(unnest(generate_series(0, 11)) AS VARCHAR) AS token
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 'v' || CAST((doc_id // 10) % 2 AS VARCHAR) FROM ids
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), banded AS (
        |  SELECT s.doc_id, i.shard, s.simhash, b.band,
        |    substr(s.simhash, b.band * 16 + 1, 16) AS band_key
        |  FROM sh s JOIN ids i USING (doc_id)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
        |), sized AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY shard, band, band_key)
        |    AS bucket_size
        |  FROM banded
        |), base_rk AS (
        |  SELECT doc_id, simhash, band, band_key,
        |    ROW_NUMBER() OVER (PARTITION BY band, band_key
        |      ORDER BY doc_id) AS rk
        |  FROM banded WHERE shard = 0
        |), base_cap AS (
        |  SELECT * FROM base_rk WHERE rk <= 12
        |), basec AS (
        |  SELECT band, band_key, COUNT(*) AS n FROM base_cap
        |  GROUP BY 1, 2
        |), d1_rk AS (
        |  SELECT doc_id, simhash, band, band_key,
        |    ROW_NUMBER() OVER (PARTITION BY band, band_key
        |      ORDER BY doc_id) AS rk
        |  FROM banded WHERE shard = 1
        |), d1_cap AS (
        |  SELECT d.doc_id, d.simhash, d.band, d.band_key
        |  FROM d1_rk d LEFT JOIN basec b USING (band, band_key)
        |  WHERE d.rk + COALESCE(b.n, 0) <= 12
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 512) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 512) r
        |    USING (shard, band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 512)
        |    WINDOW w AS (PARTITION BY shard, band, band_key
        |      ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |  UNION ALL
        |  SELECT c.doc_id, p.doc_id, c.simhash, p.simhash
        |  FROM base_cap c
        |  JOIN (SELECT * FROM banded WHERE shard = 1) p
        |    USING (band, band_key)
        |  UNION ALL
        |  SELECT c.doc_id, p.doc_id, c.simhash, p.simhash
        |  FROM (SELECT doc_id, simhash, band, band_key FROM base_cap
        |        UNION ALL
        |        SELECT doc_id, simhash, band, band_key FROM d1_cap) c
        |  JOIN (SELECT * FROM banded WHERE shard = 2) p
        |    USING (band, band_key)
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3 AND doc_a <> doc_b
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM ids
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component
        |  FROM r GROUP BY a
        |)
        |SELECT c.doc_id, i.shard, c.component,
        |  CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT)
        |    AS component_size
        |FROM comp c JOIN ids i USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ids = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          expr("(doc_id div 10) % 3").cast("long").as("shard"))
      val tokenRows = ids.select(col("doc_id"),
          explode(array((0 until 12).map(i => lit(s"w$i")): _*)).as("token"))
        .unionByName(ids.select(col("doc_id"),
          concat(lit("v"),
            expr("(doc_id div 10) % 2").cast("string")).as("token")))
      val sig = Dedup.simhash64FromTokens(tokenRows).localCheckpoint(true)
      val dir = Q.tempDir("graft_shardrank").toString
      graft.llm.ShardedNearDupIndex.seedShards(s, dir,
        sig.join(ids.filter(col("shard") === 0).select("doc_id"),
            Seq("doc_id"), "left_semi")
          .withColumn("shard", lit(0L)),
        bits = 64)
      graft.llm.ShardedNearDupIndex.compactBands(s, dir)
      (1 to 2).foreach { k =>
        graft.llm.ShardedNearDupIndex.addShard(s, dir,
          sig.join(ids.filter(col("shard") === k).select("doc_id"),
            Seq("doc_id"), "left_semi"),
          bits = 64, probeCap = Some(12))
        ()
      }
      val labels = graft.llm.ShardedNearDupIndex.loadLabels(s, dir)
        .withColumnRenamed("id", "doc_id")
      ids.select(col("doc_id"), col("shard"))
        .join(labels, Seq("doc_id"))
        .withColumn("component_size",
          count(lit(1)).over(Window.partitionBy(col("component")))
            .cast("long"))
        .select("doc_id", "shard", "component", "component_size")
        .orderBy("doc_id")
    }
  }

  /** Dedup — URL canonicalization + dedup through the REAL
    * `TextAnalysis.canonicalizeUrl` / `Dedup.urlDedup`: synthesized
    * dirty URLs exercise every rule (uppercase scheme/host, default
    * ports, trailing slash, utm/fbclid stripping with kept params in
    * order, fragments, case-preserved paths); the DuckDB twin
    * canonicalizes with the same portable regex steps. Collision
    * groups arise from the modular construction. */
  val ddUrlDedup: Q = Q.sql(
    "dd_url_dedup",
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'https://' END ||
      |    CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END ||
      |    'Example' || CAST(doc_id % 40 AS VARCHAR) || '.COM' ||
      |    CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN ':80'
      |         WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END ||
      |    '/Products/' || CAST(doc_id % 5 AS VARCHAR) ||
      |    CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END ||
      |    '?utm_source=news&item=' || CAST(doc_id % 20 AS VARCHAR) ||
      |    '&fbclid=abc123' ||
      |    CASE WHEN doc_id % 4 = 0 THEN '#section' ELSE '' END AS url
      |  FROM documents
      |), c1 AS (
      |  SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS u FROM raw
      |), p1 AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(lower(regexp_extract(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?]*)', 1)), '.*@', '') AS hostport,
      |    regexp_replace(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^[^/?]*', '') AS afterhost
      |  FROM c1
      |), p2 AS (
      |  SELECT doc_id, scheme,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
      |         ELSE hostport END AS host,
      |    regexp_extract(afterhost, '^([^?]*)', 1) AS path,
      |    CASE WHEN contains(afterhost, '?')
      |         THEN regexp_replace(afterhost, '^[^?]*\?', '')
      |         ELSE '' END AS query
      |  FROM p1
      |), canon AS (
      |  SELECT doc_id,
      |    scheme || '://' || host ||
      |    CASE WHEN path = '' OR path = '/' THEN ''
      |         ELSE regexp_replace(path, '/$', '') END ||
      |    CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canonical_url
      |  FROM (
      |    SELECT *, array_to_string(list_filter(string_split(query, '&'),
      |      p -> p <> '' AND NOT starts_with(p, 'utm_')
      |        AND regexp_extract(p, '^([^=]*)', 1) NOT IN ('fbclid', 'gclid')), '&') AS kept
      |    FROM p2)
      |)
      |SELECT doc_id, canonical_url,
      |  MIN(doc_id) OVER (PARTITION BY canonical_url) AS canonical_id,
      |  COUNT(*) OVER (PARTITION BY canonical_url) AS dup_group_size,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY canonical_url) AS is_duplicate
      |FROM canon ORDER BY doc_id""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    val raw = Tables.documents(s, d).select(id,
      concat(
        when(id % 3 === 0, "HTTP://").otherwise("https://"),
        when(id % 2 === 0, "WWW.").otherwise("www."),
        lit("Example"), (id % 40).cast("string"), lit(".COM"),
        when(id % 7 === 0 && id % 3 === 0, ":80")
          .when(id % 7 === 0, ":443").otherwise(""),
        lit("/Products/"), (id % 5).cast("string"),
        when(id % 6 === 0, "/").otherwise(""),
        lit("?utm_source=news&item="), (id % 20).cast("string"),
        lit("&fbclid=abc123"),
        when(id % 4 === 0, "#section").otherwise("")).as("url"))
    Dedup.urlDedup(raw, col("doc_id"), col("url")).orderBy("doc_id")
  }

  /** Dedup — LINE-LEVEL boilerplate removal (CCNet/C4 pass) through the
    * REAL `Dedup.lineDedup`. The corpus has no newlines, so multi-line
    * docs are synthesized deterministically in BOTH engines: a footer in
    * every doc, a newsletter line in half, a rights line in a fifth —
    * all past the doc-frequency threshold and removed — plus the doc's
    * own 80-char prefix and a unique tail (kept; if a prefix ever
    * repeats past the threshold both engines drop it identically), and
    * a blank line (layout: never counted, always kept). */
  val ddLineDedup: Q = Q.sql(
    "dd_line_dedup",
    """WITH docs AS (
      |  SELECT doc_id,
      |    'COPYRIGHT 2024 Example Corp' || chr(10) ||
      |    CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter'
      |         ELSE 'intro ' || CAST(doc_id AS VARCHAR) END || chr(10) ||
      |    substr(text, 1, 80) || chr(10) || chr(10) ||
      |    CASE WHEN doc_id % 5 = 0 THEN 'all rights reserved' || chr(10)
      |         ELSE '' END ||
      |    'doc tail ' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents
      |), split AS (
      |  SELECT doc_id, string_split(text, chr(10)) AS parts FROM docs
      |), lines AS (
      |  SELECT doc_id,
      |    unnest(generate_series(1, len(parts))) AS line_no,
      |    unnest(parts) AS line
      |  FROM split
      |), boiler AS (
      |  SELECT md5(lower(trim(line))) AS line_fp
      |  FROM lines WHERE trim(line) <> ''
      |  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 30
      |), flagged AS (
      |  SELECT l.doc_id, l.line_no, l.line,
      |    b.line_fp IS NOT NULL AS is_boiler
      |  FROM lines l
      |  LEFT JOIN boiler b ON md5(lower(trim(l.line))) = b.line_fp
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  COALESCE(STRING_AGG(CASE WHEN NOT is_boiler THEN line END,
      |    chr(10) ORDER BY line_no), '') AS cleaned_text
      |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    val docs = Tables.documents(s, d).select(id,
      concat_ws("\n",
        lit("COPYRIGHT 2024 Example Corp"),
        when(id % 2 === 0, lit("Subscribe to our newsletter"))
          .otherwise(concat(lit("intro "), id.cast("string"))),
        substring(col("text"), 1, 80),
        lit(""),
        when(id % 5 === 0, lit("all rights reserved")),
        concat(lit("doc tail "), id.cast("string"))).as("text"))
    Dedup.lineDedup(docs, col("doc_id"), col("text"), maxDocFreq = 30)
      .orderBy("doc_id")
  }

  /** Dedup — duplicated-substring span coverage (Lee et al. exact-substring
    * signal): per doc, token positions covered by 5-grams that occur in
    * another document, via cross-doc k-gram frequency + interval union.
    * DuckDB twin indexes lists directly and zips start positions with
    * fingerprints through the parallel-unnest idiom; the running-max
    * interval merge is the same window in both engines. */
  val ddDupSpanCoverage: Q = Q.sql(
    "dd_dup_span_coverage",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    unnest(generate_series(1, len(toks) - 4)) - 1 AS start,
      |    unnest(list_transform(generate_series(1, len(toks) - 4),
      |      i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS fp
      |  FROM t
      |), shared AS (
      |  SELECT fp FROM sh GROUP BY fp HAVING COUNT(DISTINCT doc_id) > 1
      |), spans AS (
      |  SELECT doc_id, start, start + 4 AS fin FROM sh JOIN shared USING (fp)
      |), merged AS (
      |  SELECT doc_id,
      |    GREATEST(fin - GREATEST(
      |      COALESCE(MAX(fin) OVER (PARTITION BY doc_id ORDER BY start
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1),
      |      start - 1), 0) AS covered
      |  FROM spans
      |), perdoc AS (
      |  SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS covered_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_dup_spans
      |  FROM merged GROUP BY doc_id
      |)
      |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  COALESCE(n_dup_spans, 0) AS n_dup_spans,
      |  COALESCE(covered_tokens, 0) AS covered_tokens
      |FROM t LEFT JOIN perdoc ON t.doc_id = perdoc.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    Dedup.dupSpanCoverage(Tables.documents(s, d), col("doc_id"),
      col("text"), k = 5)
      .orderBy("doc_id")
  }

  /** Dedup — exact-substring DELETION (Dedup.dupSpanRemoval), the
    * transform half of the Lee et al. pass that `dd_dup_span_coverage`
    * measures: cross-doc 5-grams survive only in the smallest-doc_id
    * canonical occurrence; every other occurrence's positions are
    * deleted and the text reassembled in order. The rebuilt strings
    * themselves are hash-gated, so mark generation, the anti join, AND
    * reassembly order all have to be exact. */
  val ddDupSpanRemoval: Q = Q.sql(
    "dd_dup_span_removal",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    unnest(generate_series(1, len(toks) - 4)) - 1 AS start,
      |    unnest(list_transform(generate_series(1, len(toks) - 4),
      |      i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS fp
      |  FROM t
      |), owners AS (
      |  SELECT fp, MIN(doc_id) AS owner FROM sh
      |  GROUP BY fp HAVING COUNT(DISTINCT doc_id) > 1
      |), marks AS (
      |  SELECT DISTINCT s.doc_id,
      |    unnest(generate_series(s.start, s.start + 4)) AS pos
      |  FROM sh s JOIN owners o USING (fp)
      |  WHERE s.doc_id <> o.owner
      |), tokpos AS (
      |  SELECT doc_id,
      |    unnest(generate_series(1, len(toks))) - 1 AS pos,
      |    unnest(toks) AS token
      |  FROM t
      |), kept AS (
      |  SELECT tp.doc_id, tp.pos, tp.token
      |  FROM tokpos tp LEFT JOIN marks m
      |    ON m.doc_id = tp.doc_id AND m.pos = tp.pos
      |  WHERE m.doc_id IS NULL
      |), rebuilt AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    STRING_AGG(token, ' ' ORDER BY pos) AS cleaned_text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(toks) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
      |  COALESCE(cleaned_text, '') AS cleaned_text
      |FROM t LEFT JOIN rebuilt ON rebuilt.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    Dedup.dupSpanRemoval(Tables.documents(s, d), col("doc_id"),
      col("text"), k = 5)
      .orderBy("doc_id")
  }

  /** Dedup — MinHash + LSH banding (4 bands × 2 rows, md5-seeded) with
    * exact n-gram-Jaccard verification of the candidates; emits pairs
    * with jaccard >= 0.8. Covers both the minhash-LSH and ngram-jaccard
    * operators end-to-end. */
  val ddMinhashLsh: Q = Q.sql(
    "dd_minhash_lsh_jaccard",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
      |  FROM t
      |), bands AS (
      |  SELECT doc_id, b AS band,
      |    md5(concat_ws('|',
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2 AS VARCHAR) || '|' || x))),
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2+1 AS VARCHAR) || '|' || x))))) AS band_key
      |  FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bands a JOIN bands c USING (band, band_key)
      |  WHERE a.doc_id < c.doc_id
      |), shd AS (
      |  SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id
      |), inter AS (
      |  SELECT doc_a, doc_b, COUNT(*) AS intersection_size
      |  FROM cand
      |  JOIN shd x ON x.doc_id = doc_a
      |  JOIN shd y ON y.doc_id = doc_b AND y.shingle = x.shingle
      |  GROUP BY doc_a, doc_b
      |)
      |SELECT doc_a, doc_b, intersection_size,
      |  sa.n + sb.n - intersection_size AS union_size,
      |  CAST(intersection_size AS DOUBLE) / (sa.n + sb.n - intersection_size) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE CAST(intersection_size AS DOUBLE) / (sa.n + sb.n - intersection_size) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // Consumed 4× downstream (signatures, both intersection sides, set
    // sizes) — shared by RECOMPUTE: the repeated distinct/aggregate
    // subplans are identical, so Catalyst's exchange reuse dedups them
    // (the executed plan carries 5 ReusedExchange nodes) and the query
    // runs 35% faster than with temp-parquet materialization (r07
    // min-of-3: 2.9 s → 1.85 s; .cache() slower still — SCALE.md).
    val shingled =
      TA.shingleRows(docs, col("doc_id"), col("text"), 3).distinct()
    // Both sides of the candidate self-join read the band table.
    val bands =
      Dedup.minhashBands(shingled, bands = 4, rowsPerBand = 2)
    // Production path: the hot-bucket cap is ON. 64 is a no-op on
    // testdata (measured max band-bucket size: 3 at sf0.01, 12 at
    // sf0.1 — oracle hash unchanged) but bounds a viral-boilerplate
    // bucket's all-pairs blow-up to chain pairs at corpus scale
    // (Dedup.lshCandidates scaladoc; hot-bucket test LlmSpec).
    val candidates = Dedup.lshCandidates(bands, maxBucketSize = 64)
    Dedup.jaccardVerify(candidates, shingled)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "intersection_size", "union_size", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** MINHASH ESTIMATOR ACCURACY (Dedup.minhashEstimate) — for every
    * LSH candidate pair: the k=8 signature match-fraction estimate,
    * the exact shingle-set Jaccard, and the absolute error in integer
    * ppm. The sketch-vs-truth measurement (HLL/Count-Min discipline)
    * that tells a deployment what k buys BEFORE trusting a banding
    * threshold — and the error itself is hash-gated. */
  val ddMinhashEstimate: Q = Q.sql(
    "dd_minhash_estimate",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
      |  FROM t
      |), sigs AS (
      |  SELECT doc_id, i,
      |    list_min(list_transform(sh,
      |      x -> md5('mh' || CAST(i AS VARCHAR) || '|' || x))) AS sig
      |  FROM s CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) ii
      |), bands AS (
      |  SELECT doc_id, b AS band,
      |    md5(concat_ws('|',
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2 AS VARCHAR) || '|' || x))),
      |      list_min(list_transform(sh, x -> md5('mh' || CAST(b*2+1 AS VARCHAR) || '|' || x))))) AS band_key
      |  FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      |  FROM bands a JOIN bands c USING (band, band_key)
      |  WHERE a.doc_id < c.doc_id
      |), m AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(SUM(CASE WHEN x.sig = y.sig THEN 1 ELSE 0 END) AS BIGINT)
      |      AS est_matches
      |  FROM cand c JOIN sigs x ON x.doc_id = c.doc_a
      |  JOIN sigs y ON y.doc_id = c.doc_b AND y.i = x.i
      |  GROUP BY 1, 2
      |), shd AS (
      |  SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id
      |), inter AS (
      |  SELECT doc_a, doc_b, COUNT(*) AS intersection_size
      |  FROM cand
      |  JOIN shd x ON x.doc_id = doc_a
      |  JOIN shd y ON y.doc_id = doc_b AND y.shingle = x.shingle
      |  GROUP BY doc_a, doc_b
      |)
      |SELECT m.doc_a, m.doc_b, m.est_matches,
      |  CAST(i.intersection_size AS BIGINT) AS intersection_size,
      |  CAST(sa.n + sb.n - i.intersection_size AS BIGINT) AS union_size,
      |  CAST(m.est_matches * 1000000 // 8 AS BIGINT) AS est_jaccard_ppm,
      |  CAST(i.intersection_size * 1000000
      |    // (sa.n + sb.n - i.intersection_size) AS BIGINT)
      |    AS exact_jaccard_ppm,
      |  CAST(abs(m.est_matches * (sa.n + sb.n - i.intersection_size)
      |    - i.intersection_size * 8) * 1000000
      |    // (8 * (sa.n + sb.n - i.intersection_size)) AS BIGINT)
      |    AS abs_err_ppm
      |FROM m JOIN inter i USING (doc_a, doc_b)
      |JOIN sizes sa ON sa.doc_id = m.doc_a
      |JOIN sizes sb ON sb.doc_id = m.doc_b
      |ORDER BY m.doc_a, m.doc_b""".stripMargin) { (s, d) =>
    val shingled = TA.shingleRows(Tables.documents(s, d),
      col("doc_id"), col("text"), 3).distinct()
    val sigDf = Dedup.minhashSignatures(shingled, 8)
    val bands = Dedup.minhashBands(shingled, bands = 4, rowsPerBand = 2)
    val candidates = Dedup.lshCandidates(bands)
    Dedup.minhashEstimate(candidates, sigDf, shingled, k = 8)
      .orderBy("doc_a", "doc_b")
  }

  /** LSH BAND-CONFIG SWEEP — the same 8 MinHash rows banded three ways
    * ((8,1), (4,2), (2,4)): per config, the candidate-pair count, how
    * many candidates verify at exact Jaccard ≥ 0.8 (integer
    * cross-multiplied), and the false-candidate count. The S-curve
    * trade-off (more, narrower bands → more candidates AND more noise)
    * measured in-engine — the tuning decision behind every banding
    * deployment, as `ann_recall_curve` is for IVF probes. Exact
    * Jaccard is computed ONCE over the distinct pair set, then each
    * config's membership joins back. */
  val ddLshBandSweep: Q = {
    def sig(k: Int) = s"list_min(list_transform(sh, x -> md5('mh$k|' || x)))"
    def bcfg(b: Int, r: Int): String =
      (0 until b).map { i =>
        val key =
          if (r == 1) s"md5(${sig(i)})"
          else s"md5(concat_ws('|', ${(i * r until (i + 1) * r)
            .map(sig).mkString(", ")}))"
        s"SELECT doc_id, $i AS band, $key AS band_key FROM s"
      }.mkString("\n  UNION ALL ")
    val candArm = (b: Int, r: Int) =>
      s"""SELECT DISTINCT $b AS bands, $r AS rows_per_band,
        |    a.doc_id AS doc_a, c.doc_id AS doc_b
        |  FROM (${bcfg(b, r)}) a JOIN (${bcfg(b, r)}) c
        |    USING (band, band_key)
        |  WHERE a.doc_id < c.doc_id""".stripMargin
    Q.sql(
      "dd_lsh_band_sweep",
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh
        |  FROM t
        |), allc AS (
        |  ${candArm(8, 1)}
        |  UNION ALL ${candArm(4, 2)}
        |  UNION ALL ${candArm(2, 4)}
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM allc
        |), shd AS (
        |  SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s
        |), sizes AS (
        |  SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id
        |), inter AS (
        |  SELECT doc_a, doc_b, COUNT(*) AS intersection_size
        |  FROM pairs
        |  JOIN shd x ON x.doc_id = doc_a
        |  JOIN shd y ON y.doc_id = doc_b AND y.shingle = x.shingle
        |  GROUP BY doc_a, doc_b
        |), verdicts AS (
        |  SELECT p.doc_a, p.doc_b,
        |    COALESCE(i.intersection_size * 10 >=
        |      8 * (sa.n + sb.n - i.intersection_size), FALSE) AS is_dup
        |  FROM pairs p
        |  LEFT JOIN inter i USING (doc_a, doc_b)
        |  JOIN sizes sa ON sa.doc_id = p.doc_a
        |  JOIN sizes sb ON sb.doc_id = p.doc_b
        |)
        |SELECT CAST(allc.bands AS BIGINT) AS bands,
        |  CAST(allc.rows_per_band AS BIGINT) AS rows_per_band,
        |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
        |  CAST(SUM(CASE WHEN v.is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_true_pairs,
        |  CAST(SUM(CASE WHEN v.is_dup THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_false_candidates
        |FROM allc JOIN verdicts v USING (doc_a, doc_b)
        |GROUP BY 1, 2
        |ORDER BY bands DESC""".stripMargin) { (s, d) =>
      val shingled = TA.shingleRows(Tables.documents(s, d),
        col("doc_id"), col("text"), 3).distinct()
      def candFor(b: Int, r: Int) =
        Dedup.lshCandidates(Dedup.minhashBands(shingled, b, r))
          .withColumn("bands", lit(b.toLong))
          .withColumn("rows_per_band", lit(r.toLong))
      val allc = candFor(8, 1).unionByName(candFor(4, 2))
        .unionByName(candFor(2, 4))
      val pairs = allc.select("doc_a", "doc_b").distinct()
      val verdicts = Dedup.jaccardVerify(pairs, shingled)
        .select(col("doc_a"), col("doc_b"),
          (col("intersection_size") * 10 >= col("union_size") * 8)
            .as("is_dup"))
      allc.join(verdicts, Seq("doc_a", "doc_b"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
        .groupBy("bands", "rows_per_band")
        .agg(count(lit(1)).cast("long").as("n_candidates"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).cast("long")
            .as("n_true_pairs"),
          sum(when(!col("is_dup"), 1L).otherwise(0L)).cast("long")
            .as("n_false_candidates"))
        .orderBy(col("bands").desc)
    }
  }

  /** Dedup — SimHash signatures (32-bit, md5-vote construction),
    * computed the distributed way (explode + one groupBy). */
  val ddSimhash: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 32).map(i =>
      s"SUM(CASE WHEN substr(md5(token), $i, 1) IN $highHex THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n      |    ")
    val bits = (1 to 32).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_simhash",
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |)
        |SELECT doc_id, $bits AS simhash
        |FROM v ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tokenRows = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("token"))
      Dedup.simhashFromTokens(tokenRows).orderBy("doc_id")
    }
  }

  /** Dedup — SimHash near-dup pairs: 4×8-bit pigeonhole bands generate
    * candidates (exact recall for Hamming ≤ 3), full Hamming distance
    * verifies (Dedup.simhashNearDups). EXPLICITLY KEPT on the 32-bit/
    * 8-bit-band layout (r15 decision): this query gates the
    * SMALL-CORPUS arm of the band-width A/B — the layout a user with
    * <10k docs per shard would run (cheaper signature, denser recall on
    * tiny corpora) — while the canonical cluster consumers
    * (`dd_cluster_canonical`, `t_leakage_safe_split`) and
    * `dd_simhash64_neardup` run the corpus-scale 64-bit/16-bit layout
    * ScaleBench measured linear. `dd_simhash_eval` gates BOTH layouts'
    * precision/recall side by side on shared ground truth. */
  val ddSimhashNearDup: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 32).map(i =>
      s"SUM(CASE WHEN substr(md5(token), $i, 1) IN $highHex THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n      |    ")
    val bits = (1 to 32).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_simhash_neardup",
      s"""WITH t AS (
        |  -- deterministic 1-in-10 sample: the synthetic corpus is DENSE
        |  -- in near-dups (short similar docs), so the full pair set is
        |  -- oracle-hostile; the operator itself is scope-free.
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |  WHERE doc_id % 10 = 0
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), banded AS (
        |  SELECT doc_id, simhash, b AS band,
        |    substr(simhash, b * 8 + 1, 8) AS band_key
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM banded l JOIN banded r USING (band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |)
        |SELECT doc_a, doc_b,
        |  CAST(hamming(sim_a, sim_b) AS BIGINT) AS hamming,
        |  LEAST(doc_a, doc_b) AS canonical_id
        |FROM cand
        |WHERE hamming(sim_a, sim_b) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val tokenRows = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("token"))
      // Production path: hot-bucket cap ON. Each 8-bit band has only
      // 256 possible keys, so at corpus scale EVERY bucket is hot;
      // 512 is a no-op on testdata (measured max bucket: 36 at
      // sf0.01, 325 at sf0.1 — oracle hash unchanged) but converts
      // the O(n²/256) blow-up to linear chain pairs beyond the cap
      // (Dedup.simhashNearDups scaladoc; hot-bucket test LlmSpec).
      Dedup.simhashNearDups(Dedup.simhashFromTokens(tokenRows),
          maxBucketSize = 512)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("doc_a", "doc_b")
    }
  }

  /** Dedup — WIDE-BAND (64-bit, 4×16-bit) SimHash near-dup pairs: the
    * corpus-scale band layout the r14 ScaleBench measurement motivates
    * (SCALE.md: the 32-bit layout's 256-key bands saturate — candidate
    * shuffle exponent ~1.5 — while 16-bit bands push saturation out
    * 256×; ScaleBench's simhash_band8/band16 A/B measures the
    * difference directly). Same Hamming ≤ 3 exact-recall pigeonhole
    * (4 bands at ANY width); the second 32 bits vote on an independent
    * salted md5 stream both engines replay verbatim
    * ([[Dedup.simhash64FromTokens]]). */
  val ddSimhash64NearDup: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_simhash64_neardup",
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |  WHERE doc_id % 10 = 0
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), banded AS (
        |  SELECT doc_id, simhash, b AS band,
        |    substr(simhash, b * 16 + 1, 16) AS band_key
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM banded l JOIN banded r USING (band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |)
        |SELECT doc_a, doc_b,
        |  CAST(hamming(sim_a, sim_b) AS BIGINT) AS hamming,
        |  LEAST(doc_a, doc_b) AS canonical_id
        |FROM cand
        |WHERE hamming(sim_a, sim_b) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val tokenRows = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("token"))
      Dedup.simhashNearDups(Dedup.simhash64FromTokens(tokenRows),
          maxBucketSize = 512, bits = 64)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("doc_a", "doc_b")
    }
  }

  /** Dedup — 128-BIT (4×32-bit-band) SimHash near-dup pairs: the NEXT
    * band widening ([[Dedup.simhash128FromTokens]]) for shards past
    * the measured 16-bit saturation onset (SCALE.md: 64-bit
    * shuffle-tail 1.16 at 150k docs → 1.74 at 500k; 32-bit bands
    * defer saturation another 65,536×). Same Hamming ≤ 3 exact-recall
    * pigeonhole at any width; streams 3–4 vote on md5('s3|'/'s4|' ∥
    * token), replayed verbatim by the twin. Completes the measured
    * band-width ladder (8 → 16 → 32-bit keys) as CODE, not prose. */
  val ddSimhash128NearDup: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 128).map { i =>
      val stream = (i - 1) / 32 + 1
      val pos = (i - 1) % 32 + 1
      val src = if (stream == 1) s"substr(md5(token), $pos, 1)"
        else s"substr(md5('s$stream|' || token), $pos, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    // variadic CONCAT, not a ||-chain: 128 nested binary concats
    // exceed DuckDB's binder recursion depth (max 128)
    val bits = (1 to 128).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END")
      .mkString("CONCAT(", ",\n      |      ", ")")
    Q.sql(
      "dd_simhash128_neardup",
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |  WHERE doc_id % 10 = 0
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), banded AS (
        |  SELECT doc_id, simhash, b AS band,
        |    substr(simhash, b * 32 + 1, 32) AS band_key
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM banded l JOIN banded r USING (band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |)
        |SELECT doc_a, doc_b,
        |  CAST(hamming(sim_a, sim_b) AS BIGINT) AS hamming,
        |  LEAST(doc_a, doc_b) AS canonical_id
        |FROM cand
        |WHERE hamming(sim_a, sim_b) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val tokenRows = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("token"))
      Dedup.simhashNearDups(Dedup.simhash128FromTokens(tokenRows),
          maxBucketSize = 512, bits = 128)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("doc_a", "doc_b")
    }
  }

  /** Dedup — the HOT-BUCKET CAP path of [[Dedup.simhashNearDups]],
    * oracle-gated (r15): every prior gate ran the cap as a measured
    * no-op, leaving the production degradation path — oversized
    * band buckets emit successor CHAIN pairs instead of all-pairs —
    * spec-only. Here a deliberately HOMOGENEOUS slice (12 shared
    * tokens per doc + one of 3 variant tokens) drives whole variant
    * groups to IDENTICAL signatures, so band buckets exceed a tiny
    * cap (8) and the chain path must carry connectivity: the gate
    * pins, through a recursive-CTE twin that REPLAYS the cap (bucket
    * count window → all-pairs under the cap, lead-chains over it),
    * that capped clusters still close into the SAME components —
    * "recall inside pathological buckets degrades gracefully, never
    * precision" as the operator scaladoc claims. At sf0.01 the ~8-9
    * doc groups straddle the cap so BOTH branches execute. */
  val ddSimhashHotBucketChain: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_simhash_hot_bucket_chain",
      s"""WITH RECURSIVE ids AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 20 = 0
        |), tok AS (
        |  SELECT doc_id,
        |    'w' || CAST(unnest(generate_series(0, 11)) AS VARCHAR) AS token
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 'v' || CAST(doc_id % 3 AS VARCHAR) FROM ids
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), sized AS (
        |  SELECT doc_id, simhash, band, band_key,
        |    COUNT(*) OVER (PARTITION BY band, band_key) AS bucket_size
        |  FROM (
        |    SELECT doc_id, simhash, b AS band,
        |      substr(simhash, b * 16 + 1, 16) AS band_key
        |    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b))
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 8) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 8) r
        |    USING (band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 8)
        |    WINDOW w AS (PARTITION BY band, band_key ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM ids
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component
        |  FROM r GROUP BY a
        |)
        |SELECT doc_id, component,
        |  CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
        |    AS component_size
        |FROM comp ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ids = Tables.documents(s, d).filter(col("doc_id") % 20 === 0)
        .select("doc_id")
      val tokenRows = ids.select(col("doc_id"),
          explode(array((0 until 12).map(i => lit(s"w$i")): _*)).as("token"))
        .unionByName(ids.select(col("doc_id"),
          concat(lit("v"), (col("doc_id") % 3).cast("string")).as("token")))
      val pairs = Dedup.simhashNearDups(
        Dedup.simhash64FromTokens(tokenRows),
        maxBucketSize = 8, bits = 64)
      val cc = Dedup.nearDupLabels(
        ids.select(col("doc_id").as("id")),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      cc.select(col("id").as("doc_id"), col("component"))
        .withColumn("component_size",
          count(lit(1)).over(Window.partitionBy(col("component")))
            .cast("long"))
        .orderBy("doc_id")
    }
  }

  /** SimHash QUALITY EVAL — precision/recall of the banded simhash
    * near-dup predictor against EXACT unigram-set Jaccard ground truth
    * (J ≥ 0.7, integer cross-multiplied), swept over the Hamming
    * threshold 0..3 AND over BOTH band layouts side by side (r15):
    * `layout` = 'b32' (32-bit signature, 4×8-bit bands — the kept
    * small-corpus arm, `dd_simhash_neardup`) vs 'b64' (64-bit,
    * 4×16-bit — the corpus-scale arm the canonical consumers run).
    * Both predictors share ONE ground truth, so the confusion matrices
    * are directly comparable — the quality half of ScaleBench's
    * band8/band16 cost A/B. Within the sweep range recall loss is
    * attributable ONLY to simhash itself — 4-band pigeonhole banding
    * surfaces every pair at Hamming ≤ 3 deterministically at ANY band
    * width (Dedup.simhashNearDups scaladoc), so pred(t) is exactly
    * {pairs : hamming ≤ t}, not a sampled approximation. Bits 1–32 of
    * the 64-bit signature ARE the 32-bit signature (same md5 stream,
    * [[Dedup.simhash64FromTokens]] scaladoc), so one token aggregation
    * feeds both arms. Same 1-in-10 doc sample and cap(512)-is-a-no-op
    * reasoning as `dd_simhash_neardup`. TP/FP/FN are integer counts
    * over the per-layout full-outer join of predicted and true pairs —
    * the whole confusion matrix is hash-gated in both engines. */
  val ddSimhashEval: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "dd_simhash_eval",
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |  WHERE doc_id % 10 = 0
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS sh64 FROM v
        |), sigs AS (
        |  SELECT 'b32' AS layout, doc_id, substr(sh64, 1, 32) AS sig,
        |    8 AS w FROM sh
        |  UNION ALL
        |  SELECT 'b64' AS layout, doc_id, sh64 AS sig, 16 AS w FROM sh
        |), banded AS (
        |  SELECT layout, doc_id, sig, b AS band,
        |    substr(sig, b * w + 1, w) AS band_key
        |  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
        |), pred AS (
        |  SELECT layout, doc_a, doc_b, MIN(h) AS h FROM (
        |    SELECT l.layout, l.doc_id AS doc_a, r.doc_id AS doc_b,
        |      hamming(l.sig, r.sig) AS h
        |    FROM banded l JOIN banded r USING (layout, band, band_key)
        |    WHERE l.doc_id < r.doc_id)
        |  WHERE h <= 3 GROUP BY 1, 2, 3
        |), sets AS (
        |  SELECT DISTINCT doc_id, unnest(toks) AS token FROM t
        |), sizes AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sets GROUP BY 1
        |), isect AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM sets a JOIN sets b USING (token)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        |), gt AS (
        |  SELECT doc_a, doc_b FROM isect
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE inter * 10 >= (sa.sz + sb.sz - inter) * 7
        |), gtl AS (
        |  SELECT layout, doc_a, doc_b FROM gt
        |  CROSS JOIN (SELECT unnest(['b32', 'b64']) AS layout)
        |), f AS (
        |  SELECT COALESCE(p.layout, g.layout) AS layout, p.h,
        |    g.doc_a IS NOT NULL AS is_gt,
        |    p.doc_a IS NOT NULL AS is_pred
        |  FROM pred p FULL OUTER JOIN gtl g
        |    ON g.layout = p.layout
        |    AND g.doc_a = p.doc_a AND g.doc_b = p.doc_b
        |)
        |SELECT layout, thr,
        |  CAST(SUM(CASE WHEN is_pred AND h <= thr THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_pred,
        |  CAST(SUM(CASE WHEN is_gt THEN 1 ELSE 0 END) AS BIGINT) AS n_gt,
        |  CAST(SUM(CASE WHEN is_pred AND h <= thr AND is_gt
        |    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(SUM(CASE WHEN is_pred AND h <= thr AND NOT is_gt
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(SUM(CASE WHEN is_gt AND (h IS NULL OR h > thr)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |FROM f CROSS JOIN (SELECT
        |  CAST(unnest(generate_series(0, 3)) AS BIGINT) AS thr)
        |GROUP BY layout, thr ORDER BY layout, thr""".stripMargin) { (s, d) =>
      import graft.Tables
      val docs = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
      val tokenRows = docs.select(col("doc_id"),
        explode(TA.tokens(col("text"))).as("token"))
      // one 64-bit signature pass feeds both arms: bits 1–32 of
      // simhash64FromTokens ARE simhashFromTokens' signature
      val sh64 = Dedup.simhash64FromTokens(tokenRows)
      val sh32 = sh64.select(col("doc_id"),
        substring(col("simhash"), 1, 32).as("simhash"))
      val pred = Dedup.simhashNearDups(sh32,
          maxHamming = 3, maxBucketSize = 512)
        .select(lit("b32").as("layout"), col("doc_a"), col("doc_b"),
          col("hamming").as("h"))
        .unionByName(Dedup.simhashNearDups(sh64,
            maxHamming = 3, maxBucketSize = 512, bits = 64)
          .select(lit("b64").as("layout"), col("doc_a"), col("doc_b"),
            col("hamming").as("h")))
      val sets = tokenRows.distinct()
      val sizes = sets.groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("sz"))
      val isect = sets.toDF("doc_a", "token")
        .join(sets.toDF("doc_b", "token"), Seq("token"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).cast("long").as("inter"))
      val gt = isect
        .join(sizes.toDF("doc_a", "sz_a"), Seq("doc_a"))
        .join(sizes.toDF("doc_b", "sz_b"), Seq("doc_b"))
        .filter(col("inter") * 10 >=
          (col("sz_a") + col("sz_b") - col("inter")) * 7)
        .select("doc_a", "doc_b")
      val gtl = gt.withColumn("layout", lit("b32"))
        .unionByName(gt.withColumn("layout", lit("b64")))
      val f = pred.join(gtl.withColumn("is_gt", lit(true)),
          Seq("layout", "doc_a", "doc_b"), "full_outer")
        .select(col("layout"), col("h"),
          coalesce(col("is_gt"), lit(false)).as("is_gt"),
          col("h").isNotNull.as("is_pred"))
      val thr = s.range(0, 4).select(col("id").as("thr"))
      f.crossJoin(broadcast(thr))
        .groupBy("layout", "thr")
        .agg(
          sum(when(col("is_pred") && col("h") <= col("thr"), 1)
            .otherwise(0)).cast("long").as("n_pred"),
          sum(when(col("is_gt"), 1).otherwise(0)).cast("long").as("n_gt"),
          sum(when(col("is_pred") && col("h") <= col("thr") &&
            col("is_gt"), 1).otherwise(0)).cast("long").as("tp"),
          sum(when(col("is_pred") && col("h") <= col("thr") &&
            !col("is_gt"), 1).otherwise(0)).cast("long").as("fp"),
          sum(when(col("is_gt") &&
            (col("h").isNull || col("h") > col("thr")), 1)
            .otherwise(0)).cast("long").as("fn"))
        .orderBy("layout", "thr")
    }
  }

  /** Text — DOMAIN POLICY FILTER ([[TA.domainPolicyFilter]]): the
    * crawl-compliance deny-list with public-suffix-style longest-match
    * — apex blocks cover subdomains, a more-specific `allow` exception
    * overrides its apex's `block`, a 1-label rule blocks a whole TLD,
    * unmatched hosts default-allow. Hosts synthesize deterministically
    * from doc_id (¼ apex-only, ¾ subdomain·apex over 3 TLDs); the twin
    * replays the bounded suffix-chain explode + broadcast rule join +
    * specificity argmax. */
  val tDomainPolicy: Q = Q.sql(
    "t_domain_policy",
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN ''
      |         ELSE 's' || CAST(doc_id % 11 AS VARCHAR) || '.' END ||
      |    'd' || CAST(doc_id % 13 AS VARCHAR) ||
      |    CASE WHEN doc_id % 3 = 0 THEN '.com'
      |         WHEN doc_id % 3 = 1 THEN '.net' ELSE '.org' END AS host
      |  FROM documents
      |), rules AS (
      |  SELECT * FROM (VALUES
      |    ('d1.com', 'block'), ('d2.net', 'block'),
      |    ('s3.d1.com', 'allow'), ('org', 'block'))
      |    t(rule_domain, rule_action)
      |), e AS (
      |  SELECT doc_id, host, string_split(host, '.') AS parts,
      |    unnest(generate_series(1, len(string_split(host, '.')))) AS m
      |  FROM u
      |), sfx AS (
      |  SELECT DISTINCT host,
      |    array_to_string(parts[len(parts)-m+1:len(parts)], '.') AS suffix
      |  FROM e
      |), matched AS (
      |  SELECT host, rule_domain AS matched_rule, rule_action AS action
      |  FROM (
      |    SELECT s.host, r.rule_domain, r.rule_action,
      |      ROW_NUMBER() OVER (PARTITION BY s.host
      |        ORDER BY len(string_split(r.rule_domain, '.')) DESC) AS rn
      |    FROM sfx s JOIN rules r ON r.rule_domain = s.suffix
      |  ) WHERE rn = 1
      |)
      |SELECT u.doc_id, u.host, m.matched_rule,
      |  COALESCE(m.action, 'allow') AS action,
      |  COALESCE(m.action, 'allow') = 'block' AS is_blocked
      |FROM u LEFT JOIN matched m ON m.host = u.host
      |ORDER BY u.doc_id""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    val tld = when(id % 3 === 0, ".com")
      .when(id % 3 === 1, ".net").otherwise(".org")
    val apex = concat(lit("d"), (id % 13).cast("string"), tld)
    val host = when(id % 4 === 0, apex)
      .otherwise(concat(lit("s"), (id % 11).cast("string"), lit("."),
        apex))
    TA.domainPolicyFilter(
        Tables.documents(s, d).select(id, host.as("host")),
        col("host"),
        Seq("d1.com" -> "block", "d2.net" -> "block",
          "s3.d1.com" -> "allow", "org" -> "block"))
      .select("doc_id", "host", "matched_rule", "action", "is_blocked")
      .orderBy("doc_id")
  }

  // Integer-quantized scores (see Similarity scaladoc): float→double,
  // ×1e6, away-from-zero round, BIGINT sums — exact in both engines.
  private val qq = "CAST(ROUND(CAST(%s AS DOUBLE) * 1000000) AS BIGINT)"
  private val dotSql =
    s"SUM(${qq.format("qv")} * ${qq.format("cv")})"
  private val normSql =
    s"""SELECT vec_id AS id,
      |    SQRT(CAST(SUM(${qq.format("v")} * ${qq.format("v")}) AS DOUBLE)) AS norm
      |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
      |  GROUP BY vec_id""".stripMargin

  /** Similarity — brute-force cosine top-5 for the first 10 query
    * vectors, decimal-exact dot products, deterministic tie-break. */
  val annBruteForce: Q = Q.sql(
    "ann_cosine_topk",
    s"""WITH qe AS (
      |  SELECT vec_id AS query_id, unnest(embedding) AS qv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings WHERE vec_id < 10
      |), ce AS (
      |  SELECT vec_id AS cand_id, unnest(embedding) AS cv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings
      |), dots AS (
      |  SELECT query_id, cand_id, $dotSql AS dot
      |  FROM qe JOIN ce USING (pos)
      |  WHERE query_id <> cand_id
      |  GROUP BY query_id, cand_id
      |), norms AS (
      |  $normSql
      |), scored AS (
      |  SELECT query_id, cand_id,
      |         CAST(dot AS DOUBLE) / (qn.norm * cn.norm) AS cosine
      |  FROM dots
      |  JOIN norms qn ON qn.id = query_id
      |  JOIN norms cn ON cn.id = cand_id
      |)
      |SELECT query_id, cand_id, cosine, rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, cand_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 10), emb, k = 5)
      .orderBy("query_id", "rank")
  }

  /** Similarity — HARD-NEGATIVE MINING, the contrastive-training data-
    * prep step: for each positive anchor (synthetic label: vec_id
    * divisible by 7; the query subset is the %91==0 positives, 91=7·13)
    * the 3 most-similar NEGATIVES by exact quantized cosine — the
    * near-miss candidates a contrastive loss learns most from. The
    * candidate side is the negative corpus only, so the top-k is hard
    * negatives by construction, not filtered afterwards. */
  val annHardNegatives: Q = Q.sql(
    "ann_hard_negatives",
    s"""WITH qe AS (
      |  SELECT vec_id AS query_id, unnest(embedding) AS qv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings WHERE vec_id % 91 = 0
      |), ce AS (
      |  SELECT vec_id AS cand_id, unnest(embedding) AS cv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings WHERE vec_id % 7 <> 0
      |), dots AS (
      |  SELECT query_id, cand_id, $dotSql AS dot
      |  FROM qe JOIN ce USING (pos)
      |  GROUP BY query_id, cand_id
      |), norms AS (
      |  $normSql
      |), scored AS (
      |  SELECT query_id, cand_id,
      |         CAST(dot AS DOUBLE) / (qn.norm * cn.norm) AS cosine
      |  FROM dots
      |  JOIN norms qn ON qn.id = query_id
      |  JOIN norms cn ON cn.id = cand_id
      |)
      |SELECT query_id, cand_id AS negative_id, cosine, rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, cand_id) AS rank
      |  FROM scored
      |) WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(
        emb.filter(col("vec_id") % 91 === 0),
        emb.filter(col("vec_id") % 7 =!= 0), k = 3)
      .select(col("query_id"), col("cand_id").as("negative_id"),
        col("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Similarity — CORPUS-VERSION EMBEDDING DRIFT
    * ([[Similarity.embeddingDrift]]): sign-bucket histograms of two
    * snapshots (old = vec_id%3≠0, new = vec_id%3=0) compared with the
    * exact-integer cross-multiplied proportion difference — the
    * population-stability alarm between corpus versions, no float
    * ratios anywhere. */
  val annEmbeddingDrift: Q = Q.sql(
    "a18e_embedding_drift",
    s"""WITH b AS (
      |  SELECT vec_id,
      |    ${(0 until 6).map(i =>
           s"(CASE WHEN embedding[${i + 1}] >= 0 THEN '1' ELSE '0' END)")
           .mkString(" || ")} AS bucket
      |  FROM embeddings
      |), o AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_old
      |  FROM b WHERE vec_id % 3 <> 0 GROUP BY bucket
      |), nw AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_new
      |  FROM b WHERE vec_id % 3 = 0 GROUP BY bucket
      |), j AS (
      |  SELECT COALESCE(o.bucket, nw.bucket) AS bucket,
      |    COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      |  FROM o FULL OUTER JOIN nw ON o.bucket = nw.bucket
      |), t AS (
      |  SELECT CAST(SUM(n_old) AS BIGINT) AS tot_old,
      |         CAST(SUM(n_new) AS BIGINT) AS tot_new FROM j
      |)
      |SELECT bucket, n_old, n_new, tot_old, tot_new,
      |  ABS(n_old * tot_new - n_new * tot_old) AS cross_diff
      |FROM j CROSS JOIN t
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.embeddingDrift(
        emb.filter(col("vec_id") % 3 =!= 0),
        emb.filter(col("vec_id") % 3 === 0), bits = 6)
      .orderBy("bucket")
  }

  /** Similarity — sign-bucket LSH top-5 (every vector as query; the
    * bounded-candidate scale path). */
  val annLsh: Q = Q.sql(
    "ann_lsh_topk",
    s"""WITH bucketed AS (
      |  SELECT vec_id, embedding,
      |    ${(0 until 6).map(i =>
          s"(CASE WHEN embedding[${i + 1}] >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ")} AS bucket
      |  FROM embeddings
      |), cand AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.bucket
      |  FROM bucketed q JOIN bucketed c USING (bucket)
      |  WHERE q.vec_id <> c.vec_id
      |), qe AS (
      |  SELECT vec_id AS query_id, unnest(embedding) AS qv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM bucketed
      |), ce AS (
      |  SELECT vec_id AS cand_id, unnest(embedding) AS cv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM bucketed
      |), dots AS (
      |  SELECT cand.query_id, cand.cand_id, cand.bucket, $dotSql AS dot
      |  FROM cand
      |  JOIN qe ON qe.query_id = cand.query_id
      |  JOIN ce ON ce.cand_id = cand.cand_id AND ce.pos = qe.pos
      |  GROUP BY cand.query_id, cand.cand_id, cand.bucket
      |), norms AS (
      |  $normSql
      |), scored AS (
      |  SELECT query_id, cand_id, bucket,
      |         CAST(dot AS DOUBLE) / (qn.norm * cn.norm) AS cosine
      |  FROM dots
      |  JOIN norms qn ON qn.id = query_id
      |  JOIN norms cn ON cn.id = cand_id
      |)
      |SELECT query_id, cand_id, bucket, cosine, rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, cand_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.signLshTopK(emb, emb.select("vec_id"), k = 5, bits = 6)
      .orderBy("query_id", "rank")
  }

  /** Similarity — the production ANN path: seeded random-hyperplane
    * (Rademacher) buckets, single-bit-flip multi-probe, per-bucket
    * candidate cap 32 (Similarity.randomHyperplaneLshTopK). Signatures
    * are integer-quantized sums so both engines compute identical
    * buckets. */
  val annRhLsh: Q = {
    val bits = 6
    val hh = "('8','9','a','b','c','d','e','f')"
    val sumsSql = (0 until bits).map(j =>
      s"""SUM(${qq.format("v")} *
        |      CASE WHEN substr(md5('rh7|$j|' || CAST(pos - 1 AS VARCHAR)), 1, 1) IN $hh
        |           THEN 1 ELSE -1 END) AS s$j""".stripMargin)
      .mkString(",\n      |    ")
    val bucketSql = (0 until bits).map(j =>
      s"(CASE WHEN s$j >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
    Q.sql(
      "ann_rh_lsh_topk",
      s"""WITH qv AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |         unnest(generate_series(1, len(embedding))) AS pos
        |  FROM embeddings
        |), sums AS (
        |  SELECT vec_id,
        |    $sumsSql
        |  FROM qv GROUP BY vec_id
        |), buckets AS (
        |  SELECT vec_id, $bucketSql AS bucket FROM sums
        |), capped AS (
        |  SELECT vec_id, bucket FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
        |      ORDER BY vec_id) AS rn FROM buckets)
        |  WHERE rn <= 32
        |), probes AS (
        |  SELECT b.vec_id AS query_id,
        |    CASE WHEN p = 0 THEN bucket
        |         ELSE substr(bucket, 1, p - 1) ||
        |              (CASE WHEN substr(bucket, p, 1) = '1' THEN '0' ELSE '1' END) ||
        |              substr(bucket, p + 1) END AS bucket
        |  FROM buckets b
        |  CROSS JOIN (SELECT unnest(generate_series(0, $bits)) AS p)
        |), cand AS (
        |  SELECT DISTINCT p.query_id, c.vec_id AS cand_id
        |  FROM probes p JOIN capped c USING (bucket)
        |  WHERE p.query_id <> c.vec_id
        |), qe AS (
        |  SELECT vec_id AS query_id, unnest(embedding) AS qv,
        |         unnest(generate_series(1, len(embedding))) AS pos
        |  FROM embeddings
        |), ce AS (
        |  SELECT vec_id AS cand_id, unnest(embedding) AS cv,
        |         unnest(generate_series(1, len(embedding))) AS pos
        |  FROM embeddings
        |), dots AS (
        |  SELECT cand.query_id, cand.cand_id, $dotSql AS dot
        |  FROM cand
        |  JOIN qe ON qe.query_id = cand.query_id
        |  JOIN ce ON ce.cand_id = cand.cand_id AND ce.pos = qe.pos
        |  GROUP BY cand.query_id, cand.cand_id
        |), norms AS (
        |  $normSql
        |), scored AS (
        |  SELECT query_id, cand_id,
        |         CAST(dot AS DOUBLE) / (qn.norm * cn.norm) AS cosine
        |  FROM dots
        |  JOIN norms qn ON qn.id = query_id
        |  JOIN norms cn ON cn.id = cand_id
        |)
        |SELECT query_id, cand_id, cosine, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, cand_id) AS rank
        |  FROM scored
        |) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.randomHyperplaneLshTopK(emb, emb.select("vec_id"),
        k = 5, bits = bits, seed = "7", maxBucketSize = 32)
        .orderBy("query_id", "rank")
    }
  }

  /** Similarity — IVF top-5: stride-sampled centroids as the coarse
    * quantizer, nearest-cell assignment, 2-cell probe
    * (Similarity.ivfTopK). */
  val annIvf: Q = Q.sql(
    "ann_ivf_topk",
    s"""WITH cent AS (
      |  SELECT vec_id AS centroid_id, embedding AS cent_vec
      |  FROM embeddings WHERE vec_id % 50 = 0
      |), ve AS (
      |  SELECT vec_id, unnest(embedding) AS v,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings
      |), cente AS (
      |  SELECT centroid_id, unnest(cent_vec) AS cv,
      |         unnest(generate_series(1, len(cent_vec))) AS pos
      |  FROM cent
      |), norms AS (
      |  $normSql
      |), adots AS (
      |  SELECT ve.vec_id, cente.centroid_id,
      |    SUM(${qq.format("v")} * ${qq.format("cv")}) AS dot
      |  FROM ve JOIN cente ON cente.pos = ve.pos
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT vec_id, centroid_id,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY CAST(dot AS DOUBLE) / (n1.norm * n2.norm) DESC,
      |               centroid_id) AS crank
      |  FROM adots
      |  JOIN norms n1 ON n1.id = vec_id
      |  JOIN norms n2 ON n2.id = centroid_id
      |), assign AS (
      |  SELECT vec_id AS cand_id, centroid_id FROM ranked WHERE crank = 1
      |), probes AS (
      |  SELECT vec_id AS query_id, centroid_id FROM ranked WHERE crank <= 2
      |), cand AS (
      |  SELECT query_id, cand_id
      |  FROM probes JOIN assign USING (centroid_id)
      |  WHERE query_id <> cand_id
      |), qe AS (
      |  SELECT vec_id AS query_id, unnest(embedding) AS qv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings
      |), ce AS (
      |  SELECT vec_id AS cand_id, unnest(embedding) AS cv,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings
      |), dots AS (
      |  SELECT cand.query_id, cand.cand_id, $dotSql AS dot
      |  FROM cand
      |  JOIN qe ON qe.query_id = cand.query_id
      |  JOIN ce ON ce.cand_id = cand.cand_id AND ce.pos = qe.pos
      |  GROUP BY cand.query_id, cand.cand_id
      |), scored AS (
      |  SELECT query_id, cand_id,
      |         CAST(dot AS DOUBLE) / (qn.norm * cn.norm) AS cosine
      |  FROM dots
      |  JOIN norms qn ON qn.id = query_id
      |  JOIN norms cn ON cn.id = cand_id
      |)
      |SELECT query_id, cand_id, cosine, rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, cand_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.select("vec_id"), k = 5,
      centroidStride = 50, nProbe = 2)
      .orderBy("query_id", "rank")
  }

  /** Dedup — embedding-cosine near-dup via the LSH-bucketed pair path
    * (Similarity.embeddingNearDups). The random corpus has no natural
    * near-dups (max pairwise cosine ≈0.51), so exact copies are planted
    * (vec_id+100000 for vec_id<50) and the query must surface exactly
    * those 50 pairs through the bucket join — identical vectors share a
    * signature, so bucket recall on true dups is 1. */
  val ddEmbeddingNearDup: Q = {
    val bits = 6
    val hh = "('8','9','a','b','c','d','e','f')"
    val sumsSql = (0 until bits).map(j =>
      s"""SUM(${qq.format("v")} *
        |      CASE WHEN substr(md5('rh7|$j|' || CAST(pos - 1 AS VARCHAR)), 1, 1) IN $hh
        |           THEN 1 ELSE -1 END) AS s$j""".stripMargin)
      .mkString(",\n      |    ")
    val bucketSql = (0 until bits).map(j =>
      s"(CASE WHEN s$j >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
    Q.sql(
      "dd_embedding_neardup",
      s"""WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id < 50
        |), qv AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |         unnest(generate_series(1, len(embedding))) AS pos
        |  FROM corpus
        |), sums AS (
        |  SELECT vec_id,
        |    $sumsSql
        |  FROM qv GROUP BY vec_id
        |), buckets AS (
        |  SELECT vec_id, $bucketSql AS bucket FROM sums
        |), cand AS (
        |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        |  FROM buckets a JOIN buckets b USING (bucket)
        |  WHERE a.vec_id < b.vec_id
        |), qe AS (
        |  SELECT vec_id AS doc_a, unnest(embedding) AS qv,
        |         unnest(generate_series(1, len(embedding))) AS pos
        |  FROM corpus
        |), ce AS (
        |  SELECT vec_id AS doc_b, unnest(embedding) AS cv,
        |         unnest(generate_series(1, len(embedding))) AS pos
        |  FROM corpus
        |), dots AS (
        |  SELECT cand.doc_a, cand.doc_b, $dotSql AS dot
        |  FROM cand
        |  JOIN qe ON qe.doc_a = cand.doc_a
        |  JOIN ce ON ce.doc_b = cand.doc_b AND ce.pos = qe.pos
        |  GROUP BY cand.doc_a, cand.doc_b
        |), norms AS (
        |  SELECT vec_id AS id,
        |    SQRT(CAST(SUM(${qq.format("v")} * ${qq.format("v")}) AS DOUBLE)) AS norm
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM corpus)
        |  GROUP BY vec_id
        |)
        |SELECT doc_a, doc_b,
        |  CAST(dot AS DOUBLE) / (qn.norm * cn.norm) AS cosine,
        |  LEAST(doc_a, doc_b) AS canonical_id
        |FROM dots
        |JOIN norms qn ON qn.id = doc_a
        |JOIN norms cn ON cn.id = doc_b
        |WHERE CAST(dot AS DOUBLE) / (qn.norm * cn.norm) >= 0.95
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val corpus = emb.unionByName(
        emb.filter(col("vec_id") < 50)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.embeddingNearDups(corpus, bits = bits, seed = "7",
        threshold = 0.95)
        .orderBy("doc_a", "doc_b")
    }
  }

  /** Multimodal — binary-column plumbing: typed media table with opaque
    * payloads + metadata (schema/partitioning side is the real part). */
  val mmBinary: Q = Q.sql(
    "mm_binary_plumbing",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
      |  ascii(substr(text, 1, 1)) AS first_byte,
      |  source AS origin
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.asMediaTable(Tables.documents(s, d))
      .select(col("doc_id"), col("media_type"),
        octet_length(col("payload")).cast("long").as("payload_bytes"),
        ascii(substring(decode(col("payload"), "UTF-8"), 1, 1))
          .as("first_byte"),
        col("meta.origin").as("origin"))
      .orderBy("doc_id")
  }

  /** Multimodal — REAL codec round trip: per-doc PNG/BMP/GIF bytes are
    * synthesized executor-side with `ImageIO.write` from closed-form
    * pixel formulas (no channel value wraps mod 256), then decoded with
    * `ImageIO.read` and feature-extracted from the actual raster. GIF
    * docs (ids ≡1 mod 8) are grayscale over an identity-ramp palette
    * (Multimodal.synthImagePayload scaladoc: the two lossless-GIF
    * traps), so their G/B expectations collapse onto the R formula. The
    * oracle predicts dimensions, the (0,0)/(w-1,h-1) pixels, and the
    * full-image per-channel sums straight from doc_id — a wrong encode
    * OR decode on the Spark side breaks the hash. All-integer outputs. */
  val mmFeatures: Q = Q.sql(
    "mm_decode_features",
    """WITH dims AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN 'bmp'
      |         WHEN doc_id % 8 = 1 THEN 'gif' ELSE 'png' END AS format,
      |    doc_id % 8 = 1 AS gray,
      |    CAST(8 + doc_id % 9 AS INTEGER) AS width,
      |    CAST(8 + doc_id % 13 AS INTEGER) AS height,
      |    CAST(doc_id % 97 AS INTEGER) AS r0,
      |    CAST(doc_id % 89 AS INTEGER) AS g0,
      |    CAST(doc_id % 83 AS INTEGER) AS b0
      |  FROM documents
      |), px AS (
      |  SELECT *,
      |    CAST(r0 + 3*(width-1) + 5*(height-1) AS INTEGER) AS cr,
      |    CAST(g0 + 2*(width-1) + 4*(height-1) AS INTEGER) AS cg,
      |    CAST(b0 + (width-1) + 2*(height-1) AS INTEGER) AS cb,
      |    CAST(width*height*r0 + 3*height*((width-1)*width//2)
      |         + 5*width*((height-1)*height//2) AS BIGINT) AS sr,
      |    CAST(width*height*g0 + 2*height*((width-1)*width//2)
      |         + 4*width*((height-1)*height//2) AS BIGINT) AS sg,
      |    CAST(width*height*b0 + height*((width-1)*width//2)
      |         + 2*width*((height-1)*height//2) AS BIGINT) AS sb
      |  FROM dims
      |)
      |SELECT doc_id, format, width, height, CAST(3 AS INTEGER) AS channels,
      |  r0 AS p00_r,
      |  CASE WHEN gray THEN r0 ELSE g0 END AS p00_g,
      |  CASE WHEN gray THEN r0 ELSE b0 END AS p00_b,
      |  cr AS pcorner_r,
      |  CASE WHEN gray THEN cr ELSE cg END AS pcorner_g,
      |  CASE WHEN gray THEN cr ELSE cb END AS pcorner_b,
      |  sr AS sum_r,
      |  CASE WHEN gray THEN sr ELSE sg END AS sum_g,
      |  CASE WHEN gray THEN sr ELSE sb END AS sum_b
      |FROM px ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.decodeImages(
      Multimodal.asImageTable(Tables.documents(s, d)))
      .orderBy("doc_id")
  }

  /** Multimodal — REAL audio codec round trip: per-doc RIFF/WAVE
    * payloads (16-bit PCM — lossless) synthesized executor-side with
    * `AudioSystem.write` from closed-form sample formulas, decoded with
    * `AudioSystem.getAudioInputStream`, features from the actual PCM.
    * The oracle predicts format fields, endpoint samples, and
    * per-channel sums straight from doc_id. All-integer outputs;
    * `sum_c1` exercises the mono-null arm. */
  val mmAudio: Q = Q.sql(
    "mm_audio_decode",
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
      |    CAST(1 + doc_id % 2 AS INTEGER) AS channels,
      |    CAST(50 + doc_id % 100 AS BIGINT) AS n_frames,
      |    CAST(doc_id % 997 AS INTEGER) AS b0,
      |    CAST(doc_id % 883 AS INTEGER) AS b1
      |  FROM documents
      |)
      |SELECT doc_id, sample_rate, channels, n_frames,
      |  b0 AS first_sample,
      |  CAST(b0 + 7 * (n_frames - 1) AS INTEGER) AS last_sample,
      |  CAST(n_frames * b0 + 7 * ((n_frames - 1) * n_frames // 2) AS BIGINT) AS sum_c0,
      |  CASE WHEN channels = 2
      |       THEN CAST(n_frames * b1 + 5 * ((n_frames - 1) * n_frames // 2) AS BIGINT)
      |       END AS sum_c1
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.decodeAudio(
      Multimodal.asAudioTable(Tables.documents(s, d)))
      .orderBy("doc_id")
  }

  /** Multimodal + incremental dedup — PERSISTED perceptual-hash index
    * (the daily-crawl discipline for IMAGES): day 1 commits the base
    * images' dHash band+hash rows through the real `PhashIndex`
    * AtomicTable; day 2 probes a mix of one-pixel near-copies, exact
    * re-crawls, and genuinely fresh images against the COMMITTED
    * version. Band join generates candidates, the indexed full hash
    * Hamming-verifies them (load-bearing: 16-bit bands saturate with
    * index size — see PhashIndex scaladoc). Expected and gate-checked:
    * every near-copy and re-crawl flagged, every fresh image kept. */
  val ddPhashIndexChain: Q = Q.sql(
    "dd_phash_index_chain",
    s"""${phashHashCtes(
         """SELECT doc_id FROM documents
           |  UNION
           |  SELECT doc_id * 2 + 1000000 FROM documents WHERE doc_id % 9 = 0""".stripMargin)}, bnd AS (
      |  SELECT h.doc_id, h.hash_lo, h.hash_hi, bs.band,
      |    CASE bs.band WHEN 0 THEN h.hash_lo % 65536
      |                 WHEN 1 THEN h.hash_lo // 65536
      |                 WHEN 2 THEN h.hash_hi % 65536
      |                 ELSE h.hash_hi // 65536 END AS band_key
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
      |), idx AS (
      |  SELECT DISTINCT band, band_key, hash_lo, hash_hi
      |  FROM bnd WHERE doc_id < 1000000 AND doc_id % 5 <> 4
      |), probe AS (
      |  SELECT * FROM bnd
      |  WHERE doc_id >= 1000000 OR doc_id % 5 = 4
      |     OR (doc_id % 7 = 0 AND doc_id % 5 <> 4)
      |), hits AS (
      |  SELECT DISTINCT p.doc_id
      |  FROM probe p JOIN idx i
      |    ON i.band = p.band AND i.band_key = p.band_key
      |  WHERE bit_count(xor(p.hash_lo, i.hash_lo))
      |      + bit_count(xor(p.hash_hi, i.hash_hi)) <= 3
      |)
      |SELECT p.doc_id,
      |  p.doc_id IN (SELECT doc_id FROM hits) AS hit_index,
      |  p.doc_id NOT IN (SELECT doc_id FROM hits) AS keep
      |FROM (SELECT DISTINCT doc_id FROM probe) p
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    import graft.llm.PhashIndex
    val ids = Tables.documents(s, d).select("doc_id")
    val day1 = ids.filter(col("doc_id") % 5 =!= 4)
    val day2 = ids.filter(col("doc_id") % 5 === 4 ||
        (col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 4))
      .unionByName(ids.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") * 2 + 1000000L).as("doc_id")))
    val dir = Q.tempDir("graft_phidx")
      .toString
    PhashIndex.processBatch(s, dir, Multimodal.asPhashImageTable(day1))
    PhashIndex.processBatch(s, dir, Multimodal.asPhashImageTable(day2))
      .orderBy("doc_id")
  }

  /** Multimodal + incremental dedup — the 128-BIT persisted
    * perceptual-hash index (r18: the probe-saturation defense VERDICT
    * r17 task #2 names). Same daily-crawl chain as
    * `dd_phash_index_chain`, but through [[graft.llm.Phash128Index]]:
    * 17×8 payloads, real decode, 128-bit dHash packed as four 32-bit
    * words, and the pigeonhole bands ARE the words — per-band keyspace
    * 2^32, so probe candidates stay ∝ true near-dups as the committed
    * index grows (the 64-bit gate's 16-bit keys saturate at
    * |index|·4/65536 — its measured 1.43@100× shuffle tail). The twin
    * replays every pixel, all 128 comparison bits, the 4×32-bit
    * packing, the word-keyed band join, and the 4-word Hamming verify. */
  val ddPhash128IndexChain: Q = Q.sql(
    "dd_phash128_index_chain",
    s"""${phash128HashCtes(
         """SELECT doc_id FROM documents
           |  UNION
           |  SELECT doc_id * 2 + 1000000 FROM documents WHERE doc_id % 9 = 0""".stripMargin)}, bnd AS (
      |  SELECT h.doc_id, h.h0, h.h1, h.h2, h.h3, bs.band,
      |    CASE bs.band WHEN 0 THEN h.h0 WHEN 1 THEN h.h1
      |                 WHEN 2 THEN h.h2 ELSE h.h3 END AS band_key
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
      |), idx AS (
      |  SELECT DISTINCT band, band_key, h0, h1, h2, h3
      |  FROM bnd WHERE doc_id < 1000000 AND doc_id % 5 <> 4
      |), probe AS (
      |  SELECT * FROM bnd
      |  WHERE doc_id >= 1000000 OR doc_id % 5 = 4
      |     OR (doc_id % 7 = 0 AND doc_id % 5 <> 4)
      |), hits AS (
      |  SELECT DISTINCT p.doc_id
      |  FROM probe p JOIN idx i
      |    ON i.band = p.band AND i.band_key = p.band_key
      |  WHERE bit_count(xor(p.h0, i.h0)) + bit_count(xor(p.h1, i.h1))
      |      + bit_count(xor(p.h2, i.h2)) + bit_count(xor(p.h3, i.h3)) <= 3
      |)
      |SELECT p.doc_id,
      |  p.doc_id IN (SELECT doc_id FROM hits) AS hit_index,
      |  p.doc_id NOT IN (SELECT doc_id FROM hits) AS keep
      |FROM (SELECT DISTINCT doc_id FROM probe) p
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    import graft.llm.Phash128Index
    val ids = Tables.documents(s, d).select("doc_id")
    val day1 = ids.filter(col("doc_id") % 5 =!= 4)
    val day2 = ids.filter(col("doc_id") % 5 === 4 ||
        (col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 4))
      .unionByName(ids.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") * 2 + 1000000L).as("doc_id")))
    val dir = Q.tempDir("graft_ph128idx").toString
    Phash128Index.processBatch(s, dir,
      Multimodal.asPhash128ImageTable(day1))
    Phash128Index.processBatch(s, dir,
      Multimodal.asPhash128ImageTable(day2))
      .orderBy("doc_id")
  }

  /** Multimodal + incremental dedup — the WIDTH-POLICY front door
    * (r19; closes the r18 weak mark): `PhashIndexAuto` picks the index
    * width from expected corpus size — 64-bit while the 16-bit band
    * keys' accidental candidates per probe (|index|·4/65536) stay ≤ 1,
    * 128-bit past the 16,384-row crossover — and the CHOICE rides in a
    * `band_bits` output column the twin RECOMPUTES from COUNT(*) with
    * the same inequality (the r16 text-side discipline). Here the
    * documents corpus sits below the crossover at both SFs, so the
    * policy must pick 64 and the chain must replay the 64-bit index
    * byte-for-byte. */
  val ddPhashPolicySmall: Q = Q.sql(
    "dd_phash_policy_small",
    s"""${phashHashCtes(
         """SELECT doc_id FROM documents
           |  UNION
           |  SELECT doc_id * 2 + 1000000 FROM documents WHERE doc_id % 9 = 0""".stripMargin)}, bnd AS (
      |  SELECT h.doc_id, h.hash_lo, h.hash_hi, bs.band,
      |    CASE bs.band WHEN 0 THEN h.hash_lo % 65536
      |                 WHEN 1 THEN h.hash_lo // 65536
      |                 WHEN 2 THEN h.hash_hi % 65536
      |                 ELSE h.hash_hi // 65536 END AS band_key
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
      |), idx AS (
      |  SELECT DISTINCT band, band_key, hash_lo, hash_hi
      |  FROM bnd WHERE doc_id < 1000000 AND doc_id % 5 <> 4
      |), probe AS (
      |  SELECT * FROM bnd
      |  WHERE doc_id >= 1000000 OR doc_id % 5 = 4
      |     OR (doc_id % 7 = 0 AND doc_id % 5 <> 4)
      |), hits AS (
      |  SELECT DISTINCT p.doc_id
      |  FROM probe p JOIN idx i
      |    ON i.band = p.band AND i.band_key = p.band_key
      |  WHERE bit_count(xor(p.hash_lo, i.hash_lo))
      |      + bit_count(xor(p.hash_hi, i.hash_hi)) <= 3
      |)
      |SELECT p.doc_id,
      |  p.doc_id IN (SELECT doc_id FROM hits) AS hit_index,
      |  p.doc_id NOT IN (SELECT doc_id FROM hits) AS keep,
      |  CAST(CASE WHEN (SELECT COUNT(*) FROM documents) * 4.0 / 65536.0
      |            <= 1.0 THEN 64 ELSE 128 END AS INTEGER) AS band_bits
      |FROM (SELECT DISTINCT doc_id FROM probe) p
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    import graft.llm.PhashIndexAuto
    val ids = Tables.documents(s, d).select("doc_id")
    val day1 = ids.filter(col("doc_id") % 5 =!= 4)
    val day2 = ids.filter(col("doc_id") % 5 === 4 ||
        (col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 4))
      .unionByName(ids.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") * 2 + 1000000L).as("doc_id")))
    def toImages(day: org.apache.spark.sql.DataFrame)(bits: Int) =
      if (bits == 64) Multimodal.asPhashImageTable(day)
      else Multimodal.asPhash128ImageTable(day)
    val dir = Q.tempDir("graft_phpol_s").toString
    val expected = Tables.documentsCount(s, d)
    PhashIndexAuto.processBatch(s, dir, toImages(day1),
      expectedIndexRows = expected)
    PhashIndexAuto.processBatch(s, dir, toImages(day2),
      expectedIndexRows = expected)
      .orderBy("doc_id")
  }

  /** Large-corpus arm of the width policy: expected index size is
    * documentsCount × 40 — past the 16,384 crossover at BOTH SFs
    * (20,000 / 200,000) — so the policy must pick the 128-bit layout
    * and the chain must replay `Phash128Index` (17×8 grid, word-keyed
    * bands, 4-word Hamming verify) with `band_bits` = 128 recomputed
    * from the same inequality in the twin. Together with the small arm
    * this gates BOTH policy branches cross-engine. */
  val ddPhashPolicyLarge: Q = Q.sql(
    "dd_phash_policy_large",
    s"""${phash128HashCtes(
         """SELECT doc_id FROM documents
           |  UNION
           |  SELECT doc_id * 2 + 1000000 FROM documents WHERE doc_id % 9 = 0""".stripMargin)}, bnd AS (
      |  SELECT h.doc_id, h.h0, h.h1, h.h2, h.h3, bs.band,
      |    CASE bs.band WHEN 0 THEN h.h0 WHEN 1 THEN h.h1
      |                 WHEN 2 THEN h.h2 ELSE h.h3 END AS band_key
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
      |), idx AS (
      |  SELECT DISTINCT band, band_key, h0, h1, h2, h3
      |  FROM bnd WHERE doc_id < 1000000 AND doc_id % 5 <> 4
      |), probe AS (
      |  SELECT * FROM bnd
      |  WHERE doc_id >= 1000000 OR doc_id % 5 = 4
      |     OR (doc_id % 7 = 0 AND doc_id % 5 <> 4)
      |), hits AS (
      |  SELECT DISTINCT p.doc_id
      |  FROM probe p JOIN idx i
      |    ON i.band = p.band AND i.band_key = p.band_key
      |  WHERE bit_count(xor(p.h0, i.h0)) + bit_count(xor(p.h1, i.h1))
      |      + bit_count(xor(p.h2, i.h2)) + bit_count(xor(p.h3, i.h3)) <= 3
      |)
      |SELECT p.doc_id,
      |  p.doc_id IN (SELECT doc_id FROM hits) AS hit_index,
      |  p.doc_id NOT IN (SELECT doc_id FROM hits) AS keep,
      |  CAST(CASE WHEN (SELECT COUNT(*) FROM documents) * 40 * 4.0
      |            / 65536.0 <= 1.0 THEN 64 ELSE 128 END AS INTEGER)
      |    AS band_bits
      |FROM (SELECT DISTINCT doc_id FROM probe) p
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    import graft.llm.PhashIndexAuto
    val ids = Tables.documents(s, d).select("doc_id")
    val day1 = ids.filter(col("doc_id") % 5 =!= 4)
    val day2 = ids.filter(col("doc_id") % 5 === 4 ||
        (col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 4))
      .unionByName(ids.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") * 2 + 1000000L).as("doc_id")))
    def toImages(day: org.apache.spark.sql.DataFrame)(bits: Int) =
      if (bits == 64) Multimodal.asPhashImageTable(day)
      else Multimodal.asPhash128ImageTable(day)
    val dir = Q.tempDir("graft_phpol_l").toString
    val expected = Tables.documentsCount(s, d) * 40
    PhashIndexAuto.processBatch(s, dir, toImages(day1),
      expectedIndexRows = expected)
    PhashIndexAuto.processBatch(s, dir, toImages(day2),
      expectedIndexRows = expected)
      .orderBy("doc_id")
  }

  /** 64→128-bit INDEX MIGRATION BACKFILL gate (r20; VERDICT r19 task
    * #3): day 1 commits a 64-bit index (the policy's small-corpus
    * choice), day 2 probes-and-folds against it — REAL 64-bit
    * decisions, near-copies and all — then
    * [[graft.llm.PhashIndexAuto.migrate]] re-hashes the resulting
    * archive at the 17×8 grid into a NEW dir (one compacted 128-bit
    * base), and day 3 folds against the MIGRATED dir through the
    * policy front door (committed schema resolves width 128). The twin
    * replays BOTH grids' full pixel math: the 9×8 chain decides the
    * archive, the 17×8 chain builds the migrated index and judges the
    * day-3 probes (exact re-crawls of archived docs must hit at
    * Hamming 0 — width-invariant recall across the flip). `idx_rows`
    * pins the migrated index's distinct band-row count; `band_bits`
    * pins that day 3 really ran 128-bit. */
  val ddPhashMigrateChain: Q = Q.sql(
    "dd_phash_migrate_chain",
    s"""${phashHashCtes(
         "SELECT doc_id FROM documents WHERE doc_id % 3 < 2",
         prefix = "a_")}, ${phash128HashCtes(
         "SELECT doc_id FROM documents", prefix = "b_",
         lead = false)}, bnd64 AS (
      |  SELECT h.doc_id, h.hash_lo, h.hash_hi, bs.band,
      |    CASE bs.band WHEN 0 THEN h.hash_lo % 65536
      |                 WHEN 1 THEN h.hash_lo // 65536
      |                 WHEN 2 THEN h.hash_hi % 65536
      |                 ELSE h.hash_hi // 65536 END AS band_key
      |  FROM a_h h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
      |), idx64 AS (
      |  SELECT DISTINCT band, band_key, hash_lo, hash_hi
      |  FROM bnd64 WHERE doc_id % 3 = 0
      |), hits64 AS (
      |  SELECT DISTINCT p.doc_id
      |  FROM (SELECT * FROM bnd64 WHERE doc_id % 3 = 1) p
      |  JOIN idx64 i ON i.band = p.band AND i.band_key = p.band_key
      |  WHERE bit_count(xor(p.hash_lo, i.hash_lo))
      |      + bit_count(xor(p.hash_hi, i.hash_hi)) <= 3
      |), archive AS (
      |  SELECT doc_id FROM documents WHERE doc_id % 3 = 0
      |  UNION
      |  SELECT doc_id FROM documents WHERE doc_id % 3 = 1
      |    AND doc_id NOT IN (SELECT doc_id FROM hits64)
      |), bnd128 AS (
      |  SELECT h.doc_id, h.h0, h.h1, h.h2, h.h3, bs.band,
      |    CASE bs.band WHEN 0 THEN h.h0 WHEN 1 THEN h.h1
      |                 WHEN 2 THEN h.h2 ELSE h.h3 END AS band_key
      |  FROM b_h h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
      |), idx128 AS (
      |  SELECT DISTINCT band, band_key, h0, h1, h2, h3
      |  FROM bnd128 WHERE doc_id IN (SELECT doc_id FROM archive)
      |), probe AS (
      |  SELECT * FROM bnd128
      |  WHERE doc_id % 3 = 2 OR doc_id % 9 = 0 OR doc_id % 9 = 1
      |), hits AS (
      |  SELECT DISTINCT p.doc_id
      |  FROM probe p JOIN idx128 i
      |    ON i.band = p.band AND i.band_key = p.band_key
      |  WHERE bit_count(xor(p.h0, i.h0)) + bit_count(xor(p.h1, i.h1))
      |      + bit_count(xor(p.h2, i.h2)) + bit_count(xor(p.h3, i.h3)) <= 3
      |)
      |SELECT p.doc_id,
      |  p.doc_id IN (SELECT doc_id FROM hits) AS hit_index,
      |  p.doc_id NOT IN (SELECT doc_id FROM hits) AS keep,
      |  CAST(128 AS INTEGER) AS band_bits,
      |  CAST((SELECT COUNT(*) FROM idx128) AS BIGINT) AS idx_rows
      |FROM (SELECT DISTINCT doc_id FROM probe) p
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    import graft.llm.PhashIndexAuto
    val ids = Tables.documents(s, d).select("doc_id")
    val day1 = ids.filter(col("doc_id") % 3 === 0)
    val day2 = ids.filter(col("doc_id") % 3 === 1)
    val day3 = ids.filter(col("doc_id") % 3 === 2 ||
      col("doc_id") % 9 === 0 || col("doc_id") % 9 === 1)
    def toImages(day: org.apache.spark.sql.DataFrame)(bits: Int) =
      if (bits == 64) Multimodal.asPhashImageTable(day)
      else Multimodal.asPhash128ImageTable(day)
    val oldDir = Q.tempDir("graft_phmig_old").toString
    val newDir = Q.tempDir("graft_phmig_new").toString
    val expected = Tables.documentsCount(s, d) // ≤ crossover → 64-bit
    PhashIndexAuto.processBatch(s, oldDir, toImages(day1),
      expectedIndexRows = expected)
    val ann2 = PhashIndexAuto.processBatch(s, oldDir, toImages(day2),
      expectedIndexRows = expected)
    val archive = day1
      .unionByName(ann2.filter(col("keep")).select("doc_id"))
    val nIdx = PhashIndexAuto.migrate(s, oldDir, newDir,
      Multimodal.asPhash128ImageTable(archive))
    PhashIndexAuto.processBatch(s, newDir, toImages(day3))
      .withColumn("idx_rows", lit(nIdx))
      .orderBy("doc_id")
  }

  /** Multimodal — audio FEATURE EXTRACTION over the real codec path:
    * WAV payloads decoded to per-frame PCM rows (`decodeAudioFrames`),
    * then fixed 16-frame windowed sum-of-squares energy, per-doc
    * totals, and the peak window — the framing/energy pipeline a
    * speech-data curator runs. The oracle replays every sample from
    * the closed-form spec; one wrong decoded sample anywhere moves an
    * energy sum and breaks the hash. */
  val mmAudioEnergy: Q = Q.sql(
    "mm_audio_energy",
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(1 + doc_id % 2 AS INTEGER) AS channels,
      |    CAST(50 + doc_id % 100 AS BIGINT) AS n_frames,
      |    CAST(doc_id % 997 AS BIGINT) AS b0,
      |    CAST(doc_id % 883 AS BIGINT) AS b1
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, channels, n_frames, b0, b1,
      |    unnest(generate_series(0, CAST(n_frames - 1 AS INTEGER))) AS frame
      |  FROM d
      |), w AS (
      |  SELECT doc_id, frame // 16 AS window_idx,
      |    CAST(SUM((b0 + 7*frame) * (b0 + 7*frame)) AS BIGINT) AS energy,
      |    CAST(SUM(CASE WHEN channels = 2
      |      THEN (b1 + 5*frame) * (b1 + 5*frame) END) AS BIGINT) AS energy_c1,
      |    CAST(COUNT(*) AS BIGINT) AS window_frames
      |  FROM f GROUP BY 1, 2
      |), peak AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY energy DESC, window_idx) AS rn
      |  FROM w
      |), agg AS (
      |  SELECT doc_id,
      |    CAST(SUM(window_frames) AS BIGINT) AS n_frames,
      |    CAST(MAX(window_idx) + 1 AS BIGINT) AS n_windows,
      |    CAST(SUM(energy) AS BIGINT) AS total_energy,
      |    CAST(SUM(energy_c1) AS BIGINT) AS total_energy_c1
      |  FROM w GROUP BY 1
      |)
      |SELECT a.doc_id, a.n_frames, a.n_windows, a.total_energy,
      |  CAST(p.window_idx AS BIGINT) AS peak_window,
      |  p.energy AS peak_energy, a.total_energy_c1
      |FROM agg a JOIN peak p ON p.doc_id = a.doc_id AND p.rn = 1
      |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
    Multimodal.audioEnergyFeatures(
      Multimodal.decodeAudioFrames(
        Multimodal.asAudioTable(Tables.documents(s, d))))
      .select("doc_id", "n_frames", "n_windows", "total_energy",
        "peak_window", "peak_energy", "total_energy_c1")
      .orderBy("doc_id")
  }

  /** Multimodal — REAL video container round trip: per-doc YUV4MPEG2
    * streams (raw C420 planes — the codec-free interchange format)
    * synthesized executor-side, parsed back by the real header/FRAME
    * walk in `Multimodal.decodeVideo`. Dimensions and fps come from
    * the actual header, frame counts from the actual markers, and the
    * luma/chroma checksums from the actual plane bytes — all predicted
    * in closed form by the oracle. */
  val mmVideo: Q = Q.sql(
    "mm_video_parse",
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8 + (doc_id % 5) * 2 AS INTEGER) AS w,
      |    CAST(6 + (doc_id % 4) * 2 AS INTEGER) AS h,
      |    CAST(3 + doc_id % 5 AS BIGINT) AS n,
      |    CAST(24 + doc_id % 6 AS INTEGER) AS fps_num,
      |    CAST(doc_id % 120 AS BIGINT) AS b
      |  FROM documents
      |)
      |SELECT doc_id, w AS width, h AS height, fps_num, n AS n_frames,
      |  CAST(b AS INTEGER) AS luma_first,
      |  CAST(w*h*(n*b + 3*((n-1)*n//2))
      |       + n*(3*h*((w-1)*w//2) + 5*w*((h-1)*h//2)) AS BIGINT) AS luma_sum,
      |  CAST(n * 2 * (w//2) * (h//2) * 128 AS BIGINT) AS chroma_sum
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.decodeVideo(
      Multimodal.asVideoTable(Tables.documents(s, d)))
      .orderBy("doc_id")
  }

  /** Multimodal — SCENE-CUT detection over REAL container bytes: each
    * doc's Y4M stream carries a +100 luma step at a spec-defined frame
    * (`Multimodal.vidCutAt`); the Spark side must REDISCOVER it from
    * the bytes — real plane walk to per-frame luma energy
    * (`decodeVideoFrameLuma`), then the classic shot-boundary
    * detector: a lag window over frame energy, cut where the jump
    * exceeds 50·w·h (smooth drift is +2·w·h/frame, the cut is
    * +102·w·h). The DuckDB twin PREDICTS the detection closed-form
    * from the id like every mm_* oracle — the gate fails if the
    * detector misses the cut, false-alarms on drift, or the container
    * walk miscounts a single byte. Detection itself is codegen'd
    * (window + aggregate); only the byte walk sits at the
    * mapPartitions codec boundary. */
  val mmSceneCut: Q = Q.sql(
    "mm_scene_cut",
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8 + (doc_id % 5) * 2 AS BIGINT) AS w,
      |    CAST(6 + (doc_id % 4) * 2 AS BIGINT) AS h,
      |    CAST(3 + doc_id % 5 AS BIGINT) AS n,
      |    CAST(1 + (doc_id % (2 + doc_id % 5)) AS BIGINT) AS cut
      |  FROM documents
      |)
      |SELECT doc_id, n AS n_frames, cut AS cut_frame,
      |  CAST(1 AS BIGINT) AS n_cuts,
      |  CAST(102 * w * h AS BIGINT) AS delta_at_cut
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    val frames = Multimodal.decodeVideoFrameLuma(
      Multimodal.asVideoCutTable(Tables.documents(s, d)))
    val w = Window.partitionBy("doc_id").orderBy("frame")
    val thr = col("width").cast("long") * col("height") * 50L
    frames
      .withColumn("delta", col("luma_sum") - lag(col("luma_sum"), 1).over(w))
      .groupBy("doc_id")
      .agg((max(col("frame")) + 1L).as("n_frames"),
        min(when(col("delta") > thr, col("frame"))).as("cut_frame"),
        sum(when(col("delta") > thr, 1L).otherwise(0L)).cast("long")
          .as("n_cuts"),
        max(when(col("delta") > thr, col("delta"))).as("delta_at_cut"))
      .orderBy("doc_id")
  }

  /** Multimodal — COMPRESSED video: real AVI/RIFF demux + real JPEG
    * (MJPEG) decompression per frame. Frames are uniform gray at
    * quality 1.0 — the measured exactness envelope of the JDK JPEG
    * codec (see Multimodal's MJPEG section comment) — so the decoded
    * gray values, and their sum over every frame of every doc, are
    * closed-form oracle predictions through an actually-lossy codec. */
  val mmMjpeg: Q = Q.sql(
    "mm_mjpeg_decode",
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(2 + doc_id % 4 AS BIGINT) AS n,
      |    CAST(doc_id % 200 AS BIGINT) AS g
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(16 + (doc_id % 5) * 8 AS INTEGER) AS width,
      |  CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS height,
      |  CAST(n AS INTEGER) AS container_frames,
      |  n AS n_frames,
      |  CAST(g AS INTEGER) AS gray_first,
      |  CAST(n*g + 7*((n-1)*n//2) AS BIGINT) AS gray_sum
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.decodeAviMjpeg(
      Multimodal.asAviTable(Tables.documents(s, d)))
      .orderBy("doc_id")
  }

  /** Multimodal — the SAME measured-exact MJPEG frames inside a real
    * QuickTime/MOV container ([[Multimodal.synthMovPayload]] /
    * [[Multimodal.decodeMovMjpeg]]): big-endian atom tree, 'vide'
    * handler + 'jpeg' sample description, and — the part RIFF doesn't
    * have — TABLE-DRIVEN frame location (stsz sizes, stsc sample→chunk
    * mapping, stco absolute offsets, the standard expansion). The gate
    * adds the time atoms: mvhd timescale and the stts-summed duration
    * are closed-form predictions too, so a wrong entry in any sample or
    * time table breaks the hash. */
  val mmMov: Q = Q.sql(
    "mm_mov_decode",
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(2 + doc_id % 4 AS BIGINT) AS n,
      |    CAST(doc_id % 200 AS BIGINT) AS g
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(16 + (doc_id % 5) * 8 AS INTEGER) AS width,
      |  CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS height,
      |  CAST(2400 AS INTEGER) AS timescale,
      |  CAST(n * 100 AS BIGINT) AS duration_ts,
      |  CAST(n AS INTEGER) AS container_frames,
      |  n AS n_frames,
      |  CAST(g AS INTEGER) AS gray_first,
      |  CAST(n*g + 7*((n-1)*n//2) AS BIGINT) AS gray_sum
      |FROM d ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.decodeMovMjpeg(
      Multimodal.asMovTable(Tables.documents(s, d)))
      .orderBy("doc_id")
  }

  /** Multimodal — aspect-preserving resize spec over the REAL decoded
    * dims (ImageIO path). Target 12 px so the corpus mixes up- and
    * down-scales; the scale ratio/floor math is exact IEEE double in
    * both engines. */
  val mmResize: Q = Q.sql(
    "mm_resize",
    """WITH dims AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN 'bmp'
      |         WHEN doc_id % 8 = 1 THEN 'gif' ELSE 'png' END AS format,
      |    CAST(8 + doc_id % 9 AS INTEGER) AS width,
      |    CAST(8 + doc_id % 13 AS INTEGER) AS height
      |  FROM documents
      |)
      |SELECT doc_id, format, width, height,
      |  LEAST(12.0 / width, 12.0 / height) AS scale,
      |  CAST(FLOOR(width * LEAST(12.0 / width, 12.0 / height)) AS INTEGER) AS out_width,
      |  CAST(FLOOR(height * LEAST(12.0 / width, 12.0 / height)) AS INTEGER) AS out_height,
      |  LEAST(12.0 / width, 12.0 / height) > 1.0 AS is_upscale
      |FROM dims ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.resizeSpec(
      Multimodal.decodeImages(
        Multimodal.asImageTable(Tables.documents(s, d))), target = 12)
      .select("doc_id", "format", "width", "height", "scale",
        "out_width", "out_height", "is_upscale")
      .orderBy("doc_id")
  }

  /** Multimodal — frame sampling: every 3rd 16-byte frame exploded to
    * its own row with offset + lead byte (the batch-decoder row shape). */
  val mmFrameSample: Q = Q.sql(
    "mm_frame_sample",
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
      |    text
      |  FROM documents
      |), f AS (
      |  -- payload_bytes > 0 mirrors the model's empty-payload guard
      |  -- (Spark's sequence(0,-1) throws where generate_series is empty).
      |  SELECT doc_id, media_type, payload_bytes,
      |    (payload_bytes + 15) // 16 AS n_frames, text
      |  FROM t WHERE payload_bytes > 0
      |)
      |SELECT doc_id, media_type, payload_bytes, n_frames,
      |  unnest(generate_series(0, n_frames - 1, 3)) AS frame_idx,
      |  unnest(generate_series(0, n_frames - 1, 3)) * 16 AS frame_offset,
      |  ascii(substr(text,
      |    CAST(unnest(generate_series(0, n_frames - 1, 3)) * 16 + 1 AS INTEGER),
      |    1)) AS frame_lead_byte
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    Multimodal.frameSample(
      Multimodal.asMediaTable(Tables.documents(s, d)))
      .orderBy("doc_id", "frame_idx")
  }

  /** Shared oracle CTE chain for the perceptual-hash family: replays
    * the md5-derived 9×8 pixel grid (hex6 semantics — the expr string
    * parses in BOTH engines, here run by DuckDB only), the single
    * perturbed pixel of each near-copy doc, the 64 dHash comparison
    * bits, and the 2×32-bit packing. Ends at CTE `h(doc_id, hash_lo,
    * hash_hi)`; `phdocs` is the doc-id set to hash. */
  /** `prefix` renames every CTE (`<p>h`, `<p>bits`, …) and `lead`
    * drops the `WITH` keyword, so TWO hash families can coexist in one
    * query (the migrate gate replays the 9×8 AND 17×8 grids). Defaults
    * keep all existing callers semantically unchanged. */
  private def phashHashCtes(
      phdocs: String = "SELECT doc_id FROM documents",
      prefix: String = "", lead: Boolean = true): String = {
    val h6 = TA.hex6Expr("md5('ph|' || b || '|' || x || '|' || y)")
    val p = prefix
    val w = if (lead) "WITH " else ""
    s"""$w${p}phdocs AS ($phdocs), ${p}d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 4 AND doc_id >= 4
      |         THEN doc_id - 3 ELSE doc_id END AS b
      |  FROM ${p}phdocs
      |), ${p}px AS (
      |  SELECT d.doc_id, d.b, xs.x, ys.y
      |  FROM ${p}d d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS x) xs
      |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS y) ys
      |), ${p}g0 AS (
      |  SELECT doc_id, x, y, $h6 % 251 AS gray0,
      |    doc_id <> b AND x = doc_id % 9 AND y = (doc_id // 9) % 8 AS pert
      |  FROM ${p}px
      |), ${p}g AS (
      |  SELECT doc_id, x, y,
      |    CASE WHEN pert THEN (gray0 + 100) % 251 ELSE gray0 END AS gray
      |  FROM ${p}g0
      |), ${p}bits AS (
      |  SELECT a.doc_id, a.y * 8 + a.x AS pos,
      |    CASE WHEN bb.gray > a.gray THEN 1 ELSE 0 END AS bit
      |  FROM ${p}g a JOIN ${p}g bb
      |    ON bb.doc_id = a.doc_id AND bb.y = a.y AND bb.x = a.x + 1
      |  WHERE a.x < 8
      |), ${p}h AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN pos < 32
      |      THEN bit * CAST(POWER(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS hash_lo,
      |    CAST(SUM(CASE WHEN pos >= 32
      |      THEN bit * CAST(POWER(2, pos - 32) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS hash_hi
      |  FROM ${p}bits GROUP BY 1
      |)""".stripMargin
  }

  /** 128-bit sibling of [[phashHashCtes]]: replays the 17×8 grid of
    * `Multimodal.ph128Gray` (same md5 hex6 pixel spec, perturbed pixel
    * at (doc_id % 17, (doc_id // 17) % 8)), the 16 diffs × 8 rows =
    * 128 dHash bits, and the 4×32-bit word packing. Ends at CTE
    * `h(doc_id, h0, h1, h2, h3)`. */
  private def phash128HashCtes(
      phdocs: String = "SELECT doc_id FROM documents",
      prefix: String = "", lead: Boolean = true): String = {
    val h6 = TA.hex6Expr("md5('ph|' || b || '|' || x || '|' || y)")
    val words = (0 until 4).map(w =>
      s"""CAST(SUM(CASE WHEN pos // 32 = $w
      |      THEN bit * CAST(POWER(2, pos % 32) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS h$w""".stripMargin).mkString(",\n      |    ")
    val p = prefix
    val lw = if (lead) "WITH " else ""
    s"""$lw${p}phdocs AS ($phdocs), ${p}d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 4 AND doc_id >= 4
      |         THEN doc_id - 3 ELSE doc_id END AS b
      |  FROM ${p}phdocs
      |), ${p}px AS (
      |  SELECT d.doc_id, d.b, xs.x, ys.y
      |  FROM ${p}d d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS x) xs
      |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS y) ys
      |), ${p}g0 AS (
      |  SELECT doc_id, x, y, $h6 % 251 AS gray0,
      |    doc_id <> b AND x = doc_id % 17 AND y = (doc_id // 17) % 8 AS pert
      |  FROM ${p}px
      |), ${p}g AS (
      |  SELECT doc_id, x, y,
      |    CASE WHEN pert THEN (gray0 + 100) % 251 ELSE gray0 END AS gray
      |  FROM ${p}g0
      |), ${p}bits AS (
      |  SELECT a.doc_id, a.y * 16 + a.x AS pos,
      |    CASE WHEN bb.gray > a.gray THEN 1 ELSE 0 END AS bit
      |  FROM ${p}g a JOIN ${p}g bb
      |    ON bb.doc_id = a.doc_id AND bb.y = a.y AND bb.x = a.x + 1
      |  WHERE a.x < 16
      |), ${p}h AS (
      |  SELECT doc_id,
      |    $words
      |  FROM ${p}bits GROUP BY 1
      |)""".stripMargin
  }

  /** Multimodal — perceptual hash (dHash) through the REAL codec: PNG
    * payloads synthesized executor-side from md5-derived pixel
    * formulas, decoded with `ImageIO.read`, and dHashed from the actual
    * raster. The oracle recomputes every pixel, every comparison bit,
    * and the 2×32-bit packing in SQL — one wrong pixel anywhere in the
    * encode/decode/hash chain breaks the hash gate. */
  val mmDhash: Q = Q.sql(
    "mm_dhash",
    s"""${phashHashCtes()}
      |SELECT doc_id, hash_lo, hash_hi FROM h
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.dHash64(
      Multimodal.asPhashImageTable(Tables.documents(s, d)))
      .orderBy("doc_id")
  }

  /** Multimodal — image NEAR-DUP detection: banded Hamming pairing over
    * the real-decode dHashes (4×16-bit pigeonhole bands — exact recall
    * at Hamming ≤ 3 — then xor/bit_count verify). Every planted
    * near-copy (one perturbed pixel, ≤ 2 flipped bits) must surface
    * with its exact Hamming distance; both engines replay the identical
    * band/verify arithmetic, so recall AND precision of the pairing are
    * inside the hash gate. */
  val mmPhashNearDup: Q = Q.sql(
    "mm_phash_neardup",
    s"""${phashHashCtes()}, banded AS (
      |  SELECT h.doc_id, h.hash_lo, h.hash_hi, bs.band,
      |    CASE bs.band WHEN 0 THEN h.hash_lo % 65536
      |                 WHEN 1 THEN h.hash_lo // 65536
      |                 WHEN 2 THEN h.hash_hi % 65536
      |                 ELSE h.hash_hi // 65536 END AS band_key
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
      |), cand AS (
      |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
      |    l.hash_lo AS lo_a, l.hash_hi AS hi_a,
      |    r.hash_lo AS lo_b, r.hash_hi AS hi_b
      |  FROM banded l JOIN banded r
      |    ON r.band = l.band AND r.band_key = l.band_key
      |    AND l.doc_id < r.doc_id
      |  WHERE bit_count(xor(l.hash_lo, r.hash_lo))
      |      + bit_count(xor(l.hash_hi, r.hash_hi)) <= 3
      |)
      |SELECT doc_a, doc_b,
      |  CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
      |    AS BIGINT) AS hamming,
      |  lo_a, hi_a, lo_b, hi_b
      |FROM cand ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Multimodal.phashNearDups(
      Multimodal.dHash64(
        Multimodal.asPhashImageTable(Tables.documents(s, d))))
      .orderBy("doc_a", "doc_b")
  }

  /** Text analysis — Gopher-style repetition signals: top-bigram and
    * duplicate-bigram occurrence fractions per document
    * (TextAnalysis.repetitionSignals). */
  val tRepetition: Q = Q.sql(
    "t_text_repetition",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> concat_ws(' ', toks[i], toks[i+1]))) AS shingle
      |  FROM t
      |), c AS (
      |  SELECT doc_id, shingle, COUNT(*) AS c FROM s GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_ngrams,
      |  CAST(MAX(c) AS BIGINT) AS top_ngram_count,
      |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_ngram_occurrences,
      |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_ngram_fraction,
      |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_ngram_fraction
      |FROM c GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TA.repetitionSignals(Tables.documents(s, d), col("doc_id"),
      col("text"), n = 2)
      .orderBy("doc_id")
  }

  /** Contamination — benchmark n-gram collision scan: every 97th doc
    * plays the held-out eval set; corpus docs are scored by the share
    * of their distinct 3-grams that collide with any benchmark 3-gram
    * (Contamination.contaminationScores). */
  val tContamination: Q = Q.sql(
    "t_contamination",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), s AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingle
      |  FROM t
      |), bench AS (
      |  SELECT DISTINCT shingle FROM s WHERE doc_id % 97 = 0
      |), corpus AS (
      |  SELECT * FROM s WHERE doc_id % 97 <> 0
      |)
      |SELECT c.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
      |  CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS contamination_ratio,
      |  CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) >= 0.05 AS is_contaminated
      |FROM corpus c LEFT JOIN bench b USING (shingle)
      |GROUP BY c.doc_id
      |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
    import graft.llm.Contamination
    val docs = Tables.documents(s, d)
    Contamination.contaminationScores(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      col("doc_id"), col("text"), n = 3, threshold = 0.05)
      .orderBy("doc_id")
  }

  /** Text analysis — PII scrubbing: synthesized email + phone appended
    * to each document, redacted with typed placeholders, audited by
    * match counts; the scrubbed text is hash-compared
    * (TextAnalysis.withPiiScrub). */
  val tPiiScrub: Q = Q.sql(
    "t_pii_scrub",
    """WITH t AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com or 555-'
      |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text2
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text2,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text2, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(
      |    regexp_replace(text2,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_fp
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withPii = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text2"))
    TA.withPiiScrub(withPii, col("text2"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("scrubbed_text")).as("scrubbed_fp"))
      .orderBy("doc_id")
  }

  /** Text analysis — vocabulary building: global token frequencies,
    * deterministic top-500, corpus share (TextAnalysis.vocabTopK;
    * distributed TakeOrdered top-k, not a global sort). */
  val tVocab: Q = Q.sql(
    "t_vocab_topk",
    s"""WITH tok AS (
      |  SELECT unnest(toks) AS token
      |  FROM (SELECT $toksSql AS toks FROM documents)
      |), c AS (
      |  SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
      |), total AS (
      |  SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens FROM c
      |), ranked AS (
      |  SELECT token, CAST(freq AS BIGINT) AS freq,
      |    ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
      |  FROM c
      |)
      |SELECT r.rank, r.token, r.freq,
      |  CAST(r.freq AS DOUBLE) / t.total_tokens AS token_share
      |FROM ranked r CROSS JOIN total t
      |WHERE r.rank <= 500
      |ORDER BY r.rank""".stripMargin) { (s, d) =>
    TA.vocabTopK(Tables.documents(s, d), col("text"), k = 500)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("rank")
  }

  /** CORPUS CURATION — the end-to-end filter chain a pretraining
    * pipeline runs, composed from the individual operators: language
    * gate (marker heuristic), quality gate, exact-dedup canonical gate,
    * repetition gate — each doc emerges kept or tagged with its FIRST
    * failing rule. Row-level signals are one scan; dedup is one
    * digest-keyed window; repetition is the doc-keyed double aggregate
    * joined back — no operator in the chain exceeds the plan shape it
    * was individually certified with. */
  val tCorpusCuration: Q = Q.sql(
    "t_corpus_curation",
    s"""WITH t AS (
      |  SELECT doc_id, text, $toksSql AS toks FROM documents
      |), sig AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is','a'], x))) AS BIGINT) AS en_hits,
      |    CAST(len(list_filter(toks, x -> list_contains(['el','la','de','y','que'], x))) AS BIGINT) AS es_hits,
      |    CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS de_hits,
      |    CAST(len(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS BIGINT) AS fr_hits,
      |    LEAST(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
      |      + (1.0 - CASE WHEN length(text) > 0
      |           THEN CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
      |           ELSE 0.0 END) * 0.2
      |      + CASE WHEN len(toks) > 0
      |           THEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','for','on','with'], x))) AS DOUBLE) / len(toks)
      |           ELSE 0.0 END * 0.2
      |      + CASE WHEN len(toks) > 0
      |           THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |           ELSE 0.0 END * 0.2 AS quality_score,
      |    MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canonical_id
      |  FROM t
      |), lng AS (
      |  SELECT *, GREATEST(en_hits, es_hits, de_hits, fr_hits) AS best FROM sig
      |), lang2 AS (
      |  SELECT doc_id, quality_score, canonical_id,
      |    CASE WHEN best = 0 THEN 'und'
      |         WHEN en_hits = best THEN 'en'
      |         WHEN es_hits = best THEN 'es'
      |         WHEN de_hits = best THEN 'de'
      |         ELSE 'fr' END AS predicted_lang
      |  FROM lng
      |), bi AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> concat_ws(' ', toks[i], toks[i+1]))) AS shingle
      |  FROM t
      |), bc AS (
      |  SELECT doc_id, shingle, COUNT(*) AS c FROM bi GROUP BY 1, 2
      |), rep AS (
      |  SELECT doc_id,
      |    CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_ngram_fraction
      |  FROM bc GROUP BY doc_id
      |), joined AS (
      |  SELECT l.doc_id, l.predicted_lang, l.quality_score,
      |    l.doc_id <> l.canonical_id AS is_duplicate,
      |    COALESCE(r.top_ngram_fraction, 0.0) AS rep_fraction
      |  FROM lang2 l LEFT JOIN rep r USING (doc_id)
      |)
      |SELECT doc_id, predicted_lang, quality_score, is_duplicate,
      |  rep_fraction,
      |  predicted_lang = 'en' AND quality_score >= 0.5
      |    AND NOT is_duplicate AND rep_fraction < 0.2 AS kept,
      |  CASE WHEN predicted_lang <> 'en' THEN 'language'
      |       WHEN quality_score < 0.5 THEN 'quality'
      |       WHEN is_duplicate THEN 'duplicate'
      |       WHEN rep_fraction >= 0.2 THEN 'repetition'
      |       ELSE 'kept' END AS drop_reason
      |FROM joined ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.llm.Dedup
    val docs = Tables.documents(s, d)
    val toks = TA.tokens(col("text"))
    val rowSignals = TA.withQuality(docs, col("text"))
      .withColumn("predicted_lang", TA.langId(toks))
      .select("doc_id", "predicted_lang", "quality_score")
    val dd = Dedup.exact(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("is_duplicate"))
    val rep = TA.repetitionSignals(docs, col("doc_id"), col("text"), n = 2)
      .select(col("doc_id"), col("top_ngram_fraction"))
    val joined = rowSignals
      .join(dd, Seq("doc_id"))
      .join(rep, Seq("doc_id"), "left")
      .withColumn("rep_fraction",
        coalesce(col("top_ngram_fraction"), lit(0.0)))
    joined
      .select(col("doc_id"), col("predicted_lang"), col("quality_score"),
        col("is_duplicate"), col("rep_fraction"),
        (col("predicted_lang") === "en" && col("quality_score") >= 0.5 &&
          !col("is_duplicate") && col("rep_fraction") < 0.2).as("kept"),
        when(col("predicted_lang") =!= "en", "language")
          .when(col("quality_score") < 0.5, "quality")
          .when(col("is_duplicate"), "duplicate")
          .when(col("rep_fraction") >= 0.2, "repetition")
          .otherwise("kept").as("drop_reason"))
      .orderBy("doc_id")
  }

  /** LEAKAGE-SAFE SPLIT through the REAL near-dup pipeline:
    * `simhash64FromTokens` → banded near-dup pairs →
    * `connectedComponents` → [[TextAnalysis.leakageSafeSplit]] —
    * train/val/test assignment hashed at the CLUSTER grain so no
    * near-dup pair can straddle the train/test wall. The gate pins
    * the contrast: `cluster_is_leaky` is FALSE on every row (split is
    * a function of the component — the invariant itself is
    * hash-checked), while `naive_is_leaky` marks the multi-doc
    * clusters a doc-grain hash split (same seed, same buckets) DOES
    * tear apart — the measured contamination a cluster-level split
    * removes. Band width from `Dedup.autoBandPolicy` over the corpus
    * count (r16, with dd_cluster_canonical: leakage-safe splitting is
    * the one operator where band saturation silently under-merges —
    * i.e. leaks — so the consumer must stop inheriting a fixed width;
    * the choice is hash-gated via `band_bits` and the twin replays
    * `Dedup.DefaultBucketCap` with a bucket-size window). Runs the
    * FULL corpus like dd_cluster_canonical (the 64-bit layout's pair
    * volume makes the sample unnecessary — and a split gate SHOULD
    * cover every document); seed 'split14' re-checked at both draws
    * per the sketch-demo rule on the 64-bit full-corpus clusters —
    * 4 / 117 naive-leaky of 17 / 303 multi-doc clusters at
    * sf0.01 / sf0.1, zero cluster-leaky at either. The DuckDB twin
    * recomputes pairs,
    * closes them with a recursive CTE, and replays both hash
    * assignments with the portable instr-based hex expansion. */
  val tLeakageSafeSplit: Q = {
    val highHex = "('8','9','a','b','c','d','e','f')"
    val votes = (1 to 64).map { i =>
      val src = if (i <= 32) s"substr(md5(token), $i, 1)"
        else s"substr(md5('s2|' || token), ${i - 32}, 1)"
      s"SUM(CASE WHEN $src IN $highHex THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n      |    ")
    val bits = (1 to 64).map(i =>
      s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
    Q.sql(
      "t_leakage_safe_split",
      s"""WITH RECURSIVE t AS (
        |  SELECT doc_id, $toksSql AS toks FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token FROM t
        |), v AS (
        |  SELECT doc_id,
        |    $votes
        |  FROM tok GROUP BY doc_id
        |), sh AS (
        |  SELECT doc_id, $bits AS simhash FROM v
        |), sized AS (
        |  SELECT doc_id, simhash, band, band_key,
        |    COUNT(*) OVER (PARTITION BY band, band_key) AS bucket_size
        |  FROM (
        |    SELECT doc_id, simhash, b AS band,
        |      substr(simhash, b * 16 + 1, 16) AS band_key
        |    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b))
        |), cand AS (
        |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.simhash AS sim_a, r.simhash AS sim_b
        |  FROM (SELECT * FROM sized WHERE bucket_size <= 512) l
        |  JOIN (SELECT * FROM sized WHERE bucket_size <= 512) r
        |    USING (band, band_key)
        |  WHERE l.doc_id < r.doc_id
        |  UNION ALL
        |  SELECT doc_a, doc_b, sim_a, sim_b FROM (
        |    SELECT doc_id AS doc_a, LEAD(doc_id) OVER w AS doc_b,
        |      simhash AS sim_a, LEAD(simhash) OVER w AS sim_b
        |    FROM (SELECT * FROM sized WHERE bucket_size > 512)
        |    WINDOW w AS (PARTITION BY band, band_key ORDER BY doc_id))
        |  WHERE doc_b IS NOT NULL
        |), pairs AS (
        |  SELECT DISTINCT doc_a, doc_b FROM cand
        |  WHERE hamming(sim_a, sim_b) <= 3
        |), sym AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), r(a, b) AS (
        |  SELECT doc_id, doc_id FROM t
        |  UNION
        |  SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
        |), comp AS (
        |  SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS component
        |  FROM r GROUP BY a
        |), hashed AS (
        |  SELECT doc_id, component,
        |    md5('split14|' || CAST(component AS VARCHAR)) AS ch,
        |    md5('split14|' || CAST(doc_id AS VARCHAR)) AS nh
        |  FROM comp
        |), b AS (
        |  SELECT doc_id, component,
        |    CAST(${TA.hex6Expr("ch")} % 100 AS BIGINT) AS sample_bucket,
        |    CAST(${TA.hex6Expr("nh")} % 100 AS BIGINT) AS naive_bucket
        |  FROM hashed
        |), sp AS (
        |  SELECT doc_id, component, sample_bucket,
        |    CASE WHEN sample_bucket < 80 THEN 'train'
        |         WHEN sample_bucket < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |    CASE WHEN naive_bucket < 80 THEN 'train'
        |         WHEN naive_bucket < 90 THEN 'val'
        |         ELSE 'test' END AS naive_split
        |  FROM b
        |), cs AS (
        |  SELECT component, CAST(COUNT(*) AS BIGINT) AS component_size,
        |    COUNT(DISTINCT split) > 1 AS cluster_is_leaky,
        |    COUNT(DISTINCT naive_split) > 1 AS naive_is_leaky
        |  FROM sp GROUP BY component
        |)
        |SELECT sp.doc_id, sp.component, sp.sample_bucket, sp.split,
        |  sp.naive_split, cs.component_size, cs.cluster_is_leaky,
        |  cs.naive_is_leaky, CAST(64 AS BIGINT) AS band_bits
        |FROM sp JOIN cs USING (component)
        |ORDER BY sp.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tokenRows = docs.select(col("doc_id"),
        explode(TA.tokens(col("text"))).as("token"))
      // autoBandPolicy width + twin-replayed DefaultBucketCap, gated
      // via band_bits — see dd_cluster_canonical (identical r16
      // migration; this is the consumer where band saturation
      // silently under-merges = LEAKS, so the policy matters most).
      // Sizing count memoized per dir (r16 ADVICE, knownN pattern).
      val bits = Dedup.autoBandPolicy(Tables.documentsCount(s, d))
      val pairs = Dedup.simhashNearDups(
        Dedup.simhashForWidth(bits, tokenRows), bits = bits)
      val cc = Dedup.nearDupLabels(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val sp = TA.leakageSafeSplit(cc, seed = "split14",
          valPct = 10, testPct = 10)
        .withColumn("nh",
          md5(concat(lit("split14|"), col("doc_id").cast("string"))))
        .withColumn("naive_bucket", expr(s"${TA.hex6Expr("nh")} % 100L"))
        .withColumn("naive_split",
          when(col("naive_bucket") < 80, "train")
            .when(col("naive_bucket") < 90, "val")
            .otherwise("test"))
      val cs = sp.groupBy(col("component"))
        .agg(count(lit(1)).as("component_size"),
          (countDistinct(col("split")) > 1).as("cluster_is_leaky"),
          (countDistinct(col("naive_split")) > 1).as("naive_is_leaky"))
      sp.join(cs, Seq("component"))
        .select(col("doc_id"), col("component"), col("sample_bucket"),
          col("split"), col("naive_split"), col("component_size"),
          col("cluster_is_leaky"), col("naive_is_leaky"),
          lit(bits).cast("long").as("band_bits"))
        .orderBy("doc_id")
    }
  }

  /** SHARDED TOP-K HEAVY HITTERS through the REAL
    * [[TextAnalysis.shardedTopK]]: per-shard exact counts → per-shard
    * top-300 candidates → TPUT pruning certificate τ = Σ shard
    * cutoffs → exact global counts of candidates only → top-20. The
    * gate pins counts AND the certificate (`above_threshold`:
    * global_cnt ≥ τ ⇒ the result is provably the exact top-k despite
    * never counting non-candidate items globally or sorting the
    * vocabulary). Items are BIGRAMS (word unigrams here have a ~31-
    * token vocabulary — trivially small; bigrams give ~880 distinct
    * keys per shard) built with the codegen'd [[TextAnalysis
    * .shingleRows]] lead-window form; the twin zips parallel unnests.
    * perShard=300 is the measured certificate margin: the bigram
    * distribution is near-uniform, and at perShard=200 τ misses the
    * 20th count BY ONE at sf0.1 (333 vs 332) — the failure mode the
    * certificate exists to catch, checked at both SFs. Shard =
    * doc_id % 8 — deterministic, both engines. The only unbounded
    * aggregations are per-shard (map-side partial-friendly); the
    * global window runs over ≤ 2,400 candidate rows. */
  val tTopkShardedVerified: Q = Q.sql(
    "t_topk_sharded_verified",
    s"""WITH t AS (
      |  SELECT doc_id, $toksSql AS toks FROM documents
      |), p AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> toks[i])) AS w1,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> toks[i+1])) AS w2
      |  FROM t
      |), tok AS (
      |  SELECT doc_id % 8 AS shard, w1 || ' ' || w2 AS token FROM p
      |), sc AS (
      |  SELECT shard, token, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM tok GROUP BY 1, 2
      |), ranked AS (
      |  SELECT shard, token, cnt, ROW_NUMBER() OVER (
      |    PARTITION BY shard ORDER BY cnt DESC, token) AS rn
      |  FROM sc
      |), cand AS (
      |  SELECT DISTINCT token FROM ranked WHERE rn <= 300
      |), tau AS (
      |  SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS tau
      |  FROM ranked WHERE rn = 300
      |), g AS (
      |  SELECT token, CAST(SUM(cnt) AS BIGINT) AS global_cnt
      |  FROM sc WHERE token IN (SELECT token FROM cand)
      |  GROUP BY token
      |), top AS (
      |  SELECT token, global_cnt, CAST(ROW_NUMBER() OVER (
      |    ORDER BY global_cnt DESC, token) AS BIGINT) AS rank
      |  FROM g
      |)
      |SELECT rank, token, global_cnt, t.tau,
      |  global_cnt >= t.tau AS above_threshold
      |FROM top CROSS JOIN tau t
      |WHERE rank <= 20 ORDER BY rank""".stripMargin) { (s, d) =>
    val bigrams = TA.shingleRows(Tables.documents(s, d),
      col("doc_id"), col("text"), n = 2)
    TA.shardedTopK(bigrams, col("doc_id") % 8, col("shingle"),
        perShard = 300, k = 20)
      .orderBy("rank")
  }

  val all: Seq[Q] = Seq(tTokens, tTokensBpe, tBpePairCounts, tLangId,
    tQuality, tQualityQuantile, tQualityDecileProfile, tCurriculumOrder,
    tQualityQuantileByLang, tMadOutliers,
    tTokenQuantiles,
    tBpeTrainApply, tBpeApplyMerges, tCountMin, tHll, tHllMerge,
    tKmvTheta,
    tInvertedIndex,
    tTfidfTopK, tBigramLm, tFeatureHash,
    ddSsjoinPrefix,
    tFingerprint, tRepetition, tContamination, tPiiScrub, tVocab,
    tCorpusCuration, tPacking, tQuotaSample, tWeightedSample,
    tTemperatureMix,
    tCorpusShuffle,
    tStratifiedSplit, tLeakageSafeSplit, tTopkShardedVerified,
    tDocChunking, tOovRate, ddExact, ddExactNormalized, ddIncrementalDedup,
    ddIncrementalBloom, ddIncrementalIndexChain, ddNearDupIndexChain,
    ddClusterCanonical, ddShardedClusterMerge,
    ddShardedIncrementalMerge, ddShardedHotBucketMerge,
    ddShardedProbeCapMerge, ddShardedProbeRankCompact,
    ddUrlDedup, ddLineDedup, ddDupSpanCoverage, ddDupSpanRemoval,
    ddConnectedComponents, ddCcIncremental, ddMinhashLsh,
    ddMinhashEstimate,
    ddLshBandSweep, ddSimhash,
    ddSimhashNearDup, ddSimhash64NearDup, ddSimhash128NearDup,
    ddSimhashEval, ddSimhashHotBucketChain,
    ddEmbeddingNearDup, annBruteForce,
    annHardNegatives, annEmbeddingDrift, tDomainPolicy,
    annLsh, annRhLsh,
    annIvf, mmBinary, mmFeatures, mmAudio, mmVideo, mmSceneCut, mmMjpeg,
    mmMov,
    mmResize,
    mmFrameSample, mmDhash, mmPhashNearDup, mmAudioEnergy,
    ddPhashIndexChain, ddPhash128IndexChain,
    ddPhashPolicySmall, ddPhashPolicyLarge, ddPhashMigrateChain)
}
