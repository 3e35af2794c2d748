package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.Tables
import graft.ingest.Ingest
import graft.operators.MergeUpsert
import graft.ref.Staging

/** End-to-end ingest chain under the oracle gate — the S3/S5/I4
  * interplay that was previously ScalaTest-only: a seed batch plus two
  * incremental batches are stamped by the REAL `Ingest.withLoadMetadata`
  * (S3), merged with two sequential REAL `MergeUpsert.upsert` calls (S5;
  * later batches win per key, non-colliding rows survive — the
  * seed/incremental discipline of I4), then staged by the REAL
  * `Staging.items` model. The DuckDB twin emulates the two sequential
  * upserts with one priority window (inc2=3 > inc1=2 > seed=1), which is
  * equivalent because each batch has unique keys.
  *
  * `load_date` (stamped `current_date()`) is projected out of the
  * compared frame — it is the one metadata column that is wall-clock,
  * not data, dependent; snapshot_date/is_seed/source_file are all
  * hash-checked through the chain.
  */
object IngestChainQueries {

  val i4IngestChain: Q = Q.sql(
    "i4_ingest_chain",
    """WITH base AS (
      |  SELECT p_partkey AS k, p_name, p_type, p_retailprice, p_size
      |  FROM part
      |), seed AS (
      |  SELECT 'I' || CAST(k AS VARCHAR) || ' ' AS item_key,
      |    p_name AS item_name, p_type AS item_type,
      |    CASE WHEN k % 9 = 0 THEN '' ELSE 'desc ' || p_name END AS sales_description,
      |    '$' || CAST(p_retailprice AS VARCHAR) AS sales_price,
      |    CAST(k % 500 AS VARCHAR) AS purchase_cost,
      |    CAST(p_size AS VARCHAR) AS quantity_on_hand,
      |    CASE WHEN k % 2 = 0 THEN 'ea' ELSE '' END AS u_m,
      |    'Active' AS status,
      |    '2024-05-01' AS snapshot_date, TRUE AS is_seed,
      |    'All Lists_05_01_2024_export.xlsx' AS source_file, 1 AS pri
      |  FROM base
      |), inc1 AS (
      |  SELECT 'I' || CAST(k AS VARCHAR) || ' ', p_name, p_type,
      |    CASE WHEN k % 9 = 0 THEN '' ELSE 'desc ' || p_name END,
      |    '$' || CAST(p_retailprice AS VARCHAR),
      |    CAST(k % 500 + 7 AS VARCHAR), CAST(p_size AS VARCHAR),
      |    CASE WHEN k % 2 = 0 THEN 'ea' ELSE '' END,
      |    'Updated', '2024-06-01', FALSE,
      |    '2024-06-01_transactions.xlsx', 2
      |  FROM base WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT 'I' || CAST(k + 9000000 AS VARCHAR) || ' ',
      |    'New ' || p_name, p_type, '',
      |    '$' || CAST(p_retailprice AS VARCHAR),
      |    CAST(k % 500 + 1 AS VARCHAR), CAST(p_size AS VARCHAR), 'ea',
      |    'New', '2024-06-01', FALSE,
      |    '2024-06-01_transactions.xlsx', 2
      |  FROM base WHERE k % 11 = 0
      |), inc2 AS (
      |  SELECT 'I' || CAST(k AS VARCHAR) || ' ', p_name, p_type,
      |    CASE WHEN k % 9 = 0 THEN '' ELSE 'desc ' || p_name END,
      |    '$' || CAST(p_retailprice AS VARCHAR),
      |    CAST(k % 500 + 13 AS VARCHAR), CAST(p_size AS VARCHAR),
      |    CASE WHEN k % 2 = 0 THEN 'ea' ELSE '' END,
      |    'Clearance', '2024-07-01', FALSE,
      |    '2024-07-01_transactions.xlsx', 3
      |  FROM base WHERE k % 5 = 0
      |), unioned AS (
      |  SELECT * FROM seed
      |  UNION ALL SELECT * FROM inc1
      |  UNION ALL SELECT * FROM inc2
      |), merged AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY item_key ORDER BY pri DESC) AS rn
      |  FROM unioned
      |)
      |SELECT NULLIF(TRIM(item_key), '') AS item_id,
      |  NULLIF(TRIM(item_name), '') AS item_name,
      |  NULLIF(TRIM(item_type), '') AS item_type,
      |  NULLIF(TRIM(sales_description), '') AS sales_description,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(sales_price, '[,$%\s]', '', 'g') AS DOUBLE), 0.0) AS sales_price,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(purchase_cost, '[,$%\s]', '', 'g') AS DOUBLE), 0.0) AS purchase_cost,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(quantity_on_hand, '[,$%\s]', '', 'g') AS DOUBLE), 0.0) AS quantity_on_hand,
      |  NULLIF(TRIM(u_m), '') AS unit_of_measure,
      |  NULLIF(TRIM(status), '') AS status,
      |  snapshot_date, is_seed, source_file
      |FROM merged WHERE rn = 1 ORDER BY item_id""".stripMargin) { (s, d) =>
    val k = col("p_partkey")
    def batch(src: DataFrame, status: String, costShift: Int): DataFrame =
      src.select(
        concat(lit("I"), k.cast("string"), lit(" "))
          .as("quick_books_internal_id"),
        col("p_name").as("item_name"),
        col("p_type").as("item_type"),
        when(k % 9 === 0, lit(""))
          .otherwise(concat(lit("desc "), col("p_name")))
          .as("sales_description"),
        concat(lit("$"), col("p_retailprice").cast("string"))
          .as("sales_price"),
        (k % 500 + costShift).cast("string").as("purchase_cost"),
        col("p_size").cast("string").as("quantity_on_hand"),
        when(k % 2 === 0, "ea").otherwise("").as("u_m"),
        lit(status).as("status"))

    val part = Tables.part(s, d)
    val seed = Ingest.withLoadMetadata(batch(part, "Active", 0),
      "2024-05-01", isSeed = true,
      sourceFile = "All Lists_05_01_2024_export.xlsx")
    val newRows = part.filter(k % 11 === 0).select(
      concat(lit("I"), (k + 9000000L).cast("string"), lit(" "))
        .as("quick_books_internal_id"),
      concat(lit("New "), col("p_name")).as("item_name"),
      col("p_type").as("item_type"),
      lit("").as("sales_description"),
      concat(lit("$"), col("p_retailprice").cast("string"))
        .as("sales_price"),
      (k % 500 + 1).cast("string").as("purchase_cost"),
      col("p_size").cast("string").as("quantity_on_hand"),
      lit("ea").as("u_m"),
      lit("New").as("status"))
    val inc1 = Ingest.withLoadMetadata(
      batch(part.filter(k % 3 === 0), "Updated", 7).unionByName(newRows),
      "2024-06-01", isSeed = false,
      sourceFile = "2024-06-01_transactions.xlsx")
    val inc2 = Ingest.withLoadMetadata(
      batch(part.filter(k % 5 === 0), "Clearance", 13),
      "2024-07-01", isSeed = false,
      sourceFile = "2024-07-01_transactions.xlsx")

    MergeUpsert.assertSameSchema(seed, inc1)
    MergeUpsert.assertSameSchema(seed, inc2)
    val merged = MergeUpsert.upsert(
      MergeUpsert.upsert(seed, inc1, Seq("quick_books_internal_id")),
      inc2, Seq("quick_books_internal_id"))

    val meta = merged.select(
      trim(col("quick_books_internal_id")).as("item_id"),
      col("is_seed"), col("source_file"))
    Staging.items(merged)
      .drop("load_date")
      .join(meta, Seq("item_id"))
      .orderBy("item_id")
  }

  /** S7 — the append-only export watermark discipline through the REAL
    * `Ingest.appendExport`, two batches chained: the first export runs
    * over the pre-1996 slice and establishes the watermark (driver-side
    * scalar, the reference's logs/last_exported discipline); the second
    * export must emit EXACTLY the rows strictly past it. The DuckDB
    * twin computes the same watermark as a scalar subquery. */
  val s7AppendExport: Q = Q.sql(
    "s7_append_export_chain",
    """WITH src AS (
      |  SELECT o_orderkey AS order_key,
      |    CAST(o_orderdate AS VARCHAR) AS order_date,
      |    o_totalprice AS amount
      |  FROM orders
      |), w1 AS (
      |  SELECT MAX(order_date) AS wm FROM src WHERE order_date < '1996-01-01'
      |)
      |SELECT s.order_key, s.order_date, s.amount, w1.wm AS prior_watermark
      |FROM src s, w1
      |WHERE s.order_date > w1.wm
      |ORDER BY s.order_key""".stripMargin) { (s, d) =>
    val src = Tables.orders(s, d).select(
      col("o_orderkey").as("order_key"),
      col("o_orderdate").cast("string").as("order_date"),
      col("o_totalprice").as("amount"))
    val (_, w1) = Ingest.appendExport(
      src.filter(col("order_date") < "1996-01-01"), "order_date", None)
    val (slice2, _) = Ingest.appendExport(src, "order_date", w1)
    slice2.withColumn("prior_watermark", lit(w1.get)).orderBy("order_key")
  }

  /** S8 — the nested-JSON parse semantics of the enrichment JSONL scan
    * (`Enrichment.readJsonl` / `spark.read.json`), gated via
    * `from_json` over strings synthesized identically in both engines:
    * nested struct access, a missing optional field (→ NULL), a
    * numeric JSON field, and a malformed-document arm (PERMISSIVE →
    * all-NULL row; the DuckDB twin guards with json_valid). */
  val s8JsonParse: Q = Q.sql(
    "s8_json_parse",
    """WITH raw AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 31 = 0 THEN '{broken'
      |         ELSE '{"company_domain":"d' || CAST(c_custkey AS VARCHAR) ||
      |      '.com","enrichment":{' ||
      |      CASE WHEN c_custkey % 9 = 0 THEN ''
      |           ELSE '"industry":"I' || CAST(c_custkey % 12 AS VARCHAR) || '",' END ||
      |      '"employees":' || CAST((c_custkey % 5000) * 3 AS VARCHAR) || '}}'
      |    END AS js
      |  FROM customer
      |)
      |SELECT c_custkey AS id,
      |  CASE WHEN json_valid(js)
      |       THEN json_extract_string(js, '$.company_domain') END AS company_domain,
      |  CASE WHEN json_valid(js)
      |       THEN json_extract_string(js, '$.enrichment.industry') END AS industry,
      |  CASE WHEN json_valid(js)
      |       THEN CAST(json_extract(js, '$.enrichment.employees') AS INTEGER) END AS employees
      |FROM raw ORDER BY id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types._
    val k = col("c_custkey")
    val schema = StructType(Seq(
      StructField("company_domain", StringType),
      StructField("enrichment", StructType(Seq(
        StructField("industry", StringType),
        StructField("employees", IntegerType))))))
    val raw = Tables.customer(s, d).select(k.as("id"),
      when(k % 31 === 0, lit("{broken"))
        .otherwise(concat(
          lit("{\"company_domain\":\"d"), k.cast("string"),
          lit(".com\",\"enrichment\":{"),
          when(k % 9 === 0, lit(""))
            .otherwise(concat(lit("\"industry\":\"I"),
              (k % 12).cast("string"), lit("\","))),
          lit("\"employees\":"), ((k % 5000) * 3).cast("string"),
          lit("}}"))).as("js"))
    raw.select(col("id"),
      from_json(col("js"), schema).as("doc"))
      .select(col("id"),
        col("doc.company_domain").as("company_domain"),
        col("doc.enrichment.industry").as("industry"),
        col("doc.enrichment.employees").as("employees"))
      .orderBy("id")
  }

  /** I7 — DEAD-LETTER quarantine routing through the REAL
    * `Ingest.withQuarantineReason`: a dirty feed synthesized from
    * orders (every 11th amount negated, every 13th date corrupted) is
    * validated by two named rules; rows are tagged with the FIRST
    * failing rule (precedence pinned — keys ≡ 0 mod 143 fail both and
    * must report `amount_negative`) and the gate checks the per-reason
    * row counts, exact cent sums (negative amounts included) and key
    * ranges. `try_cast` is the validation idiom: identical text parses
    * in BOTH engines and never throws under ANSI, which is what lets
    * one malformed row be ROUTED rather than killing the load. */
  val i7QuarantineChain: Q = Q.sql(
    "i7_quarantine_chain",
    """WITH feed AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 11 = 0 THEN -o_totalprice
      |         ELSE o_totalprice END AS amount,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'not-a-date'
      |         ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
      |    END AS date_str
      |  FROM orders
      |), tagged AS (
      |  SELECT k, amount, COALESCE(
      |    CASE WHEN NOT (amount >= 0) THEN 'amount_negative' END,
      |    CASE WHEN try_cast(date_str AS DATE) IS NULL
      |         THEN 'date_unparseable' END) AS reason
      |  FROM feed
      |)
      |SELECT COALESCE(reason, '__kept__') AS reason,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(ROUND(amount * 100) AS BIGINT)) AS BIGINT)
      |    AS amount_cents,
      |  MIN(k) AS min_key, MAX(k) AS max_key
      |FROM tagged GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val feed = o.select(col("o_orderkey").as("k"),
      when(col("o_orderkey") % 11 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("amount"),
      when(col("o_orderkey") % 13 === 0, lit("not-a-date"))
        .otherwise(col("o_orderdate").cast("date").cast("string"))
        .as("date_str"))
    Ingest.withQuarantineReason(feed, Seq(
        "amount_negative" -> (col("amount") >= 0),
        "date_unparseable" ->
          expr("try_cast(date_str AS DATE)").isNotNull))
      .groupBy(coalesce(col("_quarantine_reason"), lit("__kept__"))
        .as("reason"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(round(col("amount") * 100).cast("long")).cast("long")
          .as("amount_cents"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
      .orderBy("reason")
  }

  /** I8 — schema-contract EVOLUTION through the REAL
    * `SchemaContract.align`: two producer generations of one feed —
    * gen-1 still narrower than the contract (INT keys, REAL amounts),
    * gen-2 at contract width plus an uncontracted extra column — are
    * both aligned to the (BIGINT, DOUBLE, VARCHAR) contract and
    * unioned; the gate pins the widening casts (INT→BIGINT exact,
    * REAL→DOUBLE exact by IEEE containment), the extra-column drop,
    * and a mixed-generation rollup. Determinism note (learned here the
    * hard way): float32 values at 1e5 magnitude are multiples of 2⁻⁷ —
    * 7-digit terminating decimals, HALF of them exact .xxxxxx5 ties —
    * so float-widened amounts must NEVER feed the DECIMAL(38,6) sum
    * (the power-of-two-division trap in its float-quantization form);
    * they are gated through MIN/MAX (exact double compares) while the
    * decimal sum covers only the full-width generation. This is the
    * evolution path assertSameSchema ('fail') refuses and a18d's
    * drift check only reports after the fact. */
  val i8ContractEvolution: Q = Q.sql(
    "i8_contract_evolution",
    """WITH gen1 AS (
      |  SELECT CAST(o_orderkey AS INTEGER) AS k,
      |    CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS amount,
      |    o_orderstatus AS tag, 1 AS gen
      |  FROM orders WHERE o_orderkey % 2 = 0
      |), gen2 AS (
      |  SELECT o_orderkey AS k, o_totalprice AS amount,
      |    o_orderstatus AS tag, 2 AS gen
      |  FROM orders WHERE o_orderkey % 2 = 1
      |), unioned AS (
      |  SELECT CAST(k AS BIGINT) AS k, amount, tag, gen FROM gen1
      |  UNION ALL SELECT k, amount, tag, gen FROM gen2
      |)
      |SELECT tag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(amount) AS min_amount, MAX(amount) AS max_amount,
      |  CAST(SUM(CAST((CASE WHEN gen = 2 THEN amount ELSE 0 END)
      |    AS DECIMAL(38,6))) AS DOUBLE) AS total_amount_gen2,
      |  MIN(k) AS min_key, MAX(k) AS max_key
      |FROM unioned GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types._
    import graft.quality.SchemaContract
    val contract = StructType(Seq(StructField("k", LongType),
      StructField("amount", DoubleType), StructField("tag", StringType),
      StructField("gen", IntegerType)))
    val o = Tables.orders(s, d)
    val gen1 = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").cast("int").as("k"),
        col("o_totalprice").cast("float").as("amount"),
        col("o_orderstatus").as("tag"), lit(1).as("gen"))
    val gen2 = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey").as("k"),
        col("o_totalprice").as("amount"),
        col("o_orderstatus").as("tag"), lit(2).as("gen"),
        lit("uncontracted").as("extra"))
    SchemaContract.align(gen1, contract)
      .unionByName(SchemaContract.align(gen2, contract))
      .groupBy("tag")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("amount")).as("min_amount"),
        max(col("amount")).as("max_amount"),
        graft.functions.Det.dsum(
          when(col("gen") === 2, col("amount")).otherwise(0.0))
          .as("total_amount_gen2"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
      .orderBy("tag")
  }

  val all: Seq[Q] = Seq(i4IngestChain, s7AppendExport, s8JsonParse,
    i7QuarantineChain, i8ContractEvolution)
}
