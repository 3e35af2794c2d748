package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ref.{Enrichment, Shopify, Staging}

/** Oracle coverage for the QuickBooks/Shopify STAGING models that were
  * previously ScalaTest-only (P4 customer staging, P6 item staging,
  * P13 Shopify customer staging): synthesized raw frames with the
  * reference's dirty-input characteristics (blank-vs-null fields,
  * $-prefixed money, state-only country rows) are pushed through the
  * REAL `ref.Staging` / `ref.Shopify` functions and hash-compared to
  * DuckDB twins of the staging semantics. Dirty money strings are
  * built only from values whose double→string rendering is
  * engine-identical (the f_safe_numeric precedent — raw testdata
  * doubles, never derived products). */
object StagingChainQueries {

  private val countryCaseSql =
    """CASE WHEN UPPER(TRIM(b_country)) IN ('USA','US','UNITED STATES','U.S.','U.S.A.') THEN 'United States'
      |       WHEN UPPER(TRIM(b_country)) IN ('CA','CANADA') THEN 'Canada'
      |       WHEN UPPER(TRIM(b_country)) IN ('UK','UNITED KINGDOM','GB','GREAT BRITAIN') THEN 'United Kingdom'
      |       WHEN NULLIF(TRIM(b_country), '') IS NOT NULL
      |            THEN UPPER(LEFT(TRIM(b_country), 1)) || LOWER(SUBSTR(TRIM(b_country), 2))
      |       WHEN UPPER(TRIM(b_state)) IN ('AL','AK','AZ','AR','CA','CO','CT','DE','FL','GA','HI','ID','IL','IN','IA','KS','KY','LA','ME','MD','MA','MI','MN','MS','MO','MT','NE','NV','NH','NJ','NM','NY','NC','ND','OH','OK','OR','PA','RI','SC','SD','TN','TX','UT','VT','VA','WA','WV','WI','WY','DC','PR','VI','GU','AS','MP','AA','AE') THEN 'United States'
      |       WHEN UPPER(TRIM(b_state)) IN ('AB','BC','MB','NB','NL','NS','NT','NU','ON','PE','QC','SK','YT') THEN 'Canada'
      |       ELSE 'United States' END""".stripMargin

  /** P4 — the REAL `Staging.customers` transform: blank→null trims,
    * the company→customer→'Unknown Customer' name fallback chain, the
    * full country macro (value, inference, default arms), dirty-money
    * balance, and string→date typing. */
  val p4CustomerStaging: Q = Q.sql(
    "p4_customer_staging",
    s"""WITH raw AS (
      |  SELECT c_custkey,
      |    'QB' || CAST(c_custkey AS VARCHAR) AS qb_id,
      |    CASE WHEN c_custkey % 13 = 0 THEN '' ELSE c_name END AS customer_name,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'Comp ' || CAST(c_custkey AS VARCHAR) ELSE '' END AS company_name,
      |    CASE WHEN c_custkey % 11 = 0 THEN ''
      |         ELSE 'u' || CAST(c_custkey AS VARCHAR) || '@x.com' END AS main_email,
      |    CASE WHEN c_custkey % 2 = 0 THEN 'cc' || CAST(c_custkey AS VARCHAR) || '@x.com' END AS cc_email,
      |    'City ' || CAST(c_custkey % 20 AS VARCHAR) AS b_city,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'TX'
      |         WHEN c_custkey % 3 = 1 THEN 'ON' ELSE '' END AS b_state,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'USA'
      |         WHEN c_custkey % 5 = 1 THEN 'ca'
      |         WHEN c_custkey % 5 = 2 THEN ''
      |         WHEN c_custkey % 5 = 3 THEN 'uk'
      |         ELSE 'Germany' END AS b_country,
      |    c_mktsegment AS sales_rep,
      |    CASE WHEN c_custkey % 4 = 0 THEN 'Net 30' ELSE 'Due on receipt' END AS terms,
      |    '$$' || CAST(c_acctbal AS VARCHAR) AS current_balance,
      |    CAST(DATE '1995-01-01' + CAST(c_custkey % 1000 AS INTEGER) AS VARCHAR) AS created_date
      |  FROM customer
      |)
      |SELECT qb_id AS customer_id,
      |  NULLIF(TRIM(customer_name), '') AS customer_name,
      |  NULLIF(TRIM(company_name), '') AS company_name,
      |  COALESCE(NULLIF(TRIM(company_name), ''), NULLIF(TRIM(customer_name), ''),
      |           'Unknown Customer') AS normalized_customer_name,
      |  NULLIF(TRIM(main_email), '') AS main_email,
      |  NULLIF(TRIM(cc_email), '') AS cc_email,
      |  NULLIF(TRIM(b_city), '') AS billing_city,
      |  NULLIF(TRIM(b_state), '') AS billing_state,
      |  NULLIF(TRIM(b_country), '') AS billing_country_raw,
      |  $countryCaseSql AS billing_country,
      |  NULLIF(TRIM(sales_rep), '') AS sales_rep,
      |  NULLIF(TRIM(terms), '') AS terms,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(current_balance, '[,$$%\\s]', '', 'g') AS DOUBLE), 0.0) AS current_balance,
      |  CAST(CAST(created_date AS DATE) AS VARCHAR) AS created_date
      |FROM raw ORDER BY customer_id""".stripMargin) { (s, d) =>
    val k = col("c_custkey")
    val raw = Tables.customer(s, d).select(
      concat(lit("QB"), k.cast("string")).as("quick_books_internal_id"),
      when(k % 13 === 0, "").otherwise(col("c_name")).as("customer_name"),
      when(k % 3 === 0, concat(lit("Comp "), k.cast("string")))
        .otherwise("").as("company_name"),
      when(k % 11 === 0, lit(""))
        .otherwise(concat(lit("u"), k.cast("string"), lit("@x.com")))
        .as("main_email"),
      when(k % 2 === 0, concat(lit("cc"), k.cast("string"), lit("@x.com")))
        .as("cc_email"),
      concat(lit("City "), (k % 20).cast("string"))
        .as("billing_address_city"),
      when(k % 3 === 0, "TX").when(k % 3 === 1, "ON").otherwise("")
        .as("billing_address_state"),
      when(k % 5 === 0, "USA").when(k % 5 === 1, "ca")
        .when(k % 5 === 2, "").when(k % 5 === 3, "uk")
        .otherwise("Germany").as("billing_address_country"),
      col("c_mktsegment").as("sales_rep"),
      when(k % 4 === 0, "Net 30").otherwise("Due on receipt").as("terms"),
      concat(lit("$"), col("c_acctbal").cast("string"))
        .as("current_balance"),
      date_add(lit("1995-01-01").cast("date"), (k % 1000).cast("int"))
        .cast("string").as("created_date"))
    Staging.customers(raw)
      .withColumn("created_date", col("created_date").cast("string"))
      .orderBy("customer_id")
  }

  /** P6 — the REAL `Staging.items` transform: trims, the three
    * safeNumeric money/quantity parses, and load-metadata passthrough. */
  val p6ItemStaging: Q = Q.sql(
    "p6_item_staging",
    """WITH raw AS (
      |  SELECT p_partkey,
      |    'I' || CAST(p_partkey AS VARCHAR) AS item_id_raw,
      |    p_name, p_type,
      |    CASE WHEN p_partkey % 9 = 0 THEN '' ELSE 'desc of ' || p_name END AS sales_description,
      |    '$' || CAST(p_retailprice AS VARCHAR) AS sales_price,
      |    CASE WHEN p_partkey % 7 = 0 THEN 'N/A'
      |         ELSE CAST(p_partkey % 500 AS VARCHAR) END AS purchase_cost,
      |    CAST(p_size AS VARCHAR) AS quantity_on_hand,
      |    CASE WHEN p_partkey % 2 = 0 THEN 'ea' ELSE '' END AS u_m,
      |    CASE WHEN p_partkey % 10 = 0 THEN 'Inactive' ELSE 'Active' END AS status,
      |    '2024-06-01' AS snapshot_date,
      |    '2024-06-02' AS load_date
      |  FROM part
      |)
      |SELECT item_id_raw AS item_id,
      |  NULLIF(TRIM(p_name), '') AS item_name,
      |  NULLIF(TRIM(p_type), '') AS item_type,
      |  NULLIF(TRIM(sales_description), '') AS sales_description,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(sales_price, '[,$%\s]', '', 'g') AS DOUBLE), 0.0) AS sales_price,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(purchase_cost, '[,$%\s]', '', 'g') AS DOUBLE), 0.0) AS purchase_cost,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(quantity_on_hand, '[,$%\s]', '', 'g') AS DOUBLE), 0.0) AS quantity_on_hand,
      |  NULLIF(TRIM(u_m), '') AS unit_of_measure,
      |  NULLIF(TRIM(status), '') AS status,
      |  snapshot_date, load_date
      |FROM raw ORDER BY item_id""".stripMargin) { (s, d) =>
    val k = col("p_partkey")
    val raw = Tables.part(s, d).select(
      concat(lit("I"), k.cast("string")).as("quick_books_internal_id"),
      col("p_name").as("item_name"),
      col("p_type").as("item_type"),
      when(k % 9 === 0, lit(""))
        .otherwise(concat(lit("desc of "), col("p_name")))
        .as("sales_description"),
      concat(lit("$"), col("p_retailprice").cast("string"))
        .as("sales_price"),
      when(k % 7 === 0, "N/A").otherwise((k % 500).cast("string"))
        .as("purchase_cost"),
      col("p_size").cast("string").as("quantity_on_hand"),
      when(k % 2 === 0, "ea").otherwise("").as("u_m"),
      when(k % 10 === 0, "Inactive").otherwise("Active").as("status"),
      lit("2024-06-01").as("snapshot_date"),
      lit("2024-06-02").as("load_date"))
    Staging.items(raw).orderBy("item_id")
  }

  /** P13 — the REAL `Shopify.customers` staging: identity and consent
    * flatten from DLT's `__`-nested column names, blank→null on every
    * contact/address field, consent-timestamp typing with the
    * blank-guard, and dirty-money total_spent. */
  val p13ShopifyCustomers: Q = Q.sql(
    "p13_shopify_customers_staging",
    """WITH raw AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 11 = 0 THEN ''
      |         ELSE 'u' || CAST(c_custkey AS VARCHAR) || '@x.com' END AS email,
      |    'F' || CAST(c_custkey % 50 AS VARCHAR) AS first_name,
      |    CASE WHEN c_custkey % 6 = 0 THEN '' ELSE 'L' || CAST(c_custkey % 40 AS VARCHAR) END AS last_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN '' ELSE '555-' || CAST(c_custkey % 10000 AS VARCHAR) END AS phone,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'subscribed'
      |         WHEN c_custkey % 3 = 1 THEN 'not_subscribed' END AS email_state,
      |    'single_opt_in' AS opt_in_level,
      |    CASE WHEN c_custkey % 5 = 0 THEN ''
      |         ELSE '2024-01-0' || CAST(c_custkey % 9 + 1 AS VARCHAR) END AS consent_at,
      |    CASE WHEN c_custkey % 4 = 0 THEN 'subscribed' ELSE 'unsubscribed' END AS sms_state,
      |    c_custkey % 2 = 0 AS verified_email,
      |    c_custkey % 10 AS orders_count,
      |    '$' || CAST(c_acctbal AS VARCHAR) AS total_spent,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'Comp' || CAST(c_custkey AS VARCHAR) ELSE '' END AS addr_company,
      |    CAST(c_custkey % 999 AS VARCHAR) || ' Main St' AS addr_1,
      |    'City ' || CAST(c_custkey % 20 AS VARCHAR) AS addr_city,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'TX'
      |         WHEN c_custkey % 3 = 1 THEN 'ON' ELSE '' END AS addr_state,
      |    CAST(10000 + c_custkey % 90000 AS VARCHAR) AS addr_zip,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'US'
      |         WHEN c_custkey % 5 = 1 THEN 'CA' ELSE '' END AS addr_country,
      |    '2023-01-01' AS created_at, '2024-06-01' AS updated_at
      |  FROM customer
      |)
      |SELECT c_custkey AS customer_id,
      |  NULLIF(email, '') AS email,
      |  NULLIF(first_name, '') AS first_name,
      |  NULLIF(last_name, '') AS last_name,
      |  NULLIF(phone, '') AS phone,
      |  email_state AS email_marketing_status,
      |  opt_in_level AS email_opt_in_level,
      |  CAST(CAST(NULLIF(consent_at, '') AS TIMESTAMP) AS VARCHAR) AS email_consent_date,
      |  sms_state AS sms_marketing_status,
      |  verified_email, orders_count,
      |  COALESCE(TRY_CAST(REGEXP_REPLACE(total_spent, '[,$%\s]', '', 'g') AS DOUBLE), 0.0) AS total_spent,
      |  NULLIF(addr_company, '') AS company_name,
      |  NULLIF(addr_1, '') AS address_line1,
      |  NULLIF(addr_city, '') AS city,
      |  NULLIF(addr_state, '') AS state_code,
      |  NULLIF(addr_zip, '') AS postal_code,
      |  NULLIF(addr_country, '') AS country_code,
      |  created_at, updated_at
      |FROM raw ORDER BY customer_id""".stripMargin) { (s, d) =>
    val k = col("c_custkey")
    val raw = Tables.customer(s, d).select(
      k.as("id"),
      when(k % 11 === 0, lit(""))
        .otherwise(concat(lit("u"), k.cast("string"), lit("@x.com")))
        .as("email"),
      concat(lit("F"), (k % 50).cast("string")).as("first_name"),
      when(k % 6 === 0, lit(""))
        .otherwise(concat(lit("L"), (k % 40).cast("string")))
        .as("last_name"),
      when(k % 7 === 0, lit(""))
        .otherwise(concat(lit("555-"), (k % 10000).cast("string")))
        .as("phone"),
      when(k % 3 === 0, "subscribed").when(k % 3 === 1, "not_subscribed")
        .as("email_marketing_consent__state"),
      lit("single_opt_in").as("email_marketing_consent__opt_in_level"),
      when(k % 5 === 0, lit(""))
        .otherwise(concat(lit("2024-01-0"), (k % 9 + 1).cast("string")))
        .as("email_marketing_consent__consent_updated_at"),
      when(k % 4 === 0, "subscribed").otherwise("unsubscribed")
        .as("sms_marketing_consent__state"),
      (k % 2 === 0).as("verified_email"),
      (k % 10).as("orders_count"),
      concat(lit("$"), col("c_acctbal").cast("string")).as("total_spent"),
      when(k % 3 === 0, concat(lit("Comp"), k.cast("string")))
        .otherwise("").as("default_address__company"),
      concat((k % 999).cast("string"), lit(" Main St"))
        .as("default_address__address1"),
      concat(lit("City "), (k % 20).cast("string"))
        .as("default_address__city"),
      when(k % 3 === 0, "TX").when(k % 3 === 1, "ON").otherwise("")
        .as("default_address__province_code"),
      (k % 90000 + 10000).cast("string").as("default_address__zip"),
      when(k % 5 === 0, "US").when(k % 5 === 1, "CA").otherwise("")
        .as("default_address__country_code"),
      lit("2023-01-01").as("created_at"),
      lit("2024-06-01").as("updated_at"))
    Shopify.customers(raw)
      .withColumn("email_consent_date",
        col("email_consent_date").cast("string"))
      .orderBy("customer_id")
  }

  /** P16 — the REAL `TradeShows.leads` staging: lowered emails with
    * invalid/blank filtering, md5-generated ids for missing lead_ids,
    * personal-vs-business domain classification, and the dedup window
    * preferring non-generated ids then earliest created date; every
    * optional column except phone is absent (null-arm guards). */
  val p16TradeShowStaging: Q = Q.sql(
    "p16_trade_show_staging",
    """WITH raw AS (
      |  SELECT c_custkey AS k,
      |    CASE WHEN c_custkey % 4 = 0 THEN '' ELSE 'L' || CAST(c_custkey AS VARCHAR) END AS lead_id_raw,
      |    CASE WHEN c_custkey % 6 = 0 THEN '' ELSE 'F' || CAST(c_custkey % 50 AS VARCHAR) END AS first_name,
      |    'L' || CAST(c_custkey % 40 AS VARCHAR) AS last_name,
      |    CASE WHEN c_custkey % 3 = 0 THEN '' ELSE 'Comp' || CAST(c_custkey % 100 AS VARCHAR) END AS company,
      |    CASE WHEN c_custkey % 41 = 0 THEN 'bad'
      |         ELSE 'U' || CAST(c_custkey % 400 AS VARCHAR) ||
      |           CASE WHEN c_custkey % 5 = 0 THEN '@gmail.com'
      |                WHEN c_custkey % 5 = 1 THEN '@yahoo.com'
      |                ELSE '@corp' || CAST(c_custkey % 20 AS VARCHAR) || '.com' END
      |         END AS email,
      |    CASE WHEN c_custkey % 17 = 0 THEN ''
      |         ELSE CAST(DATE '2024-01-01' + CAST(c_custkey % 499 AS INTEGER) AS VARCHAR) END AS created,
      |    'Show ' || CAST(c_custkey % 3 AS VARCHAR) AS show_name,
      |    CAST(DATE '2024-03-01' + CAST((c_custkey % 3) * 30 AS INTEGER) AS DATE) AS show_date,
      |    CASE WHEN c_custkey % 7 = 0 THEN '' ELSE '555-' || CAST(c_custkey % 10000 AS VARCHAR) END AS phone
      |  FROM customer
      |), cleaned AS (
      |  SELECT
      |    COALESCE(NULLIF(TRIM(lead_id_raw), ''),
      |      'gen_' || LEFT(MD5(LOWER(CONCAT_WS('|',
      |        NULLIF(TRIM(first_name), ''), NULLIF(TRIM(last_name), ''),
      |        LOWER(TRIM(email)), show_name))), 16)) AS lead_id,
      |    NULLIF(TRIM(first_name), '') AS first_name,
      |    NULLIF(TRIM(last_name), '') AS last_name,
      |    NULLIF(TRIM(company), '') AS company,
      |    LOWER(TRIM(email)) AS email,
      |    CAST(NULLIF(TRIM(created), '') AS DATE) AS created,
      |    show_name, show_date,
      |    NULLIF(TRIM(phone), '') AS phone
      |  FROM raw
      |  WHERE LOWER(TRIM(email)) IS NOT NULL AND LOWER(TRIM(email)) <> ''
      |), flagged AS (
      |  SELECT *,
      |    CONCAT_WS(' ', first_name, last_name) AS full_name,
      |    SPLIT_PART(email, '@', 2) AS email_domain,
      |    SPLIT_PART(email, '@', 2) IN ('gmail.com', 'yahoo.com') AS is_personal_email,
      |    CASE WHEN SPLIT_PART(email, '@', 2) IN ('gmail.com', 'yahoo.com')
      |         THEN 'personal_email' ELSE 'business_email' END AS email_type,
      |    email LIKE '%@%' AND SPLIT_PART(email, '@', 2) <> '' AS has_valid_email,
      |    company IS NOT NULL AS has_company_name,
      |    phone IS NOT NULL AS has_phone
      |  FROM cleaned
      |), deduped AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY email ORDER BY
      |      CASE WHEN lead_id LIKE 'gen!_%' ESCAPE '!' THEN 1 ELSE 0 END,
      |      created ASC NULLS LAST, lead_id) AS rn
      |  FROM flagged
      |)
      |SELECT lead_id, email, full_name, email_domain, is_personal_email,
      |  email_type, has_valid_email, has_company_name, has_phone,
      |  company, CAST(created AS VARCHAR) AS created, show_name,
      |  CAST(show_date AS VARCHAR) AS show_date, phone
      |FROM deduped WHERE rn = 1 ORDER BY email""".stripMargin) { (s, d) =>
    val k = col("c_custkey")
    val raw = Tables.customer(s, d).select(
      when(k % 4 === 0, lit(""))
        .otherwise(concat(lit("L"), k.cast("string"))).as("lead_id"),
      when(k % 6 === 0, lit(""))
        .otherwise(concat(lit("F"), (k % 50).cast("string")))
        .as("first_name"),
      concat(lit("L"), (k % 40).cast("string")).as("last_name"),
      when(k % 3 === 0, lit(""))
        .otherwise(concat(lit("Comp"), (k % 100).cast("string")))
        .as("company"),
      when(k % 41 === 0, lit("bad"))
        .otherwise(concat(lit("U"), (k % 400).cast("string"),
          when(k % 5 === 0, "@gmail.com")
            .when(k % 5 === 1, "@yahoo.com")
            .otherwise(concat(lit("@corp"), (k % 20).cast("string"),
              lit(".com"))))).as("email"),
      when(k % 17 === 0, lit(""))
        .otherwise(date_add(lit("2024-01-01").cast("date"),
          (k % 499).cast("int")).cast("string")).as("created"),
      concat(lit("Show "), (k % 3).cast("string")).as("show_name"),
      date_add(lit("2024-03-01").cast("date"),
        ((k % 3) * 30).cast("int")).as("show_date"),
      when(k % 7 === 0, lit(""))
        .otherwise(concat(lit("555-"), (k % 10000).cast("string")))
        .as("phone"))
    graft.ref.TradeShows.leads(raw, Seq("gmail.com", "yahoo.com"))
      .select(
        col("lead_id"), col("email"), col("full_name"),
        col("email_domain"), col("is_personal_email"), col("email_type"),
        col("has_valid_email"), col("has_company_name"), col("has_phone"),
        col("company"), col("created").cast("string").as("created"),
        col("show_name"), col("show_date").cast("string").as("show_date"),
        col("phone"))
      .orderBy("email")
  }

  /** P9 — the REAL `Staging.domainMapping` mapping-table staging:
    * domains lowered+trimmed, normalized side trimmed only, blank and
    * null originals filtered out. */
  val p9MappingStaging: Q = Q.sql(
    "p9_mapping_staging",
    """WITH raw AS (
      |  SELECT n_nationkey,
      |    CASE WHEN n_nationkey % 7 = 0 THEN ''
      |         WHEN n_nationkey % 7 = 1 THEN NULL
      |         WHEN n_nationkey % 2 = 0 THEN '  D' || CAST(n_nationkey AS VARCHAR) || '.COM '
      |         ELSE 'd' || CAST(n_nationkey AS VARCHAR) || '.com' END AS original_domain,
      |    ' corp' || CAST(n_nationkey % 10 AS VARCHAR) || '.com ' AS normalized_domain,
      |    CASE WHEN n_nationkey % 3 = 0 THEN 'corporate' ELSE 'generic' END AS domain_type
      |  FROM nation
      |)
      |SELECT LOWER(TRIM(original_domain)) AS original_domain,
      |  TRIM(normalized_domain) AS normalized_domain, domain_type
      |FROM raw
      |WHERE LOWER(TRIM(original_domain)) IS NOT NULL
      |  AND LOWER(TRIM(original_domain)) <> ''
      |ORDER BY original_domain""".stripMargin) { (s, d) =>
    val nk = col("n_nationkey")
    val raw = Tables.nation(s, d).select(
      when(nk % 7 === 0, lit(""))
        .when(nk % 7 === 1, lit(null).cast("string"))
        .when(nk % 2 === 0,
          concat(lit("  D"), nk.cast("string"), lit(".COM ")))
        .otherwise(concat(lit("d"), nk.cast("string"), lit(".com")))
        .as("original_domain"),
      concat(lit(" corp"), (nk % 10).cast("string"), lit(".com "))
        .as("normalized_domain"),
      when(nk % 3 === 0, "corporate").otherwise("generic")
        .as("domain_type"))
    Staging.domainMapping(raw).orderBy("original_domain")
  }

  /** A8 — the REAL `Marts.fctCompanyOrders` (company, order)-grain
    * summary: broadcast bridge join, per-order line rollups with
    * decimal-exact amounts, the sorted-distinct product-family
    * STRING_AGG, the null-tolerant kit-amount conditional sum, and an
    * integer-valued margin average (kept exactly representable so the
    * double division is engine-identical; a raw double AVG would
    * diverge in the last ulps). */
  val a8CompanyOrders: Q = Q.sql(
    "a8_company_order_summary",
    """WITH li AS (
      |  SELECT 'C' || CAST(l_orderkey % 300 AS VARCHAR) AS customer,
      |    'O' || CAST(l_orderkey AS VARCHAR) AS order_number,
      |    CAST(l_shipdate AS DATE) AS order_date,
      |    CAST(l_extendedprice AS DECIMAL(38,6)) AS line_amount,
      |    'P' || CAST(l_partkey % 200 AS VARCHAR) AS product_service,
      |    'fam' || CAST(l_partkey % 7 AS VARCHAR) AS product_family,
      |    CASE WHEN l_orderkey % 9 = 0 THEN NULL
      |         ELSE l_linenumber % 4 = 0 END AS is_kit,
      |    CAST(l_orderkey % 97 AS DOUBLE) AS margin_amount
      |  FROM lineitem
      |), bridge AS (
      |  SELECT DISTINCT 'C' || CAST(l_orderkey % 300 AS VARCHAR) AS customer,
      |    'corp' || CAST(l_orderkey % 300 % 40 AS VARCHAR) || '.com' AS company_domain_key
      |  FROM lineitem
      |)
      |SELECT b.company_domain_key, li.order_number,
      |  MAX(li.customer) AS customer_name,
      |  CAST(MAX(li.order_date) AS VARCHAR) AS order_date,
      |  COUNT(*) AS line_count,
      |  CAST(SUM(li.line_amount) AS DOUBLE) AS order_amount,
      |  COUNT(DISTINCT li.product_service) AS distinct_products,
      |  STRING_AGG(DISTINCT li.product_family, ' | ' ORDER BY li.product_family) AS product_families,
      |  CAST(SUM(CASE WHEN COALESCE(li.is_kit, FALSE) THEN li.line_amount ELSE 0 END) AS DOUBLE) AS kit_amount,
      |  AVG(li.margin_amount) AS avg_margin
      |FROM li JOIN bridge b ON li.customer = b.customer
      |GROUP BY b.company_domain_key, li.order_number
      |ORDER BY b.company_domain_key, li.order_number""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val k = col("l_orderkey")
    val lineItems = Tables.lineitem(s, d).select(
      concat(lit("C"), (k % 300).cast("string")).as("customer"),
      concat(lit("O"), k.cast("string")).as("order_number"),
      col("l_shipdate").cast("date").as("order_date"),
      col("l_extendedprice").cast(DecimalType(38, 6)).as("line_amount"),
      concat(lit("P"), (col("l_partkey") % 200).cast("string"))
        .as("product_service"),
      concat(lit("fam"), (col("l_partkey") % 7).cast("string"))
        .as("product_family"),
      when(k % 9 === 0, lit(null).cast("boolean"))
        .otherwise(col("l_linenumber") % 4 === 0).as("is_kit"),
      (k % 97).cast("double").as("margin_amount"))
    val bridge = Tables.lineitem(s, d).select(
      concat(lit("C"), (k % 300).cast("string")).as("customer"),
      concat(lit("corp"), (k % 300 % 40).cast("string"), lit(".com"))
        .as("company_domain_key")).distinct()
    graft.ref.Marts.fctCompanyOrders(lineItems, bridge)
      .select(
        col("company_domain_key"), col("order_number"),
        col("customer_name"),
        col("order_date").cast("string").as("order_date"),
        col("line_count"),
        col("order_amount").cast("double").as("order_amount"),
        col("distinct_products"), col("product_families"),
        col("kit_amount").cast("double").as("kit_amount"),
        col("avg_margin"))
      .orderBy("company_domain_key", "order_number")
  }

  /** P10 — the REAL `Enrichment.staging` transform over a synthesized
    * nested-payload frame shaped like the post-`readJsonl` output
    * (struct column `enrichment_raw_data`, string nulls already
    * smoothed to ''): domain-key lower+trim with blank filtering, the
    * enriched-over-base description COALESCE, the regex-guarded
    * founded_year / employees_count INTEGER casts
    * (stg_quickbooks__company_enrichment.sql:11-51), and date typing.
    * Domains are unique per customer so the final sort is tie-free. */
  val p10EnrichmentStaging: Q = Q.sql(
    "p10_enrichment_staging",
    """WITH raw AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 19 = 0 THEN ''
      |         WHEN c_custkey % 19 = 1 THEN '  '
      |         ELSE '  Corp' || CAST(c_custkey AS VARCHAR) || '.COM  ' END AS company_domain,
      |    CASE WHEN c_custkey % 6 = 0 THEN ''
      |         ELSE 'Company ' || CAST(c_custkey % 400 AS VARCHAR) END AS company_name,
      |    CASE WHEN c_custkey % 2 = 0 THEN 'clearbit' ELSE 'manual' END AS enrichment_source,
      |    CASE WHEN c_custkey % 9 = 0 THEN ''
      |         ELSE '2024-0' || CAST(c_custkey % 9 + 1 AS VARCHAR) || '-15' END AS enrichment_date,
      |    CASE WHEN c_custkey % 5 = 0 THEN ''
      |         ELSE 'Industry ' || CAST(c_custkey % 12 AS VARCHAR) END AS industry,
      |    CASE WHEN c_custkey % 3 = 0 THEN ''
      |         ELSE 'Enriched desc ' || CAST(c_custkey AS VARCHAR) END AS description_enriched,
      |    CASE WHEN c_custkey % 4 = 0 THEN ''
      |         ELSE 'Base desc ' || CAST(c_custkey AS VARCHAR) END AS description,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'unknown'
      |         WHEN c_custkey % 7 = 1 THEN ''
      |         ELSE CAST(1900 + c_custkey % 120 AS VARCHAR) END AS founded_year,
      |    'City ' || CAST(c_custkey % 30 AS VARCHAR) AS hq_city,
      |    CASE WHEN c_custkey % 8 = 0 THEN '' ELSE 'US' END AS hq_country,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'n/a'
      |         ELSE CAST((c_custkey % 5000) * 3 AS VARCHAR) END AS employees_count
      |  FROM customer
      |)
      |SELECT LOWER(TRIM(company_domain)) AS company_domain_key,
      |  NULLIF(TRIM(company_name), '') AS enriched_company_name,
      |  enrichment_source,
      |  CAST(CAST(NULLIF(TRIM(enrichment_date), '') AS DATE) AS VARCHAR) AS enrichment_date,
      |  NULLIF(TRIM(industry), '') AS industry,
      |  COALESCE(NULLIF(TRIM(description_enriched), ''),
      |           NULLIF(TRIM(description), '')) AS description,
      |  CASE WHEN REGEXP_MATCHES(founded_year, '^[0-9]{4}$')
      |       THEN CAST(founded_year AS INTEGER) END AS founded_year,
      |  NULLIF(TRIM(hq_city), '') AS hq_city,
      |  NULLIF(TRIM(hq_country), '') AS hq_country,
      |  CASE WHEN REGEXP_MATCHES(employees_count, '^[0-9]+$')
      |       THEN CAST(employees_count AS INTEGER) END AS employees_count
      |FROM raw
      |WHERE LOWER(TRIM(company_domain)) <> ''
      |ORDER BY company_domain_key""".stripMargin) { (s, d) =>
    val k = col("c_custkey")
    val raw = Tables.customer(s, d).select(
      when(k % 19 === 0, lit(""))
        .when(k % 19 === 1, lit("  "))
        .otherwise(concat(lit("  Corp"), k.cast("string"), lit(".COM  ")))
        .as("company_domain"),
      when(k % 6 === 0, lit(""))
        .otherwise(concat(lit("Company "), (k % 400).cast("string")))
        .as("company_name"),
      when(k % 2 === 0, "clearbit").otherwise("manual")
        .as("enrichment_source"),
      when(k % 9 === 0, lit(""))
        .otherwise(concat(lit("2024-0"), (k % 9 + 1).cast("string"),
          lit("-15"))).as("enrichment_date"),
      struct(
        when(k % 5 === 0, lit(""))
          .otherwise(concat(lit("Industry "), (k % 12).cast("string")))
          .as("industry"),
        when(k % 3 === 0, lit(""))
          .otherwise(concat(lit("Enriched desc "), k.cast("string")))
          .as("description_enriched"),
        when(k % 4 === 0, lit(""))
          .otherwise(concat(lit("Base desc "), k.cast("string")))
          .as("description"),
        when(k % 7 === 0, lit("unknown"))
          .when(k % 7 === 1, lit(""))
          .otherwise((k % 120 + 1900).cast("string")).as("founded_year"),
        concat(lit("City "), (k % 30).cast("string")).as("hq_city"),
        when(k % 8 === 0, lit("")).otherwise(lit("US")).as("hq_country"),
        when(k % 11 === 0, lit("n/a"))
          .otherwise(((k % 5000) * 3).cast("string"))
          .as("employees_count")).as("enrichment_raw_data"))
    Enrichment.staging(raw)
      .withColumn("enrichment_date", col("enrichment_date").cast("string"))
      .orderBy("company_domain_key")
  }

  val all: Seq[Q] = Seq(p4CustomerStaging, p6ItemStaging,
    p13ShopifyCustomers, p16TradeShowStaging, p9MappingStaging,
    a8CompanyOrders, p10EnrichmentStaging)
}
