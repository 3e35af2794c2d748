package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fns

/** Remaining reference-operator families exercised on testdata: the
  * country-normalization macro (P5), the legacy email split/rank
  * pipeline (P7/W8), and JSON_BUILD_OBJECT (§2.7 JSON).
  */
object RefOpQueries {

  /** P5 — normalize_country / country inference. Nation names play the
    * raw country strings; a state code is derived synthetically so the
    * inference branch is exercised too
    * (macros/country_normalization.sql:6-75). */
  val p5Country: Q = Q.sql(
    "p5_country_normalize",
    """WITH src AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'USA'
      |         WHEN c_custkey % 5 = 1 THEN 'ca'
      |         WHEN c_custkey % 5 = 2 THEN ''
      |         WHEN c_custkey % 5 = 3 THEN 'uk'
      |         ELSE 'Germany' END AS country_raw,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'TX'
      |         WHEN c_custkey % 3 = 1 THEN 'ON'
      |         ELSE '' END AS state_raw
      |  FROM customer
      |)
      |SELECT c_custkey, country_raw, state_raw,
      |  CASE WHEN UPPER(TRIM(country_raw)) IN ('USA','US','UNITED STATES','U.S.','U.S.A.') THEN 'United States'
      |       WHEN UPPER(TRIM(country_raw)) IN ('CA','CANADA') THEN 'Canada'
      |       WHEN UPPER(TRIM(country_raw)) IN ('UK','UNITED KINGDOM','GB','GREAT BRITAIN') THEN 'United Kingdom'
      |       WHEN NULLIF(TRIM(country_raw),'') IS NOT NULL
      |            THEN UPPER(LEFT(TRIM(country_raw),1)) || LOWER(SUBSTR(TRIM(country_raw),2))
      |       WHEN UPPER(TRIM(state_raw)) IN ('AL','AK','AZ','AR','CA','CO','CT','DE','FL','GA','HI','ID','IL','IN','IA','KS','KY','LA','ME','MD','MA','MI','MN','MS','MO','MT','NE','NV','NH','NJ','NM','NY','NC','ND','OH','OK','OR','PA','RI','SC','SD','TN','TX','UT','VT','VA','WA','WV','WI','WY','DC','PR','VI','GU','AS','MP','AA','AE') THEN 'United States'
      |       WHEN UPPER(TRIM(state_raw)) IN ('AB','BC','MB','NB','NL','NS','NT','NU','ON','PE','QC','SK','YT') THEN 'Canada'
      |       ELSE 'United States' END AS normalized_country
      |FROM src ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val src = Tables.customer(s, d).select(
      col("c_custkey"),
      when(col("c_custkey") % 5 === 0, "USA")
        .when(col("c_custkey") % 5 === 1, "ca")
        .when(col("c_custkey") % 5 === 2, "")
        .when(col("c_custkey") % 5 === 3, "uk")
        .otherwise("Germany").as("country_raw"),
      when(col("c_custkey") % 3 === 0, "TX")
        .when(col("c_custkey") % 3 === 1, "ON")
        .otherwise("").as("state_raw"))
    src.withColumn("normalized_country",
      Fns.normalizeCountry(col("country_raw"), col("state_raw")))
      .orderBy("c_custkey")
  }

  /** P7/W8 — legacy email split + contact extraction: `;`-lists split
    * with ordinality, rank-1 per (customer, email), derived display
    * name, marketplace filter, surrogate key
    * (stg_quickbooks__customer_contacts.sql:16-337). Emails constructed
    * deterministically from customer attributes so both engines see
    * identical input. */
  val p7EmailSplit: Q = Q.sql(
    "p7_email_split_rank",
    """WITH src AS (
      |  SELECT c_custkey,
      |    lower(replace(c_name, ' ', '')) || '@corp.com;' ||
      |      lower(c_mktsegment) || '.team@corp.com' ||
      |      CASE WHEN c_custkey % 7 = 0 THEN ';seller@marketplace.amazon.com' ELSE '' END
      |      AS email_list
      |  FROM customer
      |), split AS (
      |  SELECT c_custkey,
      |    unnest(string_split(email_list, ';')) AS email,
      |    unnest(generate_series(1, len(string_split(email_list, ';')))) AS email_position
      |  FROM src
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, lower(email)
      |    ORDER BY email_position) AS rn
      |  FROM split
      |  WHERE email NOT LIKE '%@marketplace.amazon.com'
      |)
      |SELECT c_custkey, email, email_position,
      |  UPPER(LEFT(COALESCE(SPLIT_PART(SPLIT_PART(email, '@', 1), '.', 1), ''), 1))
      |    || LOWER(SUBSTR(COALESCE(SPLIT_PART(SPLIT_PART(email, '@', 1), '.', 1), ''), 2)) AS derived_name,
      |  MD5(CONCAT_WS('-',
      |    COALESCE(CAST(c_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    COALESCE(CAST(email AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    COALESCE(CAST(email_position AS VARCHAR), '_dbt_utils_surrogate_key_null_')))
      |    AS contact_key
      |FROM ranked WHERE rn = 1
      |ORDER BY c_custkey, email_position""".stripMargin) { (s, d) =>
    val src = Tables.customer(s, d).select(
      col("c_custkey"),
      concat(
        lower(regexp_replace(col("c_name"), " ", "")), lit("@corp.com;"),
        lower(col("c_mktsegment")), lit(".team@corp.com"),
        when(col("c_custkey") % 7 === 0,
          ";seller@marketplace.amazon.com").otherwise(""))
        .as("email_list"))
    val split0 = src.select(col("c_custkey"),
      posexplode(org.apache.spark.sql.functions.split(col("email_list"), ";"))
        .as(Seq("pos0", "email")))
      .select(col("c_custkey"), col("email"),
        (col("pos0") + 1).as("email_position"))
      .filter(!col("email").endsWith("@marketplace.amazon.com"))
    val w = Window.partitionBy(col("c_custkey"), lower(col("email")))
      .orderBy(col("email_position"))
    split0.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("email"), col("email_position"),
        initcap(Fns.splitPart(Fns.splitPart(col("email"), "@", 1), ".", 1))
          .as("derived_name"),
        Fns.surrogateKey(col("c_custkey"), col("email"),
          col("email_position")).as("contact_key"))
      .orderBy("c_custkey", "email_position")
  }

  /** §2.7 JSON — JSON_BUILD_OBJECT → to_json(struct(...)); values are
    * string-cast so number rendering can't diverge between engines;
    * ignoreNullFields=false matches PG/DuckDB null emission
    * (dim_customer_contacts.sql:64-69). */
  val fJsonBuild: Q = Q.sql(
    "f_json_build_object",
    """SELECT c_custkey,
      |  CAST(to_json(struct_pack(
      |    name := c_name,
      |    segment := c_mktsegment,
      |    balance := CAST(c_acctbal AS VARCHAR),
      |    nation := CAST(c_nationkey AS VARCHAR))) AS VARCHAR) AS contact_json
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      to_json(struct(
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").cast("string").as("balance"),
        col("c_nationkey").cast("string").as("nation")),
        Map("ignoreNullFields" -> "false")).as("contact_json"))
      .orderBy("c_custkey")
  }

  /** P8 + fixed contact pipeline — the email-parsing →
    * name-enrichment → quality-scoring chain (int_contact_email_parsing
    * → int_contact_name_enrichment → int_contact_quality_scoring)
    * over contacts synthesized from customer attributes. Proves the
    * score ∈ [0,100] battery columns, the classification CASEs, and the
    * position-free stable email_contact_id
    * (tests/test_contact_pipeline_data_integrity.sql:7-67). */
  /** Shared synthesized clean-contacts frame for the fixed-pipeline
    * chain oracles (p8 + p8b). */
  private[queries] def contactSrc(s: org.apache.spark.sql.SparkSession,
                                  d: String) = {
    val k = col("c_custkey")
    Tables.customer(s, d).select(
      k.cast("string").as("customer_id"),
      col("c_name").as("customer_name"),
      lit(null).cast("string").as("company_name"),
      concat(
        lower(regexp_replace(col("c_name"), " ", "")), lit("@corp.com;"),
        lower(col("c_mktsegment")), lit(".team@corp.com"),
        when(k % 7 === 0, ";seller@marketplace.amazon.com").otherwise(""))
        .as("main_email"),
      when(k % 3 === 0,
        concat(lit("cc."), lower(col("c_mktsegment")), lit("@corp.com")))
        .as("cc_email"),
      when(k % 2 === 0, "Pat").as("first_name"),
      when(k % 4 === 2, "Lee").as("last_name"),
      when(k % 10 === 0, "Dr").as("name_title"),
      when(k % 5 === 0, "Buyer").as("job_title"),
      when(k % 3 =!= 0,
        concat(lit("555-"), (k % 10000).cast("string"))).as("main_phone"),
      lit(null).cast("string").as("alt_phone"),
      lit(null).cast("string").as("work_phone"),
      lit(null).cast("string").as("mobile_phone"),
      lit(null).cast("string").as("fax"),
      when(k % 2 === 1,
        concat(col("c_nationkey").cast("string"), lit(" Main St")))
        .as("billing_address_line_1"),
      lit(null).cast("string").as("billing_address_city"),
      lit(null).cast("string").as("billing_address_state"),
      lit(null).cast("string").as("billing_address_postal_code"),
      lit(null).cast("string").as("customer_type"),
      col("c_acctbal").as("current_balance"),
      when(k % 7 =!= 0, "Active").as("customer_status"),
      lit(null).cast("date").as("created_date"),
      k.as("ck"))
  }

  val p8ContactScoring: Q = {
    import graft.ref.ContactsFixed
    Q.sql(
      "p8_contact_quality_scoring",
      """WITH src AS (
        |  SELECT c_custkey,
        |    lower(replace(c_name, ' ', '')) || '@corp.com;' ||
        |      lower(c_mktsegment) || '.team@corp.com' ||
        |      CASE WHEN c_custkey % 7 = 0 THEN ';seller@marketplace.amazon.com' ELSE '' END
        |      AS main_email,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'cc.' || lower(c_mktsegment) || '@corp.com' END AS cc_email,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'Pat' END AS first_name,
        |    CASE WHEN c_custkey % 4 = 2 THEN 'Lee' END AS last_name,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'Dr' END AS name_title,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'Buyer' END AS job_title,
        |    CASE WHEN c_custkey % 3 <> 0 THEN '555-' || CAST(c_custkey % 10000 AS VARCHAR) END AS main_phone,
        |    CASE WHEN c_custkey % 2 = 1 THEN CAST(c_nationkey AS VARCHAR) || ' Main St' END AS billing_address_line_1,
        |    c_acctbal AS current_balance,
        |    CASE WHEN c_custkey % 7 <> 0 THEN 'Active' END AS customer_status
        |  FROM customer
        |), mainx AS (
        |  -- Position is compacted AFTER the blank-segment filter (mirrors
        |  -- the model's ROW_NUMBER-after-WHERE; raw unnest ordinality would
        |  -- diverge on inputs like ';a@x.com').
        |  SELECT * EXCLUDE (e, pos), trim(e) AS individual_email,
        |    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY pos) AS email_position,
        |    'main' AS email_source
        |  FROM (SELECT *, unnest(string_split(main_email, ';')) AS e,
        |        unnest(generate_series(1, len(string_split(main_email, ';')))) AS pos
        |        FROM src) s
        |  WHERE trim(e) != ''
        |), ccx AS (
        |  SELECT * EXCLUDE (e, pos), trim(e) AS individual_email,
        |    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY pos) AS email_position,
        |    'cc' AS email_source
        |  FROM (SELECT *, unnest(string_split(coalesce(cc_email, ''), ';')) AS e,
        |        unnest(generate_series(1, len(string_split(coalesce(cc_email, ''), ';')))) AS pos
        |        FROM src) s
        |  WHERE trim(e) != ''
        |), allx AS (
        |  SELECT * FROM mainx UNION ALL SELECT * FROM ccx
        |), valid AS (
        |  SELECT * FROM allx
        |  WHERE individual_email LIKE '%@%'
        |    AND SPLIT_PART(individual_email, '@', 2) != ''
        |    AND SPLIT_PART(individual_email, '@', 1) != ''
        |    AND NOT lower(individual_email) LIKE '%@marketplace.amazon.com'
        |), deduped AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY c_custkey, lower(individual_email)
        |    ORDER BY CASE WHEN email_source = 'main' THEN 1 ELSE 2 END,
        |             email_position) AS r
        |  FROM valid
        |), contacts AS (
        |  SELECT *,
        |    CASE WHEN email_source = 'main' AND email_position = 1 THEN 'primary'
        |         WHEN email_source = 'main' THEN 'additional_main'
        |         ELSE 'cc' END AS contact_priority,
        |    MD5(CONCAT_WS('-',
        |      COALESCE(CAST(c_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
        |      COALESCE(individual_email, '_dbt_utils_surrogate_key_null_'),
        |      COALESCE(email_source, '_dbt_utils_surrogate_key_null_'))) AS email_contact_id,
        |    SPLIT_PART(SPLIT_PART(individual_email, '@', 1), '.', 1) AS tok1,
        |    SPLIT_PART(SPLIT_PART(individual_email, '@', 1), '.', 2) AS tok2
        |  FROM deduped WHERE r = 1
        |), named AS (
        |  SELECT *,
        |    CASE WHEN contact_priority = 'primary' AND first_name IS NOT NULL THEN first_name
        |         WHEN tok1 != '' THEN UPPER(LEFT(tok1, 1)) || LOWER(SUBSTR(tok1, 2)) END AS dfirst,
        |    CASE WHEN contact_priority = 'primary' AND last_name IS NOT NULL THEN last_name
        |         WHEN tok2 != '' THEN UPPER(LEFT(tok2, 1)) || LOWER(SUBSTR(tok2, 2)) END AS dlast
        |  FROM contacts
        |), named2 AS (
        |  SELECT *,
        |    CASE WHEN dfirst IS NOT NULL AND dlast IS NOT NULL THEN trim(dfirst || ' ' || dlast)
        |         WHEN dfirst IS NOT NULL THEN dfirst
        |         WHEN dlast IS NOT NULL THEN dlast END AS full_name,
        |    CASE WHEN contact_priority = 'primary' AND first_name IS NOT NULL AND last_name IS NOT NULL THEN 'original_complete'
        |         WHEN contact_priority = 'primary' AND (first_name IS NOT NULL OR last_name IS NOT NULL) THEN 'original_partial'
        |         WHEN tok2 != '' THEN 'email_derived_complete'
        |         WHEN tok1 != '' THEN 'email_derived_partial'
        |         ELSE 'minimal' END AS name_quality,
        |    CASE WHEN contact_priority = 'primary' AND (first_name IS NOT NULL OR last_name IS NOT NULL) THEN 'quickbooks_original'
        |         WHEN tok1 != '' THEN 'email_derived' ELSE 'none' END AS name_source,
        |    CASE WHEN contact_priority = 'primary' THEN main_phone END AS p_phone,
        |    CASE WHEN contact_priority = 'primary' THEN billing_address_line_1 END AS p_addr
        |  FROM named
        |), scored AS (
        |  SELECT *,
        |    CAST(25 +
        |      CASE WHEN full_name IS NOT NULL THEN 20 ELSE 0 END +
        |      CASE WHEN p_phone IS NOT NULL THEN 15 ELSE 0 END +
        |      CASE WHEN job_title IS NOT NULL THEN 10 ELSE 0 END +
        |      CASE WHEN p_addr IS NOT NULL THEN 10 ELSE 0 END +
        |      CASE WHEN name_quality IN ('original_complete', 'email_derived_complete') THEN 10 ELSE 5 END +
        |      CASE WHEN name_title IS NOT NULL THEN 5 ELSE 0 END AS INTEGER) AS completeness_score
        |  FROM named2
        |)
        |SELECT c_custkey AS customer_id, individual_email, email_source,
        |  email_position, contact_priority, full_name, name_quality,
        |  name_source, completeness_score,
        |  CASE WHEN completeness_score >= 75 THEN 'complete'
        |       WHEN completeness_score >= 50 THEN 'good'
        |       WHEN completeness_score >= 25 THEN 'partial'
        |       ELSE 'minimal' END AS contact_data_quality,
        |  CASE WHEN contact_priority = 'primary' AND completeness_score >= 75 THEN 'high_value_contact'
        |       WHEN completeness_score >= 75 THEN 'complete_contact'
        |       WHEN completeness_score >= 50 THEN 'email_contact'
        |       WHEN p_phone IS NOT NULL AND completeness_score >= 40 THEN 'phone_contact'
        |       ELSE 'basic_contact' END AS contact_tier,
        |  'email' AS primary_contact_method,
        |  customer_status IS NOT NULL AS email_marketable,
        |  CASE WHEN contact_priority = 'primary' AND completeness_score >= 75 AND current_balance > 1000 THEN 'high_engagement'
        |       WHEN completeness_score >= 60 THEN 'medium_engagement'
        |       WHEN completeness_score >= 40 THEN 'low_engagement'
        |       ELSE 'minimal_engagement' END AS engagement_potential,
        |  email_contact_id
        |FROM scored
        |ORDER BY customer_id, individual_email""".stripMargin) { (s, d) =>
      val src = contactSrc(s, d)
      val scored = ContactsFixed.qualityScoring(
        ContactsFixed.nameEnrichment(ContactsFixed.emailParsing(src)))
      scored.select(
        col("ck").as("customer_id"),
        col("individual_email"), col("email_source"), col("email_position"),
        col("contact_priority"), col("full_name"), col("name_quality"),
        col("name_source"), col("completeness_score"),
        col("contact_data_quality"), col("contact_tier"),
        col("primary_contact_method"), col("email_marketable"),
        col("engagement_potential"), col("email_contact_id"))
        .orderBy("customer_id", "individual_email")
    }
  }

  /** P8b — the FIXED person-mapping layer on top of the scored
    * contacts (int_customer_person_mapping_fixed →
    * dim_customer_contacts_fixed): cross-customer case-insensitive
    * email dedup keeping the best representative, per-company contact
    * ranking, stable person/dim surrogate keys, company-context
    * enrichment. customer%300 plays the consolidated company, so the
    * shared team/cc addresses exercise the cross-customer dedup. */
  val p8bPersonMappingFixed: Q = {
    import graft.ref.ContactsFixed
    val base = p8ContactScoring.oracle.get.split("\nSELECT c_custkey")(0)
    Q.sql(
      "p8b_person_mapping_fixed",
      s"""$base, withco AS (
        |  SELECT *, 'co' || CAST(c_custkey % 300 AS VARCHAR) AS company_domain_key
        |  FROM scored
        |  WHERE individual_email IS NOT NULL
        |), emaildedup AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY lower(individual_email)
        |    ORDER BY completeness_score DESC,
        |      CASE contact_priority WHEN 'primary' THEN 1
        |           WHEN 'additional_main' THEN 2 ELSE 3 END,
        |      current_balance DESC NULLS LAST,
        |      CAST(c_custkey AS VARCHAR),
        |      email_source) AS er
        |  FROM withco
        |), uniq AS (
        |  SELECT * FROM emaildedup WHERE er = 1
        |), ranked AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY company_domain_key
        |      ORDER BY completeness_score DESC,
        |        CASE WHEN contact_priority = 'primary' THEN 1 ELSE 2 END,
        |        current_balance DESC NULLS LAST,
        |        CAST(c_custkey AS VARCHAR),
        |        lower(individual_email)) AS company_contact_rank,
        |    COUNT(*) OVER (PARTITION BY company_domain_key) AS total_company_contacts
        |  FROM uniq
        |), consol AS (
        |  SELECT 'co' || CAST(c_custkey % 300 AS VARCHAR) AS company_domain_key,
        |    CAST(SUM(CAST((current_balance) AS DECIMAL(38,6))) AS DOUBLE) AS company_total_revenue
        |  FROM src GROUP BY 1
        |)
        |SELECT
        |  MD5(CONCAT_WS('-', email_contact_id, r.company_domain_key)) AS person_company_id,
        |  email_contact_id AS person_id,
        |  r.company_domain_key,
        |  individual_email AS primary_email,
        |  full_name AS person_name,
        |  CASE WHEN completeness_score >= 75 THEN 'primary_contact'
        |       WHEN completeness_score >= 50 THEN 'secondary_contact'
        |       ELSE 'email_contact' END AS contact_role,
        |  company_contact_rank, total_company_contacts,
        |  company_contact_rank = 1 AS is_primary_company_contact,
        |  total_company_contacts > 1 AS company_has_multiple_contacts,
        |  completeness_score,
        |  MD5(CONCAT_WS('-',
        |    COALESCE(email_contact_id, '_dbt_utils_surrogate_key_null_'),
        |    COALESCE(full_name, '_dbt_utils_surrogate_key_null_'),
        |    COALESCE(individual_email, '_dbt_utils_surrogate_key_null_'),
        |    COALESCE(r.company_domain_key, '_dbt_utils_surrogate_key_null_')))
        |    AS contact_dim_key,
        |  'Co ' || SUBSTR(r.company_domain_key, 3) AS company_name,
        |  c.company_total_revenue
        |FROM ranked r JOIN consol c USING (company_domain_key)
        |ORDER BY company_domain_key, company_contact_rank""".stripMargin) {
      (s, d) =>
      val src = contactSrc(s, d)
      val quality = ContactsFixed.qualityScoring(
        ContactsFixed.nameEnrichment(ContactsFixed.emailParsing(src)))
      val companyMapping = src.select(col("customer_id"),
        concat(lit("co"), (col("ck") % 300).cast("string"))
          .as("company_domain_key"))
      val consolidation = src
        .groupBy(concat(lit("co"), (col("ck") % 300).cast("string"))
          .as("company_domain_key"))
        .agg(graft.functions.Det.dsum(col("current_balance"))
          .as("total_revenue"))
        .withColumn("company_name",
          concat(lit("Co "), expr("substr(company_domain_key, 3)")))
        .withColumn("primary_country", lit("United States"))
      val dim = ContactsFixed.dimCustomerContactsFixed(
        ContactsFixed.personMappingFixed(quality, companyMapping),
        consolidation)
      dim.select(
        col("person_company_id"), col("person_id"),
        col("company_domain_key"), col("primary_email"),
        col("person_name"), col("contact_role"),
        col("company_contact_rank"), col("total_company_contacts"),
        col("is_primary_company_contact"),
        col("company_has_multiple_contacts"), col("completeness_score"),
        col("contact_dim_key"), col("company_name"),
        col("company_total_revenue"))
        .orderBy("company_domain_key", "company_contact_rank")
    }
  }

  /** P14 — Shopify products ⋈ variants through the actual
    * `Shopify.products` model (stg_shopify__products.sql:12-52): active
    * parents only, SKU'd children only, INNER join on the DLT parent
    * id. part plays the product catalog, lineitem plays the variant
    * child rows. */
  val p14ProductsVariants: Q = Q.sql(
    "p14_shopify_products_variants",
    """WITH p AS (
      |  SELECT p_partkey AS product_id, p_name AS product_title,
      |    p_brand AS vendor, p_type AS product_type,
      |    'active' AS product_status, p_brand AS tags,
      |    'pd' || CAST(p_partkey AS VARCHAR) AS dlt
      |  FROM part WHERE p_size % 3 <> 0
      |), v AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS variant_id,
      |    'v' || CAST(l_linenumber AS VARCHAR) AS variant_title,
      |    CASE WHEN l_linenumber = 7 THEN ''
      |         ELSE 'SKU-' || CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR)
      |         END AS sku,
      |    l_extendedprice AS variant_price,
      |    l_quantity AS inventory_quantity,
      |    'pd' || CAST(l_partkey AS VARCHAR) AS dlt
      |  FROM lineitem
      |)
      |SELECT product_id, product_title, vendor, product_type,
      |  product_status, tags, variant_id, variant_title, sku,
      |  variant_price, inventory_quantity
      |FROM v JOIN p USING (dlt)
      |WHERE sku != ''
      |ORDER BY variant_id""".stripMargin) { (s, d) =>
    import graft.ref.Shopify
    val rawProducts = Tables.part(s, d).select(
      col("p_partkey").as("id"),
      col("p_name").as("title"),
      col("p_brand").as("vendor"),
      col("p_type").as("product_type"),
      when(col("p_size") % 3 =!= 0, "active").otherwise("archived")
        .as("status"),
      col("p_brand").as("tags"),
      lit(null).cast("string").as("created_at"),
      lit(null).cast("string").as("updated_at"),
      concat(lit("pd"), col("p_partkey").cast("string")).as("_dlt_id"))
    val rawVariants = Tables.lineitem(s, d).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
      concat(lit("v"), col("l_linenumber").cast("string")).as("title"),
      when(col("l_linenumber") === 7, "")
        .otherwise(concat(lit("SKU-"), col("l_partkey").cast("string"),
          lit("-"), col("l_suppkey").cast("string"))).as("sku"),
      col("l_extendedprice").as("price"),
      col("l_quantity").as("inventory_quantity"),
      concat(lit("pd"), col("l_partkey").cast("string"))
        .as("_dlt_parent_id"))
    Shopify.products(rawProducts, rawVariants)
      .orderBy("variant_id")
  }

  val all: Seq[Q] = Seq(p5Country, p7EmailSplit, p8ContactScoring,
    p8bPersonMappingFixed, p14ProductsVariants, fJsonBuild)
}
