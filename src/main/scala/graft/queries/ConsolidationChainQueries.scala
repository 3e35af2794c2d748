package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det._

/** Model-driven oracle for the company-identity spine: raw customers
  * (synthesized from the customer table with gmail / marketplace /
  * fastenal / corporate domain varieties and suffix-bearing names)
  * pushed through the REAL chain — `DomainConsolidation.buildDomainMapping`
  * + `buildCustomerNameMapping` → `Staging.customers/domainMapping/
  * customerNameMapping` → `Intermediate.customerCompanyMapping` (J1/J2
  * broadcast joins + key preference) → `customerRevenue` (J3) →
  * `companyConsolidation` (W2 representative window, A3 sorted
  * STRING_AGG, A4 deterministic MODE country, size/revenue categories).
  */
object ConsolidationChainQueries {

  val j3ConsolidationChain: Q = Q.sql(
    "j3_consolidation_chain",
    s"""WITH rawc AS (
      |  SELECT 'C' || CAST(c_custkey AS VARCHAR) AS customer_id,
      |    CASE WHEN c_custkey % 6 = 0 THEN c_name || ' End User'
      |         ELSE c_name END AS customer_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'u' || CAST(c_custkey AS VARCHAR) || '@gmail.com'
      |         WHEN c_custkey % 13 = 0 THEN 'u' || CAST(c_custkey AS VARCHAR) || '@marketplace.amazon.com'
      |         WHEN c_custkey % 17 = 0 THEN 'u' || CAST(c_custkey AS VARCHAR) || '@stores.fastenal.com'
      |         ELSE 'u' || CAST(c_custkey AS VARCHAR) || '@dom' || CAST(c_custkey % 300 AS VARCHAR) || '.com'
      |         END AS main_email,
      |    CASE WHEN c_custkey % 5 = 0
      |         THEN 'cc@corpalt' || CAST(c_custkey % 100 AS VARCHAR) || '.com'
      |         ELSE '' END AS cc_email,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'TX'
      |         WHEN c_custkey % 3 = 1 THEN 'ON' ELSE '' END AS b_state,
      |    c_acctbal AS current_balance
      |  FROM customer
      |), dm AS (
      |  SELECT original_domain,
      |    CASE WHEN original_domain = 'marketplace.amazon.com' THEN 'SKIP_AMAZON_MARKETPLACE'
      |         WHEN original_domain IN ('gmail.com','yahoo.com','hotmail.com','outlook.com','aol.com')
      |           THEN 'INDIVIDUAL_' || UPPER(original_domain)
      |         WHEN original_domain LIKE '%fastenal.com%' THEN 'fastenal.com'
      |         ELSE original_domain END AS normalized_domain
      |  FROM (
      |    SELECT DISTINCT lower(NULLIF(SPLIT_PART(SPLIT_PART(main_email, ';', 1), '@', 2), '')) AS original_domain FROM rawc
      |    UNION
      |    SELECT DISTINCT lower(NULLIF(SPLIT_PART(SPLIT_PART(cc_email, ';', 1), '@', 2), '')) FROM rawc
      |  ) WHERE original_domain IS NOT NULL
      |), dm2 AS (
      |  SELECT *,
      |    CASE WHEN normalized_domain = 'SKIP_AMAZON_MARKETPLACE' THEN 'skip'
      |         WHEN normalized_domain LIKE 'INDIVIDUAL\\_%' ESCAPE '\\' THEN 'individual'
      |         ELSE 'corporate' END AS domain_type
      |  FROM dm
      |), nm AS (
      |  SELECT original_name,
      |    trim(regexp_replace(regexp_replace(
      |      regexp_replace(trim(original_name), '(?i)[,\\s]*(end\\s+user|customer|client)\\s*$$', ''),
      |      '\\s+', ' ', 'g'), '[,\\s]+$$', '')) AS normalized_name
      |  FROM (SELECT DISTINCT customer_name AS original_name FROM rawc)
      |), stg AS (
      |  SELECT customer_id, customer_name,
      |    customer_name AS normalized_customer_name,
      |    lower(NULLIF(SPLIT_PART(SPLIT_PART(main_email, ';', 1), '@', 2), '')) AS main_domain,
      |    lower(NULLIF(SPLIT_PART(SPLIT_PART(cc_email, ';', 1), '@', 2), '')) AS cc_domain,
      |    CASE WHEN UPPER(TRIM(b_state)) IN ('TX') THEN 'United States'
      |         WHEN UPPER(TRIM(b_state)) IN ('ON') THEN 'Canada'
      |         ELSE 'United States' END AS billing_country,
      |    current_balance
      |  FROM rawc
      |), mapping AS (
      |  SELECT s.*,
      |    md.normalized_domain AS main_normalized,
      |    md.domain_type AS main_domain_type,
      |    cd.normalized_domain AS cc_normalized,
      |    n.normalized_name,
      |    CASE WHEN md.normalized_domain IS NOT NULL AND md.domain_type = 'corporate'
      |           THEN md.normalized_domain
      |         WHEN cd.normalized_domain IS NOT NULL THEN cd.normalized_domain
      |         ELSE COALESCE(n.normalized_name, s.normalized_customer_name)
      |         END AS company_domain_key
      |  FROM stg s
      |  LEFT JOIN dm2 md ON md.original_domain = s.main_domain
      |  LEFT JOIN dm2 cd ON cd.original_domain = s.cc_domain
      |  LEFT JOIN nm n ON n.original_name = s.customer_name
      |), revenue AS (
      |  SELECT CASE WHEN c.c_custkey % 6 = 0 THEN c.c_name || ' End User'
      |              ELSE c.c_name END AS rev_customer_name,
      |    ${sqlDsum("o.o_totalprice")} AS total_revenue,
      |    COUNT(DISTINCT o.o_orderkey) AS order_count
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1
      |), withrev AS (
      |  SELECT m.*, r.total_revenue, r.order_count
      |  FROM mapping m
      |  LEFT JOIN revenue r ON r.rev_customer_name = m.customer_name
      |), rep AS (
      |  SELECT *,
      |    FIRST_VALUE(normalized_customer_name) OVER w AS company_name,
      |    FIRST_VALUE(customer_id) OVER w AS rep_customer_id
      |  FROM withrev
      |  WINDOW w AS (PARTITION BY company_domain_key
      |    ORDER BY LENGTH(normalized_customer_name) DESC,
      |             current_balance DESC NULLS LAST, customer_id
      |    ROWS UNBOUNDED PRECEDING)
      |), aggs AS (
      |  SELECT company_domain_key,
      |    MAX(company_name) AS company_name,
      |    MAX(rep_customer_id) AS rep_customer_id,
      |    COUNT(*) AS customer_count,
      |    COUNT(DISTINCT customer_id) AS distinct_customer_count,
      |    ${sqlDsum("current_balance")} AS total_balance,
      |    ${sqlDsum("COALESCE(total_revenue, 0.0)")} AS total_revenue,
      |    CAST(SUM(COALESCE(order_count, 0)) AS BIGINT) AS total_orders,
      |    substr(string_agg(DISTINCT normalized_customer_name, ' | '
      |      ORDER BY normalized_customer_name), 1, 500) AS all_customer_names
      |  FROM rep GROUP BY company_domain_key
      |), mode_country AS (
      |  SELECT company_domain_key, billing_country AS primary_country
      |  FROM (SELECT company_domain_key, billing_country, COUNT(*) AS n
      |        FROM rep WHERE billing_country IS NOT NULL
      |        GROUP BY 1, 2) t
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY company_domain_key
      |    ORDER BY n DESC, billing_country) = 1
      |)
      |SELECT a.company_domain_key, a.company_name, a.rep_customer_id,
      |  a.customer_count, a.distinct_customer_count, a.total_balance,
      |  a.total_revenue, a.total_orders, a.all_customer_names,
      |  mc.primary_country,
      |  CASE WHEN a.company_domain_key = 'SKIP_AMAZON_MARKETPLACE' THEN 'skip'
      |       WHEN a.company_domain_key LIKE 'INDIVIDUAL\\_%' ESCAPE '\\' THEN 'individual'
      |       ELSE 'corporate' END AS domain_type,
      |  CASE WHEN a.company_domain_key LIKE 'INDIVIDUAL\\_%' ESCAPE '\\' THEN 'Individual Customer'
      |       WHEN a.customer_count = 1 THEN 'Single Location'
      |       WHEN a.customer_count BETWEEN 2 AND 5 THEN 'Small Multi-Location'
      |       WHEN a.customer_count BETWEEN 6 AND 20 THEN 'Medium Multi-Location'
      |       ELSE 'Large Multi-Location' END AS business_size_category,
      |  CASE WHEN a.total_revenue >= 100000 THEN 'High Value ($$100K+)'
      |       WHEN a.total_revenue >= 25000 THEN 'Medium Value ($$25K-$$100K)'
      |       WHEN a.total_revenue >= 5000 THEN 'Growing Value ($$5K-$$25K)'
      |       WHEN a.total_revenue > 0 THEN 'Low Value (<$$5K)'
      |       ELSE 'No Revenue' END AS revenue_category,
      |  a.total_revenue > 0 AS has_revenue,
      |  a.customer_count > 1 AS is_multi_location
      |FROM aggs a
      |LEFT JOIN mode_country mc USING (company_domain_key)
      |ORDER BY a.company_domain_key""".stripMargin) { (s, d) =>
      import graft.ref.{DomainConsolidation, Staging, Intermediate}
      val k = col("c_custkey")
      val raw = Tables.customer(s, d).select(
        concat(lit("C"), k.cast("string")).as("quick_books_internal_id"),
        when(k % 6 === 0, concat(col("c_name"), lit(" End User")))
          .otherwise(col("c_name")).as("customer_name"),
        lit("").as("company_name"),
        concat(lit("u"), k.cast("string"),
          when(k % 7 === 0, "@gmail.com")
            .when(k % 13 === 0, "@marketplace.amazon.com")
            .when(k % 17 === 0, "@stores.fastenal.com")
            .otherwise(concat(lit("@dom"), (k % 300).cast("string"),
              lit(".com")))).as("main_email"),
        when(k % 5 === 0,
          concat(lit("cc@corpalt"), (k % 100).cast("string"), lit(".com")))
          .otherwise("").as("cc_email"),
        lit("").as("billing_address_city"),
        when(k % 3 === 0, "TX").when(k % 3 === 1, "ON").otherwise("")
          .as("billing_address_state"),
        lit("").as("billing_address_country"),
        lit("").as("sales_rep"),
        lit("Net 30").as("terms"),
        col("c_acctbal").as("current_balance"),
        lit("2023-01-01").as("created_date"))
      val dm = Staging.domainMapping(
        DomainConsolidation.buildDomainMapping(raw,
          Seq("gmail.com", "yahoo.com", "hotmail.com", "outlook.com",
            "aol.com")))
      val nm = Staging.customerNameMapping(
        DomainConsolidation.buildCustomerNameMapping(raw, Map.empty))
      val stg = Staging.customers(raw)
      val mapping = Intermediate.customerCompanyMapping(stg, dm, nm)
      // Revenue keyed by the RAW display name, like the reference's
      // orders (J3 joins mapping by customer name).
      val custNames = Tables.customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 6 === 0,
          concat(col("c_name"), lit(" End User")))
          .otherwise(col("c_name")).as("customer"))
      val revenue = Tables.orders(s, d)
        .join(broadcast(custNames),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("customer"))
        .agg(dsum(col("o_totalprice")).as("total_revenue"),
          countDistinct(col("o_orderkey")).as("order_count"),
          lit(null).cast("date").as("first_order_date"),
          lit(null).cast("date").as("last_order_date"))
      val consolidated = Intermediate.companyConsolidation(mapping, revenue)
      consolidated.select(
        col("company_domain_key"), col("company_name"),
        col("rep_customer_id"), col("customer_count"),
        col("distinct_customer_count"), col("total_balance"),
        col("total_revenue"), col("total_orders"),
        col("all_customer_names"), col("primary_country"),
        col("domain_type"), col("business_size_category"),
        col("revenue_category"), col("has_revenue"),
        col("is_multi_location"))
        .orderBy("company_domain_key")
    }

  /** AR aging through the real `Marts.arAging` model: injected as-of
    * date, aging buckets, and the three-level UNION ALL summary (A15)
    * over orders with open/paid statuses synthesized from the orders
    * table. */
  val a15ArAgingChain: Q = Q.sql(
    "a15_ar_aging_chain",
    s"""WITH o AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS order_number,
      |    'C' || CAST(o_custkey AS VARCHAR) AS customer,
      |    CAST(o_orderdate AS DATE) AS order_date,
      |    o_totalprice AS order_amount,
      |    CASE WHEN o_orderstatus = 'O' THEN 'OPEN' ELSE 'PAID' END AS order_status
      |  FROM orders
      |), open_o AS (
      |  SELECT *,
      |    DATE '2001-08-01' - order_date AS days_outstanding,
      |    CASE WHEN DATE '2001-08-01' - order_date <= 30 THEN '0-30'
      |         WHEN DATE '2001-08-01' - order_date <= 60 THEN '31-60'
      |         WHEN DATE '2001-08-01' - order_date <= 90 THEN '61-90'
      |         ELSE '90+' END AS aging_bucket
      |  FROM o WHERE order_status = 'OPEN'
      |), detail AS (
      |  SELECT 'invoice' AS analysis_level, order_number AS entity_key,
      |    customer, aging_bucket, order_amount AS amount,
      |    days_outstanding, CAST(NULL AS BIGINT) AS invoice_count
      |  FROM open_o
      |), by_customer AS (
      |  SELECT 'customer' AS analysis_level, customer AS entity_key,
      |    CAST(NULL AS VARCHAR) AS customer, CAST(NULL AS VARCHAR) AS aging_bucket,
      |    ${sqlDsum("order_amount")} AS amount,
      |    MAX(days_outstanding) AS days_outstanding,
      |    CAST(NULL AS BIGINT) AS invoice_count
      |  FROM open_o GROUP BY open_o.customer
      |), by_bucket AS (
      |  SELECT 'bucket' AS analysis_level, CAST(NULL AS VARCHAR) AS entity_key,
      |    CAST(NULL AS VARCHAR) AS customer, aging_bucket,
      |    ${sqlDsum("order_amount")} AS amount,
      |    CAST(NULL AS INTEGER) AS days_outstanding,
      |    COUNT(*) AS invoice_count
      |  FROM open_o GROUP BY aging_bucket
      |)
      |SELECT * FROM (
      |  SELECT * FROM detail
      |  UNION ALL SELECT * FROM by_customer
      |  UNION ALL SELECT * FROM by_bucket
      |) ORDER BY analysis_level, entity_key, aging_bucket""".stripMargin) {
    (s, d) =>
    import graft.ref.Marts
    val orders = Tables.orders(s, d).select(
      col("o_orderkey").cast("string").as("order_number"),
      concat(lit("C"), col("o_custkey").cast("string")).as("customer"),
      col("o_orderdate").cast("date").as("order_date"),
      col("o_totalprice").as("order_amount"),
      when(col("o_orderstatus") === "O", "OPEN").otherwise("PAID")
        .as("order_status"))
    Marts.arAging(orders, "2001-08-01")
      .select(col("analysis_level"), col("entity_key"), col("customer"),
        col("aging_bucket"), col("amount"), col("days_outstanding"),
        col("invoice_count"))
      .orderBy("analysis_level", "entity_key", "aging_bucket")
  }

  /** DSO metrics through the real `Marts.dsoMetrics` model (J13 cross
    * join of the 1-row AR aggregate onto trailing-period daily sales).
    * dso compared unrounded (ROUND(double,2) is not engine-portable). */
  val a16DsoChain: Q = Q.sql(
    "a16_dso_chain",
    s"""WITH o AS (
      |  SELECT CAST(o_orderdate AS DATE) AS order_date,
      |    o_totalprice AS order_amount,
      |    CASE WHEN o_orderstatus = 'O' THEN 'OPEN' ELSE 'PAID' END AS order_status
      |  FROM orders
      |), ar AS (
      |  SELECT ${sqlDsum("order_amount")} AS total_ar
      |  FROM o WHERE order_status = 'OPEN'
      |), periods AS (
      |  SELECT 30 AS period_days, ${sqlDsum("order_amount")} / 30 AS daily_sales
      |  FROM o WHERE order_date > DATE '2001-08-01' - 30
      |  UNION ALL
      |  SELECT 60, ${sqlDsum("order_amount")} / 60
      |  FROM o WHERE order_date > DATE '2001-08-01' - 60
      |  UNION ALL
      |  SELECT 90, ${sqlDsum("order_amount")} / 90
      |  FROM o WHERE order_date > DATE '2001-08-01' - 90
      |)
      |SELECT p.period_days, p.daily_sales, a.total_ar,
      |  CASE WHEN p.daily_sales > 0 THEN a.total_ar / p.daily_sales END AS dso_raw
      |FROM periods p CROSS JOIN ar a
      |ORDER BY p.period_days""".stripMargin) { (s, d) =>
    import graft.ref.Marts
    val orders = Tables.orders(s, d).select(
      col("o_orderdate").cast("date").as("order_date"),
      col("o_totalprice").as("order_amount"),
      when(col("o_orderstatus") === "O", "OPEN").otherwise("PAID")
        .as("order_status"))
    Marts.dsoMetrics(orders, "2001-08-01")
      .withColumn("dso_raw",
        when(col("daily_sales") > 0, col("total_ar") / col("daily_sales")))
      .select("period_days", "daily_sales", "total_ar", "dso_raw")
      .orderBy("period_days")
  }

  val all: Seq[Q] = Seq(j3ConsolidationChain, a15ArAgingChain, a16DsoChain)
}
