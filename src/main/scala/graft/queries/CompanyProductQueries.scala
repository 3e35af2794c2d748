package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det._

/** Company-product analytics (SURVEY A9 + the period-spending mart) —
  * driven through the actual `Marts.fctCompanyProducts` /
  * `Marts.productCompanyPeriodSpending` models over frames synthesized
  * from the testdata star schema: supplier plays the consolidated
  * company, part plays the product catalog, lineitem plays the order
  * line items (return flag plays the sales rep for the MODE argmax).
  */
object CompanyProductQueries {

  private val A = "DATE '2001-09-01'"
  private val AsOf = "2001-09-01"

  private val synthSql =
    s"""li AS (
      |  SELECT CAST(l_suppkey AS VARCHAR) AS customer,
      |    'P' || CAST(l_partkey AS VARCHAR) AS product_service,
      |    l_returnflag || '/' || l_linestatus AS description,
      |    CAST(l_shipdate AS DATE) AS order_date,
      |    l_quantity AS qty,
      |    l_extendedprice * (1 - l_discount) AS rate,
      |    l_extendedprice AS amt, l_returnflag AS sales_rep,
      |    l_orderkey AS order_number
      |  FROM lineitem
      |), bridge AS (
      |  SELECT CAST(s_suppkey AS VARCHAR) AS customer,
      |    'c' || CAST(s_suppkey AS VARCHAR) AS company_domain_key
      |  FROM supplier
      |), base AS (
      |  SELECT li.*, b.company_domain_key
      |  FROM li JOIN bridge b USING (customer)
      |  WHERE amt > 0 AND trim(product_service) != ''
      |)""".stripMargin

  private def synthSpark(s: org.apache.spark.sql.SparkSession, d: String) = {
    val li = Tables.lineitem(s, d).select(
      col("l_suppkey").cast("string").as("customer"),
      concat(lit("P"), col("l_partkey").cast("string"))
        .as("product_service"),
      concat(col("l_returnflag"), lit("/"), col("l_linestatus"))
        .as("product_service_description"),
      col("l_shipdate").cast("date").as("order_date"),
      col("l_quantity").as("product_service_quantity"),
      // NOT price/quantity: division by a power-of-two quantity yields
      // doubles that are exact 7-decimal ties (x.xxxxxx5), where the
      // DECIMAL(38,6) cast rounds HALF_UP in Spark but HALF_EVEN in
      // DuckDB. A price×discount product is never a terminating tie.
      (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("product_service_rate"),
      col("l_extendedprice").as("product_service_amount"),
      col("l_returnflag").as("sales_rep"),
      col("l_orderkey").as("order_number"),
      lit("invoice").as("source_type"))
    val bridge = Tables.supplier(s, d).select(
      col("s_suppkey").cast("string").as("customer"),
      concat(lit("c"), col("s_suppkey").cast("string"))
        .as("company_domain_key"))
    val products = Tables.part(s, d).select(
      concat(lit("P"), col("p_partkey").cast("string")).as("product_name"),
      col("p_brand").as("product_family"),
      col("p_type").as("material_type"),
      (col("p_size") % 2 === 0).as("is_kit"),
      col("p_type").as("item_type"),
      col("p_retailprice").as("sales_price"),
      (col("p_retailprice") * 0.6).as("purchase_cost"))
    (li, bridge, products)
  }

  /** fct_companies stand-in aggregated from the shared company-product
    * base (recomputed per consumer; exchange reuse dedups the shared
    * shuffles — SCALE.md anti-lessons). */
  private def companiesFrom(base: org.apache.spark.sql.DataFrame) =
    base.groupBy(col("company_domain_key"))
      .agg(dsum(col("product_service_amount")).as("total_revenue"))
      .withColumn("company_name",
        concat(lit("Supplier "), col("company_domain_key")))
      .withColumn("domain_type", lit("corporate"))
      .withColumn("business_size_category", lit("Single Location"))

  /** A9 — fct_company_products (fct_company_products.sql:14-206). */
  val a9CompanyProducts: Q = Q.sql(
    "a9_company_products",
    s"""WITH $synthSql, rep AS (
      |  SELECT company_domain_key, product_service,
      |    sales_rep AS primary_sales_rep
      |  FROM (SELECT company_domain_key, product_service, sales_rep,
      |          COUNT(*) AS n
      |        FROM base GROUP BY 1, 2, 3) t
      |  QUALIFY ROW_NUMBER() OVER (
      |    PARTITION BY company_domain_key, product_service
      |    ORDER BY n DESC, sales_rep) = 1
      |), metrics AS (
      |  SELECT company_domain_key, product_service,
      |    (MAX(struct_pack(d := order_date, s := description))).s
      |      AS product_service_description,
      |    COUNT(*) AS total_transactions,
      |    COUNT(DISTINCT order_date) AS purchase_days,
      |    ${sqlDsum("qty")} AS total_quantity_purchased,
      |    ${sqlDsum("amt")} AS total_amount_spent,
      |    ${sqlDavg("rate")} AS avg_unit_price,
      |    MIN(rate) AS min_unit_price, MAX(rate) AS max_unit_price,
      |    MIN(order_date) AS first_purchase_date,
      |    MAX(order_date) AS latest_purchase_date,
      |    CAST(SUM(CASE WHEN order_date >= $A - 90 THEN 1 ELSE 0 END) AS BIGINT) AS recent_transactions,
      |    CAST(SUM(CASE WHEN order_date >= $A - 365 THEN 1 ELSE 0 END) AS BIGINT) AS last_year_transactions
      |  FROM base GROUP BY 1, 2
      |), products AS (
      |  SELECT 'P' || CAST(p_partkey AS VARCHAR) AS product_service,
      |    p_brand AS product_family, p_type AS material_type,
      |    p_size % 2 = 0 AS is_kit, p_type AS item_type,
      |    p_retailprice AS standard_sales_price,
      |    p_retailprice * 0.6 AS standard_purchase_cost
      |  FROM part
      |), companies AS (
      |  SELECT company_domain_key,
      |    ${sqlDsum("amt")} AS company_total_revenue
      |  FROM base GROUP BY 1
      |)
      |SELECT m.company_domain_key, m.product_service,
      |  m.product_service_description,
      |  m.total_transactions, m.purchase_days, m.total_quantity_purchased,
      |  m.total_amount_spent, m.avg_unit_price, m.min_unit_price,
      |  m.max_unit_price,
      |  CAST(m.first_purchase_date AS VARCHAR) AS first_purchase_date,
      |  CAST(m.latest_purchase_date AS VARCHAR) AS latest_purchase_date,
      |  m.recent_transactions, m.last_year_transactions,
      |  r.primary_sales_rep,
      |  p.product_family, p.material_type, p.is_kit, p.item_type,
      |  p.standard_sales_price, p.standard_purchase_cost,
      |  CASE WHEN p.standard_sales_price > 0 AND m.avg_unit_price > 0
      |       THEN (m.avg_unit_price - p.standard_sales_price) * 100.0 / p.standard_sales_price
      |       END AS price_variance_pct_raw,
      |  CASE WHEN p.standard_purchase_cost > 0 AND m.avg_unit_price > 0
      |       THEN (m.avg_unit_price - p.standard_purchase_cost) * 100.0 / m.avg_unit_price
      |       END AS avg_margin_pct_raw,
      |  $A - m.latest_purchase_date AS days_since_last_purchase,
      |  CASE WHEN m.purchase_days > 0
      |       THEN m.total_transactions / m.purchase_days
      |       ELSE 0.0 END AS transactions_per_day_raw,
      |  CASE WHEN m.latest_purchase_date >= $A - 90 THEN 'Active Buyer'
      |       WHEN m.latest_purchase_date >= $A - 365 THEN 'Recent Buyer'
      |       WHEN m.latest_purchase_date >= $A - 730 THEN 'Dormant Buyer'
      |       ELSE 'Inactive Buyer' END AS buyer_status,
      |  CASE WHEN m.total_amount_spent >= 10000 THEN 'High Volume ($$10K+)'
      |       WHEN m.total_amount_spent >= 2500 THEN 'Medium Volume ($$2.5K-$$10K)'
      |       WHEN m.total_amount_spent >= 500 THEN 'Low Volume ($$500-$$2.5K)'
      |       ELSE 'Occasional (<$$500)' END AS purchase_volume_category,
      |  CASE WHEN m.total_transactions >= 20 THEN 'Frequent Buyer (20+ orders)'
      |       WHEN m.total_transactions >= 10 THEN 'Regular Buyer (10-19 orders)'
      |       WHEN m.total_transactions >= 5 THEN 'Occasional Buyer (5-9 orders)'
      |       ELSE 'Rare Buyer (<5 orders)' END AS purchase_frequency_category,
      |  'Supplier ' || m.company_domain_key AS company_name,
      |  c.company_total_revenue,
      |  m.total_amount_spent * 100.0 / NULLIF(c.company_total_revenue, 0) AS product_revenue_pct_raw
      |FROM metrics m
      |LEFT JOIN rep r USING (company_domain_key, product_service)
      |LEFT JOIN products p USING (product_service)
      |JOIN companies c USING (company_domain_key)
      |ORDER BY company_domain_key, product_service""".stripMargin) {
    (s, d) =>
    import graft.ref.Marts
    // The shared base feeds the rep-mode scan, the metrics scan and the
    // company rollup — RECOMPUTED per consumer, not materialized: the
    // shared lineage is scan + broadcast join + filter (no shuffle), so
    // each consumer's column pruning pushes through to its own source
    // scan and re-running it is cheaper than a full-width parquet
    // write + read-back (r07 min-of-3: 3.9 s → 2.7 s; .persist() was
    // 1.6× slower still, r03). Intra-plan sharing always recomputes —
    // exchange reuse dedups any shared shuffles (SCALE.md anti-lessons).
    val (li, bridge, products) = synthSpark(s, d)
    val base = Marts.companyProductBase(li, bridge)
    Marts.fctCompanyProductsFromBase(base, products, companiesFrom(base),
      AsOf)
      .select(
        col("company_domain_key"), col("product_service"),
        col("product_service_description"),
        col("total_transactions"), col("purchase_days"),
        col("total_quantity_purchased"), col("total_amount_spent"),
        col("avg_unit_price"), col("min_unit_price"), col("max_unit_price"),
        col("first_purchase_date").cast("string")
          .as("first_purchase_date"),
        col("latest_purchase_date").cast("string")
          .as("latest_purchase_date"),
        col("recent_transactions"), col("last_year_transactions"),
        col("primary_sales_rep"),
        col("product_family"), col("material_type"), col("is_kit"),
        col("item_type"), col("standard_sales_price"),
        col("standard_purchase_cost"),
        // ROUND(double,2) is not engine-portable at scaled ties (see
        // Det scaladoc) — pct columns compared UNROUNDED; the model
        // keeps its reference-faithful rounding.
        when(col("standard_sales_price") > 0 && col("avg_unit_price") > 0,
          (col("avg_unit_price") - col("standard_sales_price")) * 100.0
            / col("standard_sales_price")).as("price_variance_pct_raw"),
        when(col("standard_purchase_cost") > 0 &&
          col("avg_unit_price") > 0,
          (col("avg_unit_price") - col("standard_purchase_cost")) * 100.0
            / col("avg_unit_price")).as("avg_margin_pct_raw"),
        col("days_since_last_purchase"),
        when(col("purchase_days") > 0,
          col("total_transactions") / col("purchase_days"))
          .otherwise(0.0).as("transactions_per_day_raw"),
        col("buyer_status"),
        col("purchase_volume_category"), col("purchase_frequency_category"),
        col("company_name"), col("company_total_revenue"),
        (col("total_amount_spent") * 100.0 /
          nullif(col("company_total_revenue"), lit(0)))
          .as("product_revenue_pct_raw"))
      .orderBy("company_domain_key", "product_service")
  }

  /** Period-spending mart — row-per-(product, company, trailing period)
    * (mart_product_company_period_spending.sql:19-233), aggregated
    * Spark-side in one exploded hash aggregate. The oracle keeps the
    * reference's UNION ALL shape; outputs must match row-for-row. */
  val a9PeriodSpending: Q = {
    def periodSelect(ptype: String, cond: String): String =
      s"""SELECT product_service, company_domain_key,
        |    '$ptype' AS period_type,
        |    ${sqlDsum(s"CASE WHEN $cond THEN amt ELSE 0 END")} AS total_amount_spent,
        |    CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS total_transactions,
        |    ${sqlDsum(s"CASE WHEN $cond THEN qty ELSE 0 END")} AS total_quantity_purchased,
        |    ${sqlDavg(s"CASE WHEN $cond THEN rate END")} AS avg_unit_price,
        |    MIN(order_date) AS first_purchase_date,
        |    MAX(order_date) AS last_purchase_date,
        |    MAX(CASE WHEN r = 1 THEN customer END) AS latest_customer
        |  FROM ranked GROUP BY 1, 2""".stripMargin
    Q.sql(
      "a9_period_spending",
      s"""WITH $synthSql, ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY product_service, company_domain_key
        |    ORDER BY order_date DESC, customer, order_number) AS r
        |  FROM base
        |), periods AS (
        |  ${periodSelect("trailing_30d", s"order_date >= $A - 30")}
        |  UNION ALL
        |  ${periodSelect("trailing_90d", s"order_date >= $A - 90")}
        |  UNION ALL
        |  ${periodSelect("trailing_1y", s"order_date >= $A - 365")}
        |  UNION ALL
        |  ${periodSelect("all_time", "TRUE")}
        |)
        |SELECT product_service, company_domain_key, period_type,
        |  total_amount_spent, total_transactions, total_quantity_purchased,
        |  avg_unit_price,
        |  CAST(first_purchase_date AS VARCHAR) AS first_purchase_date,
        |  CAST(last_purchase_date AS VARCHAR) AS last_purchase_date,
        |  latest_customer,
        |  CASE WHEN last_purchase_date >= $A - 30 THEN 'Recent Buyer (30d)'
        |       WHEN last_purchase_date >= $A - 90 THEN 'Active Buyer (90d)'
        |       WHEN last_purchase_date >= $A - 365 THEN 'Past Year Buyer'
        |       ELSE 'Historical Buyer' END AS period_buyer_status,
        |  CASE WHEN total_amount_spent >= 10000 THEN 'High Spender ($$10K+)'
        |       WHEN total_amount_spent >= 2500 THEN 'Medium Spender ($$2.5K-$$10K)'
        |       WHEN total_amount_spent >= 500 THEN 'Low Spender ($$500-$$2.5K)'
        |       WHEN total_amount_spent > 0 THEN 'Minimal Spender (<$$500)'
        |       ELSE 'No Period Spending' END AS period_spending_category,
        |  GREATEST(0, $A - last_purchase_date) AS days_since_last_purchase
        |FROM periods
        |WHERE total_amount_spent > 0
        |ORDER BY product_service, company_domain_key, period_type""".stripMargin) {
      (s, d) =>
      import graft.ref.Marts
      val (li, bridge, products) = synthSpark(s, d)
      // The fct_company_products lineage AND the period details both
      // aggregate the same detail frame — recomputed per consumer (the
      // shuffle-free shared-lineage rule; r07 min-of-3: 7.4 s → 5.3 s
      // vs temp-parquet materialization. See a9_company_products note).
      val base = Marts.companyProductBase(li, bridge)
      val cp = Marts.fctCompanyProductsFromBase(base, products,
        companiesFrom(base), AsOf)
      Marts.productCompanyPeriodSpendingFromBase(cp, base, AsOf)
        .select(
          col("product_service"), col("company_domain_key"),
          col("period_type"), col("total_amount_spent"),
          col("total_transactions"), col("total_quantity_purchased"),
          col("avg_unit_price"),
          col("first_purchase_date").cast("string")
            .as("first_purchase_date"),
          col("last_purchase_date").cast("string")
            .as("last_purchase_date"),
          col("latest_customer"), col("period_buyer_status"),
          col("period_spending_category"), col("days_since_last_purchase"))
        .orderBy("product_service", "company_domain_key", "period_type")
    }
  }

  /** mart_company_period_metrics — the row-per-period contract
    * (mart_company_period_metrics.sql:20-209) driven through the actual
    * `Marts.companyPeriodMetrics` model (five trailing windows exploded
    * into one hash aggregate): orders grouped into 500 synthetic
    * companies, zero-activity periods filtered. */
  val a7CompanyPeriodRows: Q = {
    val A2 = "DATE '2001-08-01'"
    def pSel(ptype: String, cond: String): String =
      s"""SELECT company_domain_key, '$ptype' AS period_type,
        |    ${sqlDsum(s"CASE WHEN $cond THEN amt ELSE 0 END")} AS total_revenue,
        |    CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS total_orders,
        |    COUNT(DISTINCT CASE WHEN $cond THEN customer_name END) AS customer_count,
        |    MIN(CASE WHEN $cond THEN order_date END) AS first_order_date,
        |    MAX(CASE WHEN $cond THEN order_date END) AS latest_order_date
        |  FROM co GROUP BY company_domain_key""".stripMargin
    Q.sql(
      "a7_company_period_rows",
      s"""WITH co AS (
        |  SELECT o_custkey % 500 AS company_domain_key,
        |    CAST(o_custkey AS VARCHAR) AS customer_name,
        |    CAST(o_orderdate AS DATE) AS order_date,
        |    o_totalprice AS amt
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
        |    AND o_orderdate IS NOT NULL
        |), lifetime AS (
        |  SELECT company_domain_key,
        |    ${sqlDsum("amt")} AS lifetime_total_revenue,
        |    COUNT(*) AS lifetime_total_orders,
        |    COUNT(DISTINCT customer_name) AS lifetime_customer_count
        |  FROM co GROUP BY company_domain_key
        |), periods AS (
        |  ${pSel("trailing_7d", s"order_date >= $A2 - 7")}
        |  UNION ALL
        |  ${pSel("trailing_30d", s"order_date >= $A2 - 30")}
        |  UNION ALL
        |  ${pSel("trailing_90d", s"order_date >= $A2 - 90")}
        |  UNION ALL
        |  ${pSel("trailing_1y", s"order_date >= $A2 - 365")}
        |  UNION ALL
        |  ${pSel("all_time", "TRUE")}
        |)
        |SELECT p.company_domain_key, p.period_type, p.total_revenue,
        |  p.total_orders, p.customer_count,
        |  CAST(p.first_order_date AS VARCHAR) AS first_order_date,
        |  CAST(p.latest_order_date AS VARCHAR) AS latest_order_date,
        |  lt.lifetime_total_revenue, lt.lifetime_total_orders,
        |  lt.lifetime_customer_count,
        |  CASE WHEN p.latest_order_date >= $A2 - 30 THEN 'Recent Activity (30d)'
        |       WHEN p.latest_order_date >= $A2 - 90 THEN 'Active (90d)'
        |       WHEN p.latest_order_date >= $A2 - 365 THEN 'Past Year Activity'
        |       ELSE 'Historical Activity' END AS period_activity_status,
        |  CASE WHEN p.total_revenue >= 50000 THEN 'High Revenue ($$50K+)'
        |       WHEN p.total_revenue >= 10000 THEN 'Medium Revenue ($$10K-$$50K)'
        |       WHEN p.total_revenue >= 2500 THEN 'Low Revenue ($$2.5K-$$10K)'
        |       WHEN p.total_revenue > 0 THEN 'Minimal Revenue (<$$2.5K)'
        |       ELSE 'No Period Revenue' END AS period_revenue_category,
        |  CASE WHEN lt.lifetime_total_revenue > 0 AND p.total_revenue IS NOT NULL
        |       THEN LEAST(100.0, p.total_revenue * 100.0 / lt.lifetime_total_revenue)
        |       WHEN p.total_revenue > 0 THEN 100.0
        |       ELSE 0.0 END AS period_share_raw,
        |  CASE WHEN p.latest_order_date IS NOT NULL
        |       THEN GREATEST(0, $A2 - p.latest_order_date) END AS days_since_latest_order
        |FROM periods p
        |JOIN lifetime lt USING (company_domain_key)
        |WHERE p.total_revenue > 0 OR p.total_orders > 0
        |ORDER BY p.company_domain_key, p.period_type""".stripMargin) {
      (s, d) =>
      import graft.ref.Marts
      val co = Tables.orders(s, d).select(
        (col("o_custkey") % 500).as("company_domain_key"),
        col("o_custkey").cast("string").as("customer_name"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_totalprice").as("order_amount"))
      val fc = co.groupBy(col("company_domain_key"))
        .agg(dsum(col("order_amount")).as("total_revenue"),
          count(lit(1)).as("total_orders"),
          countDistinct(col("customer_name")).as("customer_count"))
        .withColumn("company_name",
          concat(lit("Co "), col("company_domain_key").cast("string")))
        .withColumn("domain_type", lit("corporate"))
        .withColumn("business_size_category", lit("Single Location"))
        .withColumn("revenue_category", lit("n/a"))
        .withColumn("has_revenue", lit(true))
        .withColumn("is_multi_location", lit(false))
        .withColumn("is_corporate", lit(true))
      Marts.companyPeriodMetrics(co, fc, "2001-08-01")
        .select(col("company_domain_key"), col("period_type"),
          col("total_revenue"), col("total_orders"), col("customer_count"),
          col("first_order_date").cast("string").as("first_order_date"),
          col("latest_order_date").cast("string").as("latest_order_date"),
          col("lifetime_total_revenue"), col("lifetime_total_orders"),
          col("lifetime_customer_count"), col("period_activity_status"),
          col("period_revenue_category"),
          when(col("lifetime_total_revenue") > 0 &&
            col("total_revenue").isNotNull,
            least(lit(100.0), col("total_revenue") * 100.0 /
              col("lifetime_total_revenue")))
            .when(col("total_revenue") > 0, 100.0)
            .otherwise(0.0).as("period_share_raw"),
          col("days_since_latest_order"))
        .orderBy("company_domain_key", "period_type")
    }
  }

  val all: Seq[Q] = Seq(a9CompanyProducts, a9PeriodSpending,
    a7CompanyPeriodRows)
}
