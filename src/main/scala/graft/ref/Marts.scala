package graft.ref

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Det.{davg, dsum}

/** Mart layer — the dashboard-facing fct and dim tables. */
object Marts {

  /** fct_orders (fct_orders.sql:23-207): order grain + primary-contact
    * join (J5, fct_orders.sql:75-86,206) + optional Shopify enrichment
    * (existence-guarded left join, :23-72,207) + the reference's derived
    * flags/addresses/metrics (:89-204). Guards are plan-construction
    * decisions, not runtime lookups (SURVEY §3.2 wrinkle #1).
    *
    * `primaryContacts` is dim_customer_contacts filtered to
    * is_primary_company_contact and projected to the contact columns —
    * a small dim, broadcast. */
  def fctOrders(orders: DataFrame,
                shopifyEnrichment: Option[DataFrame],
                primaryContacts: Option[DataFrame] = None): DataFrame = {
    val shopifyCols = Seq("acquisition_channel", "utm_source",
      "utm_medium", "utm_campaign", "landing_site", "referring_site",
      "tracking_number", "tracking_company", "fulfillment_status")
    val withShopify = shopifyEnrichment match {
      case Some(sh) =>
        val hasCol = sh.columns.toSet
        def opt(n: String) =
          (if (hasCol(n)) col(n) else lit(null).cast("string")).as(n)
        orders.join(
          sh.select(Seq(col("order_number")) ++ shopifyCols.map(opt) ++ Seq(
            (if (hasCol("fulfilled_at")) col("fulfilled_at")
             else lit(null).cast("timestamp")).as("fulfilled_at"),
            (if (hasCol("has_discount")) col("has_discount")
             else lit(null).cast("boolean")).as("shopify_has_discount")): _*),
          Seq("order_number"), "left")
      case None =>
        shopifyCols.foldLeft(orders)(
          (df, n) => df.withColumn(n, lit(null).cast("string")))
          .withColumn("fulfilled_at", lit(null).cast("timestamp"))
          .withColumn("shopify_has_discount", lit(null).cast("boolean"))
    }
    val withContacts = primaryContacts match {
      case Some(pc) => withShopify.join(broadcast(pc), Seq("customer"), "left")
      case None => withShopify
        .withColumn("primary_contact_id", lit(null).cast("string"))
        .withColumn("primary_contact_name", lit(null).cast("string"))
        .withColumn("primary_contact_email", lit(null).cast("string"))
        .withColumn("primary_contact_phone", lit(null).cast("string"))
        .withColumn("primary_contact_role", lit(null).cast("string"))
    }
    def addrConcat(prefix: String) = concat_ws(", ",
      col(s"${prefix}_address_line_1"), col(s"${prefix}_address_line_2"),
      col(s"${prefix}_address_line_3"))
    withContacts
      .withColumn("is_paid", col("order_status") === "PAID")
      .withColumn("is_backdated",
        coalesce(col("due_date") < col("order_date"), lit(false)))
      .withColumn("billing_address", addrConcat("billing"))
      .withColumn("shipping_address", addrConcat("shipping"))
      .withColumn("sales_channel_source",
        when(col("order_number").startsWith("S-"), "Shopify")
          .when(col("order_number").startsWith("A"), "Direct")
          .otherwise("Other"))
      .withColumn("total_line_items_amount",
        coalesce(col("total_line_items_amount"), lit(0.0)))
      .withColumn("total_tax", coalesce(col("total_tax"), lit(0.0)))
      .withColumn("total_amount", coalesce(col("total_amount"), lit(0.0)))
      .withColumn("item_count", coalesce(col("item_count"), lit(0L)))
      .withColumn("effective_tax_rate",
        when(col("total_tax") === 0 || col("total_amount") === 0, lit(0.0))
          .otherwise(round(col("total_tax") / col("total_amount") * 100, 2)))
  }

  /** fct_products: enriched items at item grain, with the
    * material-type attribute model joined in (broadcast; both sides are
    * item-grain dims). */
  def fctProducts(itemsEnriched: DataFrame,
                  materialType: Option[DataFrame] = None): DataFrame = {
    val base = itemsEnriched.select(
      col("item_name").as("product_name"),
      col("item_id").as("product_id"),
      col("item_type"), col("product_family"), col("is_kit"),
      col("is_master_pack"), col("carton_count"),
      col("sales_price"), col("purchase_cost"), col("margin_pct"),
      col("quantity_on_hand"), col("unit_of_measure"), col("status"))
    materialType match {
      case Some(mt) => base.join(
        broadcast(mt.select(col("item_name").as("product_name"),
          col("material_type"))), Seq("product_name"), "left")
      case None => base.withColumn("material_type",
        lit(null).cast("string"))
    }
  }

  /** fct_order_line_items (fct_order_line_items.sql:118-220): typed line
    * items ⋈ products (broadcast J6) with margin/discount calcs. */
  def fctOrderLineItems(typedItems: DataFrame,
                        fctProducts: DataFrame): DataFrame =
    typedItems
      .join(broadcast(fctProducts
        .select(col("product_name").as("product_service"),
          col("product_family"), col("material_type"), col("is_kit"),
          col("carton_count"),
          col("sales_price").as("list_price"),
          col("purchase_cost"), col("margin_pct"))),
        Seq("product_service"), "left")
      .withColumn("margin_amount",
        when(col("purchase_cost").isNotNull,
          col("line_amount") -
            col("purchase_cost") * col("product_service_quantity")))
      .withColumn("discount_pct",
        when(col("list_price") > 0 && col("product_service_rate") > 0,
          round((lit(1) - col("product_service_rate") / col("list_price"))
            * 100, 2)))
      // Margin-analytics surface (fct_order_line_items.sql:118-220)
      .withColumn("actual_unit_price", col("product_service_rate"))
      .withColumn("standard_sales_price", col("list_price"))
      .withColumn("standard_purchase_cost", col("purchase_cost"))
      .withColumn("standard_margin_percentage", col("margin_pct"))
      .withColumn("standard_margin_amount",
        when(col("purchase_cost").isNotNull,
          col("list_price") - col("purchase_cost")))
      .withColumn("actual_margin_amount",
        when(col("purchase_cost").isNotNull &&
          col("product_service_rate") > 0,
          col("product_service_rate") - col("purchase_cost")))
      .withColumn("actual_margin_percentage",
        when(col("purchase_cost").isNotNull &&
          col("product_service_rate") > 0,
          round((col("product_service_rate") - col("purchase_cost"))
            * 100.0 / col("product_service_rate"), 2)))
      .withColumn("price_discount_amount",
        when(col("list_price") > 0 && col("product_service_rate") > 0,
          col("list_price") - col("product_service_rate")))
      .withColumn("price_discount_percentage", col("discount_pct"))
      .withColumn("total_units_sold",
        col("product_service_quantity") *
          coalesce(col("carton_count"), lit(1)))

  /** fct_companies + bridge_customer_company
    * (int_quickbooks__company_consolidation.sql:203-208;
    * bridge_customer_company.sql:69-71). */
  def fctCompanies(consolidation: DataFrame): DataFrame =
    consolidation.orderBy(col("company_domain_key"))

  def bridgeCustomerCompany(mapping: DataFrame): DataFrame =
    mapping.select(col("customer_name").as("customer"), col("customer_id"),
      col("company_domain_key")).distinct()

  /** fct_company_orders (fct_company_orders.sql:42-126): line items ⋈
    * bridge (J7 inner) rolled to (company, order). */
  def fctCompanyOrders(lineItems: DataFrame, bridge: DataFrame): DataFrame =
    lineItems
      .join(broadcast(bridge), Seq("customer"))
      .groupBy(col("company_domain_key"), col("order_number"))
      .agg(
        max(col("customer")).as("customer_name"),
        max(col("order_date")).as("order_date"),
        count(lit(1)).as("line_count"),
        sum(col("line_amount")).as("order_amount"),
        countDistinct(col("product_service")).as("distinct_products"),
        array_join(sort_array(collect_set(col("product_family"))), " | ")
          .as("product_families"),
        sum(when(coalesce(col("is_kit"), lit(false)),
          col("line_amount")).otherwise(0)).as("kit_amount"),
        avg(col("margin_amount")).as("avg_margin"))

  /** fct_company_products (fct_company_products.sql:14-206): per
    * (company, product) purchase metrics. Differences from the reference
    * plan, same results: the product/company enrichment joins happen
    * AFTER the aggregate (|company×product| rows instead of |line
    * items|), MODE(sales_rep) is the deterministic pre-count argmax
    * (A4), and the most-recent description is a struct-max inside the
    * metrics aggregate (latest date; max description on ties —
    * value-stable) instead of the reference's ROW_NUMBER window.
    * CURRENT_DATE → injected asOfDate. */
  /** Shared line-item detail base of the company-product marts:
    * line items ⋈ customer→company bridge (broadcast), filtered to
    * positive-amount rows with a real product and company. Both
    * `fctCompanyProducts` and `productCompanyPeriodSpending` aggregate
    * THIS frame. Because the lineage is scan + broadcast join + filter
    * — no shuffle — callers composing several consumers in one plan
    * should let each RECOMPUTE it: column pruning pushes through to
    * each consumer's own source scan, and that beats both `.persist()`
    * (1.6× slower, r03) and temp-parquet materialization (r07
    * min-of-3: queries got 25-30% faster when materialization was
    * removed). The model DAG still materializes it as a TABLE between
    * models (`Catalog.saveTable`) because cross-model reuse and
    * restartability want a durable artifact — the in-plan economics
    * and the between-model economics differ. */
  def companyProductBase(lineItems: DataFrame,
                         bridge: DataFrame): DataFrame =
    lineItems
      .join(broadcast(bridge), Seq("customer"))
      .filter(col("product_service_amount").isNotNull &&
        col("product_service_amount") > 0 &&
        col("product_service").isNotNull &&
        trim(col("product_service")) =!= "" &&
        col("company_domain_key").isNotNull &&
        col("company_domain_key") =!= "NO_EMAIL_DOMAIN")

  def fctCompanyProducts(lineItems: DataFrame, bridge: DataFrame,
                         fctProducts: DataFrame, fctCompanies: DataFrame,
                         asOfDate: String): DataFrame =
    fctCompanyProductsFromBase(companyProductBase(lineItems, bridge),
      fctProducts, fctCompanies, asOfDate)

  /** fct_company_products over an already-built (possibly persisted)
    * [[companyProductBase]] frame. */
  def fctCompanyProductsFromBase(base: DataFrame, fctProducts: DataFrame,
                                 fctCompanies: DataFrame,
                                 asOfDate: String): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    val grain = Seq(col("company_domain_key"), col("product_service"))
    val repCounts = base.filter(col("sales_rep").isNotNull)
      .groupBy(col("company_domain_key"), col("product_service"),
        col("sales_rep")).count()
    val repW = Window.partitionBy(grain: _*)
      .orderBy(col("count").desc, col("sales_rep"))
    val primaryRep = repCounts
      .withColumn("rn", row_number().over(repW)).filter(col("rn") === 1)
      .select(col("company_domain_key"), col("product_service"),
        col("sales_rep").as("primary_sales_rep"))
    val metrics = base.groupBy(grain: _*)
      .agg(
        // Most-recent description folded into the SAME aggregate as a
        // struct-max (latest order_date; max description on date ties —
        // value-stable) — replaces the reference's ROW_NUMBER window
        // (fct_company_products.sql:33-57), saving a full shuffle+sort
        // of the line-item fact at scale.
        max(struct(col("order_date"), col("product_service_description")))
          .getField("product_service_description")
          .as("product_service_description"),
        count(lit(1)).as("total_transactions"),
        countDistinct(col("order_date")).as("purchase_days"),
        dsum(col("product_service_quantity"))
          .as("total_quantity_purchased"),
        dsum(col("product_service_amount")).as("total_amount_spent"),
        davg(col("product_service_rate")).as("avg_unit_price"),
        min(col("product_service_rate")).as("min_unit_price"),
        max(col("product_service_rate")).as("max_unit_price"),
        min(col("order_date")).as("first_purchase_date"),
        max(col("order_date")).as("latest_purchase_date"),
        sum(when(col("order_date") >= date_sub(asOf, 90), 1).otherwise(0))
          .as("recent_transactions"),
        sum(when(col("order_date") >= date_sub(asOf, 365), 1).otherwise(0))
          .as("last_year_transactions"))
    metrics
      .join(primaryRep, Seq("company_domain_key", "product_service"), "left")
      .join(broadcast(fctProducts.select(
        col("product_name").as("product_service"),
        col("product_family"), col("material_type"), col("is_kit"),
        col("item_type"),
        col("sales_price").as("standard_sales_price"),
        col("purchase_cost").as("standard_purchase_cost"))),
        Seq("product_service"), "left")
      .join(fctCompanies.select(col("company_domain_key"),
        col("company_name"), col("domain_type"),
        col("business_size_category"),
        col("total_revenue").as("company_total_revenue")),
        Seq("company_domain_key"))
      .withColumn("price_variance_percentage",
        when(col("standard_sales_price") > 0 && col("avg_unit_price") > 0,
          round((col("avg_unit_price") - col("standard_sales_price"))
            * 100.0 / col("standard_sales_price"), 2)))
      .withColumn("avg_margin_percentage",
        when(col("standard_purchase_cost") > 0 && col("avg_unit_price") > 0,
          round((col("avg_unit_price") - col("standard_purchase_cost"))
            * 100.0 / col("avg_unit_price"), 2)))
      .withColumn("days_since_last_purchase",
        datediff(asOf, col("latest_purchase_date")))
      .withColumn("transactions_per_purchase_day",
        when(col("purchase_days") > 0,
          round(col("total_transactions") / col("purchase_days"), 2))
          .otherwise(0.0))
      .withColumn("buyer_status",
        when(col("latest_purchase_date") >= date_sub(asOf, 90),
          "Active Buyer")
          .when(col("latest_purchase_date") >= date_sub(asOf, 365),
            "Recent Buyer")
          .when(col("latest_purchase_date") >= date_sub(asOf, 730),
            "Dormant Buyer")
          .otherwise("Inactive Buyer"))
      .withColumn("purchase_volume_category",
        when(col("total_amount_spent") >= 10000, "High Volume ($10K+)")
          .when(col("total_amount_spent") >= 2500,
            "Medium Volume ($2.5K-$10K)")
          .when(col("total_amount_spent") >= 500,
            "Low Volume ($500-$2.5K)")
          .otherwise("Occasional (<$500)"))
      .withColumn("purchase_frequency_category",
        when(col("total_transactions") >= 20, "Frequent Buyer (20+ orders)")
          .when(col("total_transactions") >= 10,
            "Regular Buyer (10-19 orders)")
          .when(col("total_transactions") >= 5,
            "Occasional Buyer (5-9 orders)")
          .otherwise("Rare Buyer (<5 orders)"))
      .withColumn("product_revenue_percentage",
        round(col("total_amount_spent") * 100.0 /
          nullif(col("company_total_revenue"), lit(0)), 2))
  }

  /** mart_product_company_period_spending
    * (mart_product_company_period_spending.sql:19-233): per
    * (product, company, trailing-period) spending rows. The reference
    * UNION-ALLs four grouped scans of the transaction details; here the
    * periods are exploded onto each detail row and aggregated in ONE
    * hash aggregate — one shuffle of 4× the rows with map-side combine
    * instead of four full scans + union, same output rows. */
  def productCompanyPeriodSpending(fctCompanyProducts: DataFrame,
                                   lineItems: DataFrame, bridge: DataFrame,
                                   asOfDate: String): DataFrame =
    productCompanyPeriodSpendingFromBase(fctCompanyProducts,
      companyProductBase(lineItems, bridge), asOfDate)

  /** Period-spending mart over an already-built (possibly persisted)
    * [[companyProductBase]] frame. */
  def productCompanyPeriodSpendingFromBase(fctCompanyProducts: DataFrame,
                                           details: DataFrame,
                                           asOfDate: String): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    val latestW = Window
      .partitionBy(col("product_service"), col("company_domain_key"))
      .orderBy(col("order_date").desc, col("customer"),
        col("order_number"))
    val ranked = details
      .withColumn("latest_transaction_rank", row_number().over(latestW))
    // AGGREGATE-THEN-EXPLODE: the reference UNION-ALLs four grouped
    // scans; the naive Spark rewrite explodes each detail row onto its
    // 4 period rows BEFORE aggregating (4× the rows through the decimal
    // hash aggregate). Instead, aggregate ONCE at (product, company)
    // grain with per-period conditional aggregates — the window's
    // (product, company) partitioning is reused, so no extra exchange —
    // and explode the ~|groups| result rows into period rows after.
    // Same output rows; the explode runs on 4×|groups|, not 4×|details|.
    val periods = Seq("trailing_30d" -> Some(30), "trailing_90d" -> Some(90),
      "trailing_1y" -> Some(365), "all_time" -> None)
    def inP(days: Option[Int]): Column =
      days.map(d => col("order_date") >= date_sub(asOf, d))
        .getOrElse(lit(true))
    val perPeriod = periods.flatMap { case (p, days) =>
      Seq(
        dsum(when(inP(days), col("product_service_amount")).otherwise(0))
          .as(s"__amt_$p"),
        sum(when(inP(days), 1).otherwise(0)).as(s"__tx_$p"),
        dsum(when(inP(days),
          coalesce(col("product_service_quantity"), lit(0.0)))
          .otherwise(0)).as(s"__qty_$p"),
        davg(when(inP(days), col("product_service_rate")))
          .as(s"__avg_$p"))
    }
    val shared = Seq(
      min(col("order_date")).as("first_purchase_date"),
      max(col("order_date")).as("last_purchase_date"),
      max(when(col("latest_transaction_rank") === 1, col("customer")))
        .as("latest_customer"),
      max(when(col("latest_transaction_rank") === 1, col("source_type")))
        .as("latest_source_type"))
    val aggs = perPeriod ++ shared
    val grouped = ranked
      .groupBy(col("product_service"), col("company_domain_key"))
      .agg(aggs.head, aggs.tail: _*)
    val periodStructs = periods.map { case (p, _) =>
      struct(lit(p).as("period_type"),
        col(s"__amt_$p").as("total_amount_spent"),
        col(s"__tx_$p").as("total_transactions"),
        col(s"__qty_$p").as("total_quantity_purchased"),
        col(s"__avg_$p").as("avg_unit_price"))
    }
    val agg = grouped
      .select(Seq(col("product_service"), col("company_domain_key"),
        col("first_purchase_date"), col("last_purchase_date"),
        col("latest_customer"), col("latest_source_type"),
        explode(array(periodStructs: _*)).as("__p")): _*)
      .select(col("product_service"), col("company_domain_key"),
        col("__p.period_type").as("period_type"),
        col("__p.total_amount_spent").as("total_amount_spent"),
        col("__p.total_transactions").as("total_transactions"),
        col("__p.total_quantity_purchased").as("total_quantity_purchased"),
        col("__p.avg_unit_price").as("avg_unit_price"),
        col("first_purchase_date"), col("last_purchase_date"),
        col("latest_customer"), col("latest_source_type"))
      .filter(col("total_amount_spent") > 0)
    agg
      .join(fctCompanyProducts.select(
        col("company_domain_key"), col("product_service"),
        col("company_name"), col("domain_type"),
        col("business_size_category"), col("company_total_revenue"),
        col("product_family"), col("material_type"), col("is_kit"),
        col("item_type"), col("standard_sales_price"),
        col("standard_purchase_cost"),
        col("avg_margin_percentage").as("standard_margin_percentage"),
        col("buyer_status").as("lifetime_buyer_status"),
        col("purchase_volume_category").as("lifetime_volume_category"),
        col("purchase_frequency_category")
          .as("lifetime_frequency_category"),
        col("total_amount_spent").as("lifetime_total_spent"),
        col("total_transactions").as("lifetime_total_transactions")),
        Seq("company_domain_key", "product_service"))
      .withColumn("period_buyer_status",
        when(col("last_purchase_date") >= date_sub(asOf, 30),
          "Recent Buyer (30d)")
          .when(col("last_purchase_date") >= date_sub(asOf, 90),
            "Active Buyer (90d)")
          .when(col("last_purchase_date") >= date_sub(asOf, 365),
            "Past Year Buyer")
          .otherwise("Historical Buyer"))
      .withColumn("period_spending_category",
        when(col("total_amount_spent") >= 10000, "High Spender ($10K+)")
          .when(col("total_amount_spent") >= 2500,
            "Medium Spender ($2.5K-$10K)")
          .when(col("total_amount_spent") >= 500,
            "Low Spender ($500-$2.5K)")
          .when(col("total_amount_spent") > 0, "Minimal Spender (<$500)")
          .otherwise("No Period Spending"))
      .withColumn("price_variance_percentage",
        when(col("standard_sales_price") > 0 && col("avg_unit_price") > 0,
          round((col("avg_unit_price") - col("standard_sales_price"))
            * 100.0 / col("standard_sales_price"), 2)))
      .withColumn("period_share_of_lifetime_spending",
        when(col("lifetime_total_spent") > 0 &&
          col("total_amount_spent").isNotNull,
          least(lit(100.0), round(col("total_amount_spent") * 100.0 /
            col("lifetime_total_spent"), 2)))
          .when(col("total_amount_spent") > 0, 100.0)
          .otherwise(0.0))
      .withColumn("days_since_last_purchase",
        greatest(lit(0), datediff(asOf, col("last_purchase_date"))))
  }

  /** dim_accounts_receivable_aging
    * (dim_accounts_receivable_aging.sql:21-150): days outstanding vs an
    * injected as-of date (§7.4 #5), aging buckets, and the three-level
    * UNION ALL summary (A15). */
  def arAging(orders: DataFrame, asOfDate: String): DataFrame = {
    val open = orders.filter(col("order_status") === "OPEN")
      .withColumn("days_outstanding",
        datediff(to_date(lit(asOfDate)), col("order_date")))
      .withColumn("aging_bucket",
        when(col("days_outstanding") <= 30, "0-30")
          .when(col("days_outstanding") <= 60, "31-60")
          .when(col("days_outstanding") <= 90, "61-90")
          .otherwise("90+"))
    val detail = open.select(
      lit("invoice").as("analysis_level"),
      col("order_number").as("entity_key"),
      col("customer"), col("aging_bucket"),
      col("order_amount").as("amount"),
      col("days_outstanding"))
    val byCustomer = open.groupBy(col("customer").as("entity_key"))
      .agg(dsum(col("order_amount")).as("amount"),
        max(col("days_outstanding")).as("days_outstanding"))
      .withColumn("analysis_level", lit("customer"))
    val byBucket = open.groupBy(col("aging_bucket"))
      .agg(dsum(col("order_amount")).as("amount"),
        count(lit(1)).as("invoice_count"))
      .withColumn("analysis_level", lit("bucket"))
    detail
      .unionByName(byCustomer, allowMissingColumns = true)
      .unionByName(byBucket, allowMissingColumns = true)
  }

  /** fct_dso_metrics (fct_dso_metrics.sql:11-104): single-row AR
    * aggregate cross-joined (J13) onto per-period daily sales; DSO =
    * AR / daily sales. */
  def dsoMetrics(orders: DataFrame, asOfDate: String): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    val ar = orders.filter(col("order_status") === "OPEN")
      .agg(dsum(col("order_amount")).as("total_ar"))
    val periods = Seq(30, 60, 90).map { days =>
      orders
        .filter(col("order_date") > date_sub(asOf, days))
        .agg((dsum(col("order_amount")) / days).as("daily_sales"))
        .withColumn("period_days", lit(days))
    }.reduce(_ unionByName _)
    periods.crossJoin(broadcast(ar))
      .withColumn("dso",
        when(col("daily_sales") > 0,
          round(col("total_ar") / col("daily_sales"), 2)))
      .select("period_days", "daily_sales", "total_ar", "dso")
  }

  /** dim_company_health (dim_company_health.sql:14-297): activity
    * rollup per company, archetype classification, health scoring
    * (0-100 across recency/frequency/growth/revenue/engagement
    * components), PERCENT_RANK revenue percentile, risk/opportunity
    * flags. CURRENT_DATE is replaced by the injected asOfDate
    * (SURVEY §7.4 #5); the created_at audit timestamp is dropped.
    *
    * Scale note: everything is ONE hash aggregate over fct_company_orders
    * (conditional sums for the trailing windows — no re-scans) followed
    * by windows over the already-aggregated per-company rows (W6
    * mitigation: the percent-rank input is |companies|, tiny relative to
    * the fact table), then a broadcast join to fct_companies. */
  def dimCompanyHealth(companyOrders: DataFrame,
                       fctCompanies: DataFrame,
                       asOfDate: String): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    def within(days: Int) = col("order_date") >= date_sub(asOf, days)
    val activity = companyOrders.groupBy(col("company_domain_key"))
      .agg(
        count(lit(1)).as("total_orders"),
        countDistinct(year(col("order_date"))).as("active_years"),
        max(col("order_date")).as("last_order_date"),
        min(col("order_date")).as("first_order_date"),
        dsum(col("order_amount")).as("total_revenue"),
        davg(col("order_amount")).as("avg_order_value"),
        sum(when(within(90), 1).otherwise(0)).as("orders_last_90_days"),
        dsum(when(within(90), col("order_amount")).otherwise(0))
          .as("revenue_last_90_days"),
        sum(when(within(365), 1).otherwise(0)).as("orders_last_year"),
        sum(when(within(730) && !within(365), 1).otherwise(0))
          .as("orders_prior_year"),
        dsum(when(within(365), col("order_amount")).otherwise(0))
          .as("revenue_last_year"),
        dsum(when(within(730) && !within(365), col("order_amount"))
          .otherwise(0)).as("revenue_prior_year"),
        countDistinct(col("distinct_products"))
          .as("product_diversity_score"))
      .withColumn("orders_per_year",
        col("total_orders") / greatest(
          datediff(col("last_order_date"), col("first_order_date")) / 365.0,
          lit(0.1)))
    val archetyped = activity
      .withColumn("customer_archetype",
        when(col("avg_order_value") >= 5000 && col("orders_per_year") < 8,
          "HVLF")
          .when(col("orders_per_year") >= 12, "HF")
          .otherwise("REG"))
      .withColumn("revenue_percentile",
        percent_rank().over(Window.orderBy(col("total_revenue"))))
      .withColumn("avg_order_interval_days",
        when(col("total_orders") >= 3,
          datediff(col("last_order_date"), col("first_order_date")) /
            nullif(col("total_orders") - 1, lit(0)))
          .otherwise(90))
    val growthRatio =
      (col("revenue_last_year") / nullif(col("revenue_prior_year"), lit(0)))
        .multiply(0.6) +
        (col("orders_last_year") / nullif(col("orders_prior_year"), lit(0)))
          .multiply(0.4)
    val metrics = archetyped
      .join(fctCompanies.select(col("company_domain_key"),
        col("company_name"), col("domain_type"),
        col("business_size_category"), col("revenue_category")),
        Seq("company_domain_key"))
      .withColumn("days_since_last_order",
        datediff(asOf, col("last_order_date")))
      .withColumn("activity_status",
        when(col("days_since_last_order") <= 30, "Highly Active")
          .when(col("days_since_last_order") <= 90, "Active")
          .when(col("days_since_last_order") <= 180, "Moderately Active")
          .when(col("days_since_last_order") <= 365, "Dormant")
          .otherwise("Inactive"))
      .withColumn("order_frequency_category",
        when(col("orders_per_year") >= 12, "Monthly+")
          .when(col("orders_per_year") >= 6, "Bi-Monthly")
          .when(col("orders_per_year") >= 4, "Quarterly")
          .when(col("orders_per_year") >= 2, "Bi-Annual")
          .when(col("orders_per_year") >= 1, "Annual")
          .otherwise("Sporadic"))
      .withColumn("growth_trend_direction",
        when(col("orders_prior_year") === 0 && col("orders_last_year") > 0,
          "New Customer")
          .when(col("orders_prior_year") > 0 &&
            col("orders_last_year") === 0, "Lost Customer")
          .when(col("orders_last_year") > col("orders_prior_year") * 1.2,
            "Growing")
          .when(col("orders_last_year") < col("orders_prior_year") * 0.8,
            "Declining")
          .otherwise("Stable"))
      .withColumn("combined_growth_trend",
        when(col("orders_prior_year") === 0 && col("orders_last_year") > 0,
          "New Customer")
          .when(col("orders_prior_year") > 0 &&
            col("orders_last_year") === 0, "Lost Customer")
          .when(col("revenue_prior_year") > 0,
            when(growthRatio >= 1.15, "Growing")
              .when(growthRatio <= 0.85, "Declining")
              .otherwise("Stable"))
          .otherwise("Stable"))
      .withColumn("engagement_level",
        when(col("revenue_last_90_days") > col("avg_order_value") * 2,
          "High Engagement")
          .when(col("orders_last_90_days") > 0, "Medium Engagement")
          .when(col("days_since_last_order") <= 180, "Low Engagement")
          .otherwise("No Recent Engagement"))
    val recency =
      when(col("customer_archetype") === "HVLF",
        when(col("days_since_last_order") <=
          col("avg_order_interval_days") * 0.8, 35)
          .when(col("days_since_last_order") <=
            col("avg_order_interval_days") * 1.1, 30)
          .when(col("days_since_last_order") <=
            col("avg_order_interval_days") * 1.3, 22)
          .when(col("days_since_last_order") <=
            col("avg_order_interval_days") * 1.6, 15)
          .when(col("days_since_last_order") <= 365, 9)
          .otherwise(0))
        .otherwise(
          when(col("days_since_last_order") <= 30, 35)
            .when(col("days_since_last_order") <= 90, 26)
            .when(col("days_since_last_order") <= 180, 18)
            .when(col("days_since_last_order") <= 365, 9)
            .otherwise(0))
    val frequency =
      when(col("customer_archetype") === "HVLF",
        when(col("orders_per_year") >= 4, 25)
          .when(col("orders_per_year") >= 2, 21)
          .when(col("orders_per_year") >= 1, 17)
          .otherwise(8))
        .when(col("customer_archetype") === "HF",
          when(col("orders_per_year") >= 12, 25)
            .when(col("orders_per_year") >= 8, 21)
            .when(col("orders_per_year") >= 6, 17)
            .otherwise(8))
        .otherwise(
          when(col("orders_per_year") >= 12, 25)
            .when(col("orders_per_year") >= 6, 21)
            .when(col("orders_per_year") >= 4, 17)
            .when(col("orders_per_year") >= 2, 13)
            .when(col("orders_per_year") >= 1, 8)
            .otherwise(4))
    val growth =
      when(col("combined_growth_trend") === "Growing", 20)
        .when(col("combined_growth_trend") === "New Customer", 15)
        .when(col("combined_growth_trend") === "Stable", 10)
        .when(col("combined_growth_trend") === "Declining", 5)
        .otherwise(0)
    val revenueC =
      when(col("revenue_percentile") >= 0.9, 10)
        .when(col("revenue_percentile") >= 0.75, 8)
        .when(col("revenue_percentile") >= 0.5, 6)
        .when(col("revenue_percentile") >= 0.25, 4)
        .otherwise(2)
    val engagement =
      when(col("engagement_level") === "High Engagement", 10)
        .when(col("engagement_level") === "Medium Engagement", 7)
        .when(col("engagement_level") === "Low Engagement", 3)
        .otherwise(0)
    metrics
      .withColumn("health_score",
        least(lit(100),
          recency + frequency + growth + revenueC + engagement).cast("int"))
      .withColumn("health_category",
        when(col("health_score") >= 80, "Excellent Health")
          .when(col("health_score") >= 60, "Good Health")
          .when(col("health_score") >= 40, "Fair Health")
          .when(col("health_score") >= 20, "Poor Health")
          .otherwise("Critical Health"))
      .withColumn("at_risk_flag",
        when(col("days_since_last_order") > 365, true)
          .when(col("growth_trend_direction") === "Lost Customer", true)
          .when(col("orders_last_year") === 0 &&
            col("orders_prior_year") > 0, true)
          .otherwise(false))
      .withColumn("growth_opportunity_flag",
        when(col("growth_trend_direction") === "Growing" &&
          col("health_score") >= 70, true)
          .when(col("engagement_level") === "High Engagement", true)
          .when(col("orders_per_year") >= 6 &&
            col("avg_order_value") > 1000, true)
          .otherwise(false))
  }

  /** mart_company_period_metrics (mart_company_period_metrics.sql:20-209)
    * — the reference's row-per-period contract: one row per
    * (corporate company, trailing period ∈ {7d, 30d, 90d, 1y, all})
    * with activity in it. The reference UNION-ALLs five grouped scans;
    * here the five period tags are exploded onto each order row and
    * aggregated in ONE hash aggregate (same rows out, one shuffle). */
  def companyPeriodMetrics(companyOrders: DataFrame,
                           fctCompanies: DataFrame,
                           asOfDate: String): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    // Company attributes are functionally dependent on the domain key —
    // aggregate by (key, period) ONLY and join the corporate-company
    // projection back afterward (broadcast-sized), instead of dragging
    // 10 attribute columns through the 5-way period explode AND the
    // countDistinct Expand (which doubles the exploded rows).
    val corporate = fctCompanies.filter(col("is_corporate"))
      .select(col("company_domain_key"), col("company_name"),
        col("domain_type"), col("business_size_category"),
        col("total_revenue").as("lifetime_total_revenue"),
        col("total_orders").as("lifetime_total_orders"),
        col("customer_count").as("lifetime_customer_count"),
        col("revenue_category").as("lifetime_revenue_category"),
        col("has_revenue"), col("is_multi_location"),
        col("is_corporate"))
    val base = companyOrders
      .filter(col("order_amount").isNotNull && col("order_amount") > 0 &&
        col("order_date").isNotNull)
      .join(broadcast(corporate.select(col("company_domain_key"))),
        Seq("company_domain_key"))
    val withPeriods = base.withColumn("period_type",
      explode(array(lit("trailing_7d"), lit("trailing_30d"),
        lit("trailing_90d"), lit("trailing_1y"), lit("all_time"))))
    val periodDays = Map("trailing_7d" -> 7, "trailing_30d" -> 30,
      "trailing_90d" -> 90, "trailing_1y" -> 365)
    val inPeriod = periodDays.foldLeft(lit(true)) { case (acc, (p, days)) =>
      when(col("period_type") === p,
        col("order_date") >= date_sub(asOf, days)).otherwise(acc)
    }
    withPeriods
      .groupBy(col("company_domain_key"), col("period_type"))
      .agg(
        dsum(when(inPeriod, col("order_amount")).otherwise(0))
          .as("total_revenue"),
        sum(when(inPeriod, 1).otherwise(0)).as("total_orders"),
        countDistinct(when(inPeriod, col("customer_name")))
          .as("customer_count"),
        min(when(inPeriod, col("order_date"))).as("first_order_date"),
        max(when(inPeriod, col("order_date"))).as("latest_order_date"))
      .filter(col("total_revenue") > 0 || col("total_orders") > 0)
      .join(broadcast(corporate), Seq("company_domain_key"))
      .withColumn("period_activity_status",
        when(col("latest_order_date") >= date_sub(asOf, 30),
          "Recent Activity (30d)")
          .when(col("latest_order_date") >= date_sub(asOf, 90),
            "Active (90d)")
          .when(col("latest_order_date") >= date_sub(asOf, 365),
            "Past Year Activity")
          .otherwise("Historical Activity"))
      .withColumn("period_revenue_category",
        when(col("total_revenue") >= 50000, "High Revenue ($50K+)")
          .when(col("total_revenue") >= 10000,
            "Medium Revenue ($10K-$50K)")
          .when(col("total_revenue") >= 2500, "Low Revenue ($2.5K-$10K)")
          .when(col("total_revenue") > 0, "Minimal Revenue (<$2.5K)")
          .otherwise("No Period Revenue"))
      .withColumn("period_share_of_lifetime_revenue",
        when(col("lifetime_total_revenue") > 0 &&
          col("total_revenue").isNotNull,
          least(lit(100.0), round(col("total_revenue") * 100.0 /
            col("lifetime_total_revenue"), 2)))
          .when(col("total_revenue") > 0, 100.0)
          .otherwise(0.0))
      .withColumn("days_since_latest_order",
        when(col("latest_order_date").isNotNull,
          greatest(lit(0), datediff(asOf, col("latest_order_date")))))
  }

  /** base_fct_orders_current (base_fct_orders_current.sql): fct_orders
    * minus future-dated rows — a view in the reference; same filter
    * pushdown-friendly predicate here. */
  def baseFctOrdersCurrent(fctOrders: DataFrame,
                           asOfDate: String): DataFrame =
    fctOrders.filter(col("order_date") <= to_date(lit(asOfDate)))

  /** mart_product_margin_analytics
    * (mart_product_margin_analytics.sql:12-241): daily + monthly margin
    * aggregates per SKU, UNION ALL with a time_period tag (A13
    * two-grain family). Volume-weighted percentages computed from the
    * aggregated sums. */
  def productMarginAnalytics(fctLineItems: DataFrame): DataFrame = {
    val base = fctLineItems
      .filter(col("product_service").isNotNull &&
        trim(col("product_service")) =!= "" &&
        col("order_date").isNotNull && col("actual_unit_price") > 0)
      .withColumn("line_total_margin_amount",
        when(col("actual_margin_amount").isNotNull &&
          col("product_service_quantity").isNotNull,
          col("actual_margin_amount") * col("product_service_quantity")))
    // The two COUNT(DISTINCT ...) are aggregated APART from the wide
    // decimal battery and joined back at output grain (r17, wave-M2
    // ceiling): planned together, RewriteDistinctAggregates EXPANDS
    // every input row ×3 (one replica per distinct column + one for
    // the regular aggregates) through the full-width row of 13
    // DECIMAL(38,6) buffers — and because the distinct columns keep
    // per-partition combos ≈ input rows, the partial aggregate can't
    // shrink the exchange. Split, the decimal battery shuffles once at
    // its real grain and the distinct pair shuffles a (keys, customer,
    // order_number) projection; the join runs at OUTPUT grain
    // (sku×period, orders of magnitude under line grain) and is
    // null-safe because product_family/material_type/is_kit are
    // nullable dimensions. Values are identical by construction —
    // same rows, same aggregates, regrouped.
    def grainAgg(df: DataFrame, keys: Seq[Column]): DataFrame = {
      val nd = grainAggNonDistinct(df, keys)
      val dd = df.groupBy(keys: _*)
        .agg(countDistinct(col("customer")).as("unique_customers"),
          countDistinct(col("order_number")).as("unique_orders"))
      val keyNames = nd.columns.take(keys.length)
      // resolve through the DataFrames' own apply, not col("nd.<name>")
      // string paths: an unaliased expression key would get an
      // auto-generated name with dots/parens that col() cannot parse
      // (r17 ADVICE).
      val joined = nd.join(dd,
        keyNames.map(n => nd(n) <=> dd(n)).reduce(_ && _))
      // original column order: keys, transaction_count, the two
      // distinct counts, then the decimal battery
      val ndCols = nd.columns.map(nd(_))
      joined.select(
        (ndCols.take(keys.length + 1) ++
          Seq(dd("unique_customers"), dd("unique_orders")) ++
          ndCols.drop(keys.length + 1)): _*)
    }
    def grainAggNonDistinct(df: DataFrame, keys: Seq[Column]): DataFrame =
      df.groupBy(keys: _*)
        .agg(
          count(lit(1)).as("transaction_count"),
          dsum(col("product_service_quantity")).as("total_quantity_sold"),
          dsum(col("total_units_sold")).as("total_units_sold"),
          dsum(col("line_amount")).as("total_revenue"),
          davg(col("actual_unit_price")).as("avg_unit_price"),
          davg(col("standard_sales_price")).as("avg_standard_price"),
          davg(col("standard_purchase_cost")).as("avg_purchase_cost"),
          davg(col("standard_margin_percentage"))
            .as("avg_standard_margin_percentage"),
          dsum(col("line_total_margin_amount")).as("total_margin_amount"),
          davg(col("actual_margin_amount")).as("avg_unit_margin_amount"),
          davg(col("actual_margin_percentage"))
            .as("avg_margin_percentage"),
          dsum(col("price_discount_amount") *
            col("product_service_quantity")).as("total_discount_amount"),
          dsum(col("actual_unit_price") * col("product_service_quantity"))
            .as("actual_volume_revenue"),
          dsum(col("standard_sales_price") *
            col("product_service_quantity")).as("standard_volume_revenue"))
        .withColumn("volume_weighted_margin_percentage",
          when(col("total_revenue") > 0,
            round(col("total_margin_amount") / col("total_revenue") * 100,
              2)))
        .withColumn("volume_weighted_discount_percentage",
          when(col("standard_volume_revenue") > 0,
            round((lit(1) - col("actual_volume_revenue") /
              col("standard_volume_revenue")) * 100, 2)))
        .drop("actual_volume_revenue", "standard_volume_revenue")
    val daily = grainAgg(base.withColumn("period_date", col("order_date")),
      Seq(col("product_service").as("sku"), col("period_date"),
        col("product_family"), col("material_type"), col("is_kit")))
      .withColumn("time_period", lit("daily"))
      .withColumn("order_date", col("period_date"))
      .withColumn("order_month",
        date_trunc("month", col("period_date")).cast("date"))
      .withColumn("order_year",
        date_trunc("year", col("period_date")).cast("date"))
    val monthly = grainAgg(
      base.withColumn("period_date",
        date_trunc("month", col("order_date")).cast("date")),
      Seq(col("product_service").as("sku"), col("period_date"),
        col("product_family"), col("material_type"), col("is_kit")))
      .withColumn("time_period", lit("monthly"))
      .withColumn("order_date", lit(null).cast("date"))
      .withColumn("order_month", col("period_date"))
      .withColumn("order_year",
        date_trunc("year", col("period_date")).cast("date"))
    daily.unionByName(monthly)
  }
}
