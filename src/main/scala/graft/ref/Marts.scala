package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mart layer — the dashboard-facing fct and dim tables. */
object Marts {

  /** fct_orders (fct_orders.sql:23-86,206-207): order grain + optional
    * Shopify enrichment (existence-guarded left join) + primary-contact
    * join. Guards are plan-construction decisions, not runtime lookups
    * (SURVEY §3.2 wrinkle #1). */
  def fctOrders(orders: DataFrame,
                shopifyEnrichment: Option[DataFrame]): DataFrame = {
    val enriched = shopifyEnrichment match {
      case Some(sh) =>
        orders.join(
          sh.select(col("order_number"),
            col("fulfillment_status"), col("tracking_number")),
          Seq("order_number"), "left")
      case None =>
        orders
          .withColumn("fulfillment_status", lit(null).cast("string"))
          .withColumn("tracking_number", lit(null).cast("string"))
    }
    enriched
  }

  /** fct_products: enriched items at item grain. */
  def fctProducts(itemsEnriched: DataFrame): DataFrame =
    itemsEnriched.select(
      col("item_name").as("product_name"),
      col("item_id").as("product_id"),
      col("item_type"), col("product_family"), col("is_kit"),
      col("is_master_pack"), col("carton_count"),
      col("sales_price"), col("purchase_cost"), col("margin_pct"),
      col("quantity_on_hand"), col("status"))

  /** fct_order_line_items (fct_order_line_items.sql:118-220): typed line
    * items ⋈ products (broadcast J6) with margin/discount calcs. */
  def fctOrderLineItems(typedItems: DataFrame,
                        fctProducts: DataFrame): DataFrame =
    typedItems
      .join(broadcast(fctProducts
        .select(col("product_name").as("product_service"),
          col("product_family"), col("is_kit"),
          col("sales_price").as("list_price"),
          col("purchase_cost"))),
        Seq("product_service"), "left")
      .withColumn("margin_amount",
        when(col("purchase_cost").isNotNull,
          col("line_amount") -
            col("purchase_cost") * col("product_service_quantity")))
      .withColumn("discount_pct",
        when(col("list_price") > 0 && col("product_service_rate") > 0,
          round((lit(1) - col("product_service_rate") / col("list_price"))
            * 100, 2)))

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
      .join(bridge, Seq("customer"))
      .groupBy(col("company_domain_key"), col("order_number"))
      .agg(
        max(col("order_date")).as("order_date"),
        count(lit(1)).as("line_count"),
        sum(col("line_amount")).as("order_amount"),
        countDistinct(col("product_service")).as("distinct_products"),
        array_join(sort_array(collect_set(col("product_family"))), " | ")
          .as("product_families"),
        sum(when(coalesce(col("is_kit"), lit(false)),
          col("line_amount")).otherwise(0)).as("kit_amount"),
        avg(col("margin_amount")).as("avg_margin"))

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
      .agg(sum(col("order_amount")).as("amount"),
        max(col("days_outstanding")).as("days_outstanding"))
      .withColumn("analysis_level", lit("customer"))
    val byBucket = open.groupBy(col("aging_bucket"))
      .agg(sum(col("order_amount")).as("amount"),
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
      .agg(sum(col("order_amount")).as("total_ar"))
    val periods = Seq(30, 60, 90).map { days =>
      orders
        .filter(col("order_date") > date_sub(asOf, days))
        .agg((sum(col("order_amount")) / days).as("daily_sales"))
        .withColumn("period_days", lit(days))
    }.reduce(_ unionByName _)
    periods.crossJoin(broadcast(ar))
      .withColumn("dso",
        when(col("daily_sales") > 0,
          round(col("total_ar") / col("daily_sales"), 2)))
      .select("period_days", "daily_sales", "total_ar", "dso")
  }

  /** mart_company_period_metrics (mart_company_period_metrics.sql:34-135):
    * trailing-window conditional aggregation (A7) per company. */
  def companyPeriodMetrics(companyOrders: DataFrame,
                           asOfDate: String): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    def inWindow(days: Int) = col("order_date") >= date_sub(asOf, days)
    companyOrders.groupBy(col("company_domain_key"))
      .agg(
        sum(when(inWindow(30), col("order_amount")).otherwise(0))
          .as("revenue_30d"),
        sum(when(inWindow(90), col("order_amount")).otherwise(0))
          .as("revenue_90d"),
        sum(when(inWindow(365), col("order_amount")).otherwise(0))
          .as("revenue_1y"),
        sum(col("order_amount")).as("revenue_all_time"),
        count(lit(1)).as("orders_all_time"),
        max(col("order_date")).as("last_order_date"))
  }
}
