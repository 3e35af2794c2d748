package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** Intermediate layer — the rollups and consolidation models between
  * staging and the marts.
  */
object Intermediate {

  /** int_quickbooks__orders (int_quickbooks__orders.sql:14-83,112-157):
    * line items → one row per order (A1 rollup), plus sales-channel and
    * customer-segment attribution CASEs. Channel rules: S-prefixed
    * credit-card invoices are Webgility/Shopify website orders
    * (tests/test_webgility_shopify_orders_classified_as_website.sql:3-14),
    * Amazon-classed orders are Amazon, remaining invoices are Invoice.
    * Segment from the order's class (OEM/Distributor/EXPORT). */
  def orders(typedItems: DataFrame): DataFrame = {
    val rolled = typedItems
      .groupBy(col("order_number"))
      .agg(
        max(col("order_date")).as("order_date"),
        max(col("customer")).as("customer"),
        max(col("order_status")).as("order_status"),
        max(col("payment_method")).as("payment_method"),
        max(col("terms")).as("terms"),
        max(col("class")).as("order_class"),
        max(col("sales_rep")).as("sales_rep"),
        max(col("source_type")).as("source_type"),
        max(col("billing_country")).as("billing_country"),
        bool_or(coalesce(col("is_tax_exempt"), lit(false)))
          .as("any_tax_exempt"),
        sum(col("line_amount")).as("order_amount"),
        max(col("total_amount")).as("total_amount"),
        count(lit(1)).as("line_count"))
    rolled
      .withColumn("sales_channel",
        when(upper(coalesce(col("order_class"), lit("")))
          .contains("AMAZON"), "Amazon")
          .when(col("order_number").startsWith("S-") &&
            upper(coalesce(col("terms"), lit(""))) === "CREDIT CARD",
            "Website")
          .when(col("source_type") === "sales_receipt" &&
            upper(coalesce(col("payment_method"), lit("")))
              .isin("CREDIT CARD", "PAYPAL"), "Website")
          .when(col("source_type") === "invoice", "Invoice")
          .otherwise("Other"))
      .withColumn("customer_segment",
        when(upper(coalesce(col("order_class"), lit("")))
          .contains("OEM"), "OEM")
          .when(upper(coalesce(col("order_class"), lit("")))
            .contains("DISTRIBUTOR"), "Distributor")
          .when(upper(coalesce(col("order_class"), lit("")))
            .contains("EXPORT"), "Export")
          .otherwise("Direct"))
  }

  /** int_quickbooks__customer_revenue
    * (int_quickbooks__customer_revenue.sql:11-24). */
  def customerRevenue(orders: DataFrame): DataFrame =
    orders.groupBy(col("customer"))
      .agg(
        sum(col("order_amount")).as("total_revenue"),
        countDistinct(col("order_number")).as("order_count"),
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("last_order_date"),
        countDistinct(col("order_date")).as("active_days"))

  /** int_quickbooks__items_enriched
    * (int_quickbooks__items_enriched.sql:13-27,30-167): W1 dedup to the
    * latest snapshot per item, then regex enrichment — product family
    * from the item-code prefix, kit/master-pack flags from suffixes,
    * carton count parsed out of the sales description
    * ("72 anchors per carton" → 72). */
  def itemsEnriched(stagedItems: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("item_name"))
      .orderBy(col("load_date").desc, col("snapshot_date").desc)
    stagedItems
      .filter(col("item_name").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("product_family",
        regexp_extract(col("item_name"), "^([0-9]{2})-", 1))
      .withColumn("is_kit",
        col("item_name").rlike("(?i)(\\.3SK|-KIT)$"))
      .withColumn("is_master_pack", col("item_name").rlike("\\.MST$"))
      .withColumn("carton_count",
        when(regexp_extract(col("sales_description"),
          "(?i)([0-9]+)\\s+(?:anchors?|pieces?|units?)\\s+per\\s+carton",
          1) =!= "",
          regexp_extract(col("sales_description"),
            "(?i)([0-9]+)\\s+(?:anchors?|pieces?|units?)\\s+per\\s+carton",
            1).cast("int")))
      .withColumn("margin_pct",
        when(col("sales_price") > 0,
          round((col("sales_price") - col("purchase_cost"))
            / col("sales_price") * 100, 2)))
  }

  /** int_quickbooks__customer_company_mapping
    * (int_quickbooks__customer_company_mapping.sql:73-97): customers ⋈
    * domain_mapping (main + cc) ⋈ name_mapping, all broadcast left
    * joins (J1/J2); company key prefers the normalized main domain,
    * falls back to cc domain, then normalized name. */
  def customerCompanyMapping(stagedCustomers: DataFrame,
                             domainMapping: DataFrame,
                             nameMapping: DataFrame): DataFrame = {
    val mainDom = domainMapping.select(
      col("original_domain").as("main_domain"),
      col("normalized_domain").as("main_normalized"),
      col("domain_type").as("main_domain_type"))
    val ccDom = domainMapping.select(
      col("original_domain").as("cc_domain"),
      col("normalized_domain").as("cc_normalized"))
    val names = nameMapping.select(
      col("original_name").as("customer_name"),
      col("normalized_name"))
    stagedCustomers
      .withColumn("main_domain",
        Fns.emailPrimaryDomain(col("main_email")))
      .withColumn("cc_domain", Fns.emailPrimaryDomain(col("cc_email")))
      .join(broadcast(mainDom), Seq("main_domain"), "left")
      .join(broadcast(ccDom), Seq("cc_domain"), "left")
      .join(broadcast(names), Seq("customer_name"), "left")
      .withColumn("company_domain_key",
        when(col("main_normalized").isNotNull &&
          col("main_domain_type") === "corporate", col("main_normalized"))
          .when(col("cc_normalized").isNotNull, col("cc_normalized"))
          .otherwise(coalesce(col("normalized_name"),
            col("normalized_customer_name"))))
  }

  /** int_quickbooks__company_consolidation
    * (int_quickbooks__company_consolidation.sql:26-136): representative
    * attributes via FIRST_VALUE over a fully-ordered window (W2),
    * domain-level aggregates with sorted STRING_AGG (A3), MODE country
    * (A4, deterministic tie-break). */
  def companyConsolidation(mapping: DataFrame,
                           revenue: DataFrame): DataFrame = {
    // Orders carry the raw customer name string; the mapping's
    // customer_name is that same raw name (J3 joins by customer name,
    // int_quickbooks__company_consolidation.sql:18-20).
    val withRev = mapping.join(
      revenue.withColumnRenamed("customer", "customer_name"),
      Seq("customer_name"), "left")
    val w = Window.partitionBy(col("company_domain_key"))
      .orderBy(length(col("normalized_customer_name")).desc,
        col("current_balance").desc_nulls_last, col("customer_id"))
    val rep = withRev
      .withColumn("company_name",
        first(col("normalized_customer_name")).over(w))
      .withColumn("rep_customer_id", first(col("customer_id")).over(w))
    val aggs = rep.groupBy(col("company_domain_key"))
      .agg(
        max(col("company_name")).as("company_name"),
        max(col("rep_customer_id")).as("rep_customer_id"),
        count(lit(1)).as("customer_count"),
        countDistinct(col("customer_id")).as("distinct_customer_count"),
        sum(col("current_balance")).as("total_balance"),
        sum(coalesce(col("total_revenue"), lit(0.0))).as("total_revenue"),
        substring(array_join(sort_array(
          collect_set(col("normalized_customer_name"))), " | "), 1, 500)
          .as("all_customer_names"))
    // MODE() WITHIN GROUP country: deterministic argmax via pre-count
    val countryCounts = rep
      .filter(col("billing_country").isNotNull)
      .groupBy(col("company_domain_key"), col("billing_country")).count()
    val cw = Window.partitionBy(col("company_domain_key"))
      .orderBy(col("count").desc, col("billing_country"))
    val modeCountry = countryCounts
      .withColumn("crn", row_number().over(cw)).filter(col("crn") === 1)
      .select(col("company_domain_key"),
        col("billing_country").as("primary_country"))
    aggs.join(modeCountry, Seq("company_domain_key"), "left")
  }
}
