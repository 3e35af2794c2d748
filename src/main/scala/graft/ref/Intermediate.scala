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
    // Optional columns (int_quickbooks__orders.sql:27-74) may be absent
    // on thin raws; MAX(NULL) pads them when Staging nulled them out.
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
        bool_or(coalesce(col("is_tax_exempt"), lit(false)))
          .as("is_tax_exempt"),
        graft.functions.Det.dsum(col("line_amount")).as("order_amount"),
        max(col("total_amount")).as("total_amount"),
        count(lit(1)).as("line_count"),
        // Reference surface (int_quickbooks__orders.sql:27-79)
        max(col("due_date")).as("due_date"),
        max(col("customer_sales_tax_code")).as("customer_sales_tax_code"),
        max(col("total_tax")).as("total_tax"),
        max(col("billing_address_line_1")).as("billing_address_line_1"),
        max(col("billing_address_line_2")).as("billing_address_line_2"),
        max(col("billing_address_line_3")).as("billing_address_line_3"),
        max(col("billing_city")).as("billing_address_city"),
        max(col("billing_state")).as("billing_address_state"),
        max(col("billing_address_postal_code"))
          .as("billing_address_postal_code"),
        max(col("billing_country")).as("billing_address_country_raw"),
        max(col("shipping_address_line_1")).as("shipping_address_line_1"),
        max(col("shipping_address_line_2")).as("shipping_address_line_2"),
        max(col("shipping_address_line_3")).as("shipping_address_line_3"),
        max(col("shipping_address_city")).as("shipping_address_city"),
        max(col("shipping_address_state")).as("shipping_address_state"),
        max(col("shipping_address_postal_code"))
          .as("shipping_address_postal_code"),
        max(col("shipping_address_country"))
          .as("shipping_address_country_raw"),
        max(col("shipping_method")).as("shipping_method"),
        max(col("ship_date")).as("ship_date"),
        max(col("memo")).as("memo"),
        max(col("message_to_customer")).as("message_to_customer"),
        max(col("currency")).as("currency"),
        max(col("exchange_rate")).as("exchange_rate"),
        max(col("transaction_id")).as("transaction_id"),
        max(col("quickbooks_internal_id")).as("quickbooks_internal_id"),
        max(col("external_id")).as("external_id"),
        max(col("created_date")).as("created_date"),
        max(col("modified_date")).as("modified_date"),
        graft.functions.Det.dsum(col("product_service_amount"))
          .as("total_line_items_amount"),
        count(lit(1)).as("item_count"))
    rolled
      // Country macro family over the rolled-up raw address fields
      // (int_quickbooks__orders.sql:86-103). The macro's billing
      // inference never returns NULL, so primary == billing (see
      // Fns.countryCategory scaladoc).
      .withColumn("billing_address_country",
        Fns.normalizeCountry(col("billing_address_country_raw"),
          col("billing_address_state")))
      .withColumn("shipping_address_country",
        Fns.normalizeCountry(col("shipping_address_country_raw"),
          col("shipping_address_state")))
      .withColumn("primary_country",
        Fns.normalizeCountry(col("billing_address_country_raw"),
          col("billing_address_state")))
      .withColumn("country_category",
        Fns.countryCategory(col("primary_country")))
      .withColumn("region", Fns.regionOf(col("primary_country")))
      // Null-critical-field filter (int_quickbooks__orders.sql:163-170)
      .filter(col("order_date").isNotNull && col("total_amount").isNotNull &&
        col("order_number").isNotNull && trim(col("order_number")) =!= "")
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

  /** int_quickbooks__material_type (int_quickbooks__material_type.sql):
    * W1 dedup to latest snapshot per item, then the pattern-match CASE
    * assigning a material type from the item code. */
  def materialType(stagedItems: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("item_name"))
      .orderBy(col("load_date").desc, col("snapshot_date").desc)
    val stainless = Seq("01-6318.7SK", "01-6315.3SK", "01-6315.3SK-2",
      "01-6358.5SK", "01-6358.5SK-2")
    val adhesives = Seq("82-5002.K", "82-5002.010", "82-6002")
    val plastic = Seq("01-7014", "01-7014-FBA", "01-7625.L")
    val zincMisc = Seq("01-7011.PST", "01-7010-FBA", "01-7010", "01-7013")
    stagedItems
      .filter(col("item_name").isNotNull && col("item_name") =!= "")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("item_name"), col("sales_description"),
        when(col("item_name").isin(stainless: _*), "Stainless Steel")
          .when(col("item_name").startsWith("01-63") &&
            !col("item_name").endsWith("-D"), "Zinc Plated")
          .when(col("item_name").endsWith("-D"), "Dacromet")
          .when(col("item_name").isin(adhesives: _*), "Adhesives")
          .when(col("item_name").isin(plastic: _*), "Plastic")
          .when(col("item_name").isin(zincMisc: _*), "Zinc Plated")
          .when(col("item_name").startsWith("01-8003"), "Tools")
          .otherwise("Uncategorized").as("material_type"))
  }

  /** int_quickbooks__item_kits (int_quickbooks__item_kits.sql): W1 dedup
    * then the kit-pattern CASE. */
  def itemKits(stagedItems: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("item_name"))
      .orderBy(col("load_date").desc, col("snapshot_date").desc)
    val kitList = Seq("01-7010-FBA", "01-7013.FBA", "01-7014-FBA",
      "71-7010.MST", "01-7010", "01-7013", "01-7014")
    stagedItems
      .filter(col("item_name").isNotNull && col("item_name") =!= "")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("item_name"), col("item_type"),
        (col("item_name").contains("AK4") ||
          col("item_name").contains("AK-4") ||
          col("item_name").isin(kitList: _*)).as("is_kit"))
  }

  /** int_quickbooks__product_family (int_quickbooks__product_family.sql):
    * W1 dedup then the branded SP10/SP12/…/Adhesives taxonomy from
    * item-code and description patterns. (itemsEnriched keeps the
    * numeric prefix family for the line-item queries; this model is
    * the reference's branded taxonomy.) */
  def productFamily(stagedItems: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("item_name"))
      .orderBy(col("load_date").desc, col("snapshot_date").desc)
    val n = col("item_name")
    val d = coalesce(col("sales_description"), lit(""))
    stagedItems
      .filter(n.isNotNull && n =!= "")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(n.as("item_name"), col("sales_description"),
        when(n.startsWith("01-6310") ||
          n.isin("01-7010-FBA", "01-7013.FBA", "01-7010", "01-7013"),
          "SP10")
          .when(n.startsWith("01-6315"), "SP12")
          .when(n.startsWith("01-6318"), "SP18")
          .when(n.startsWith("01-6358"), "SP58")
          .when(n.startsWith("01-7625") ||
            n.isin("01-7014-FBA", "71-7010.MST", "01-7014"), "AM625")
          .when(n.contains("AK4") || n.contains("AK-4"), "Kits")
          .when(n.startsWith("82-5002") || n.startsWith("82-6002") ||
            n.startsWith("82-6005") || d.contains("EPX2") ||
            d.contains("EPX3") || d.contains("EPX5"), "Adhesives")
          .when(n.startsWith("83-10") || n.startsWith("49-800") ||
            n.isin("01-5390", "82-6002.N", "46-3001"), "Accessories")
          .otherwise("Uncategorized").as("product_family"))
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
        graft.functions.Det.dsum(col("current_balance"))
          .as("total_balance"),
        graft.functions.Det.dsum(coalesce(col("total_revenue"), lit(0.0)))
          .as("total_revenue"),
        sum(coalesce(col("order_count"), lit(0L))).as("total_orders"),
        min(col("first_order_date")).as("first_order_date"),
        max(col("last_order_date")).as("latest_order_date"),
        substring(array_join(sort_array(
          collect_set(col("normalized_customer_name"))), " | "), 1, 500)
          .as("all_customer_names"))
      // Business/revenue classification + activity flags
      // (int_quickbooks__company_consolidation.sql:144-198). The
      // domain_type is recoverable from the key shape (Fns.domainType).
      .withColumn("domain_type",
        Fns.domainType(col("company_domain_key")))
      .withColumn("business_size_category",
        when(col("domain_type") === "individual", "Individual Customer")
          .when(col("customer_count") === 1, "Single Location")
          .when(col("customer_count").between(2, 5), "Small Multi-Location")
          .when(col("customer_count").between(6, 20),
            "Medium Multi-Location")
          .otherwise("Large Multi-Location"))
      .withColumn("revenue_category",
        when(col("total_revenue") >= 100000, "High Value ($100K+)")
          .when(col("total_revenue") >= 25000, "Medium Value ($25K-$100K)")
          .when(col("total_revenue") >= 5000, "Growing Value ($5K-$25K)")
          .when(col("total_revenue") > 0, "Low Value (<$5K)")
          .otherwise("No Revenue"))
      .withColumn("has_revenue", col("total_revenue") > 0)
      .withColumn("is_multi_location", col("customer_count") > 1)
      .withColumn("is_corporate", col("domain_type") === "corporate")
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
