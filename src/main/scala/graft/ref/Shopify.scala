package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Shopify staging + intermediate models (SURVEY P11–P15, A5, J8–J9):
  * landed REST payloads → staged orders/attribution/fulfillments →
  * enriched orders → unified QuickBooks order matching.
  */
object Shopify {

  /** stg_shopify__orders (stg_shopify__orders.sql:10-66): 'S-'-prefixed
    * order key, money casts, status normalization, test-order filter.
    * Marketing columns (customer id, tax, consent, user agent) are
    * optional on thin raws. */
  def orders(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{StringType, LongType, BooleanType,
      DoubleType}
    def opt(n: String, t: org.apache.spark.sql.types.DataType) =
      Fns.firstExistingColumnOrNull(raw, Seq(n), t)
    raw
      .filter(!coalesce(col("test"), lit(false)))
      .select(
        col("id").as("shopify_order_id"),
        concat(lit("S-"), col("order_number").cast("string"))
          .as("order_number"),
        to_timestamp(col("created_at")).as("created_at"),
        Fns.safeNumeric(col("total_price")).as("total_price"),
        Fns.safeNumeric(col("subtotal_price")).as("subtotal_price"),
        Fns.safeNumeric(col("total_discounts")).as("total_discounts"),
        upper(col("financial_status")).as("financial_status"),
        coalesce(Fns.nullifBlank(col("fulfillment_status")),
          lit("UNFULFILLED")).as("fulfillment_status"),
        col("email"), col("landing_site"), col("referring_site"),
        col("source_name"), col("_dlt_id"),
        opt("customer_id", LongType).cast("long").as("customer_id"),
        (if (raw.columns.contains("total_tax"))
          Fns.safeNumeric(col("total_tax"))
        else lit(null).cast(DoubleType)).as("total_tax"),
        (if (raw.columns.contains("shipping_amount"))
          Fns.safeNumeric(col("shipping_amount"))
        else lit(null).cast(DoubleType)).as("shipping_amount"),
        opt("buyer_accepts_marketing", BooleanType).cast("boolean")
          .as("buyer_accepts_marketing"),
        opt("user_agent", StringType).as("user_agent"))
  }

  /** stg_shopify__customers (stg_shopify__customers.sql:9-46, P13):
    * identity, marketing-consent and default-address flatten. */
  def customers(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("customer_id"),
      Fns.nullifBlank(col("email")).as("email"),
      Fns.nullifBlank(col("first_name")).as("first_name"),
      Fns.nullifBlank(col("last_name")).as("last_name"),
      Fns.nullifBlank(col("phone")).as("phone"),
      col("email_marketing_consent__state").as("email_marketing_status"),
      col("email_marketing_consent__opt_in_level")
        .as("email_opt_in_level"),
      to_timestamp(Fns.nullifBlank(
        col("email_marketing_consent__consent_updated_at")))
        .as("email_consent_date"),
      col("sms_marketing_consent__state").as("sms_marketing_status"),
      col("verified_email"),
      col("orders_count"),
      Fns.safeNumeric(col("total_spent")).as("total_spent"),
      Fns.nullifBlank(col("default_address__company")).as("company_name"),
      Fns.nullifBlank(col("default_address__address1")).as("address_line1"),
      Fns.nullifBlank(col("default_address__city")).as("city"),
      Fns.nullifBlank(col("default_address__province_code"))
        .as("state_code"),
      Fns.nullifBlank(col("default_address__zip")).as("postal_code"),
      Fns.nullifBlank(col("default_address__country_code"))
        .as("country_code"),
      col("created_at"), col("updated_at"))

  /** stg_shopify__products (stg_shopify__products.sql:12-52, P14):
    * active products ⋈ SKU'd variants on the DLT parent id — INNER, so
    * SKU-less variants and inactive products both drop. The product
    * side is the small dim → broadcast; variants (fact-sized) never
    * shuffle. */
  def products(rawProducts: DataFrame, rawVariants: DataFrame): DataFrame = {
    val p = rawProducts
      .filter(col("status") === "active")
      .select(
        col("id").as("product_id"),
        col("title").as("product_title"),
        col("vendor"), col("product_type"),
        col("status").as("product_status"),
        col("tags"),
        col("created_at").as("product_created_at"),
        col("updated_at").as("product_updated_at"),
        col("_dlt_id").as("product_dlt_id"))
    val v = rawVariants
      .filter(col("sku").isNotNull && col("sku") =!= "")
      .select(
        col("id").as("variant_id"),
        col("title").as("variant_title"),
        col("sku"),
        Fns.safeNumeric(col("price")).as("variant_price"),
        col("inventory_quantity"),
        col("_dlt_parent_id").as("product_dlt_id"))
    v.join(broadcast(p), Seq("product_dlt_id"))
      .select(col("product_id"), col("product_title"), col("vendor"),
        col("product_type"), col("product_status"), col("tags"),
        col("variant_id"), col("variant_title"), col("sku"),
        col("variant_price"), col("inventory_quantity"))
  }

  /** int_shopify__customer_enrichment
    * (int_shopify__customer_enrichment.sql:12-52, A6): order-behavior
    * rollup per customer joined onto staged customers + consent flags. */
  def customerEnrichment(stgCustomers: DataFrame,
                         ordersEnriched: DataFrame): DataFrame = {
    val co = ordersEnriched
      .filter(col("customer_id").isNotNull)
      .groupBy(col("customer_id"))
      .agg(
        count(lit(1)).as("shopify_order_count"),
        sum(col("total_price")).as("shopify_lifetime_value"),
        sum(when(col("has_discount"), 1).otherwise(0))
          .as("discounted_order_count"),
        avg(col("total_price")).as("avg_order_value"),
        min(col("created_at")).as("first_order_date"),
        max(col("created_at")).as("last_order_date"),
        countDistinct(col("acquisition_channel")).as("channel_diversity"))
    stgCustomers
      .join(co, Seq("customer_id"), "left")
      .withColumn("shopify_order_count",
        coalesce(col("shopify_order_count"), lit(0L)))
      .withColumn("shopify_lifetime_value",
        coalesce(col("shopify_lifetime_value"), lit(0.0)))
      .withColumn("discounted_order_count",
        coalesce(col("discounted_order_count"), lit(0L)))
      .withColumn("avg_order_value",
        coalesce(col("avg_order_value"), lit(0.0)))
      .withColumn("channel_diversity",
        coalesce(col("channel_diversity"), lit(0L)))
      .withColumn("is_email_subscriber",
        coalesce(col("email_marketing_status") === "subscribed",
          lit(false)))
      .withColumn("is_sms_subscriber",
        coalesce(col("sms_marketing_status") === "subscribed", lit(false)))
  }

  /** fct_order_attribution (fct_order_attribution.sql:10-46): one row
    * per order with the complete attribution chain. */
  def fctOrderAttribution(ordersEnriched: DataFrame): DataFrame =
    ordersEnriched.select(
      col("shopify_order_id").as("order_id"),
      col("order_number"),
      col("customer_id"),
      col("created_at").cast("date").as("order_date"),
      date_trunc("month", col("created_at")).cast("date").as("order_month"),
      col("acquisition_channel"),
      coalesce(col("utm_source"), lit("organic")).as("utm_source"),
      coalesce(col("utm_medium"), lit("none")).as("utm_medium"),
      coalesce(col("utm_campaign"), lit("none")).as("utm_campaign"),
      col("landing_site"), col("referring_site"),
      col("total_price").as("revenue"),
      col("total_discounts").as("discount_amount"),
      col("shipping_amount"),
      col("total_tax").as("tax_amount"),
      col("has_discount"),
      col("buyer_accepts_marketing"),
      col("user_agent"))

  /** mart_marketing_performance (mart_marketing_performance.sql:10-36):
    * channel×source×medium×campaign monthly rollup with discount and
    * opt-in rates. */
  def martMarketingPerformance(attribution: DataFrame): DataFrame =
    attribution
      .groupBy(col("order_month"), col("acquisition_channel"),
        col("utm_source"), col("utm_medium"), col("utm_campaign"))
      .agg(
        countDistinct(col("order_id")).as("order_count"),
        countDistinct(col("customer_id")).as("customer_count"),
        sum(col("revenue")).as("total_revenue"),
        sum(col("discount_amount")).as("total_discounts"),
        avg(col("revenue")).as("avg_order_value"),
        sum(when(col("has_discount"), 1).otherwise(0))
          .as("discounted_orders"),
        round(sum(when(col("has_discount"), 1).otherwise(0)) * 100.0
          / count(lit(1)), 2).as("discount_rate"),
        sum(when(col("buyer_accepts_marketing"), 1).otherwise(0))
          .as("marketing_opt_ins"),
        round(sum(when(col("buyer_accepts_marketing"), 1).otherwise(0))
          * 100.0 / count(lit(1)), 2).as("opt_in_rate"))

  /** fct_customer_marketing (fct_customer_marketing.sql:10-56): one row
    * per customer with engagement metrics and value/recency segments.
    * CURRENT_DATE → injected asOfDate. */
  def fctCustomerMarketing(enrichment: DataFrame,
                           asOfDate: String): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    enrichment.select(
      col("customer_id"), col("email"),
      concat_ws(" ", col("first_name"), col("last_name")).as("full_name"),
      col("company_name"),
      col("is_email_subscriber"), col("is_sms_subscriber"),
      col("email_consent_date"),
      col("shopify_order_count"), col("shopify_lifetime_value"),
      col("avg_order_value"), col("discounted_order_count"),
      round(col("discounted_order_count") * 100.0 /
        nullif(col("shopify_order_count"), lit(0L)), 2)
        .as("discount_usage_rate"),
      col("first_order_date"), col("last_order_date"),
      datediff(asOf, col("last_order_date").cast("date"))
        .as("days_since_last_order"),
      when(col("shopify_lifetime_value") > 1000, "High Value")
        .when(col("shopify_lifetime_value") > 500, "Medium Value")
        .otherwise("Low Value").as("customer_segment"),
      when(datediff(asOf, col("last_order_date").cast("date")) <= 30,
        "Active")
        .when(datediff(asOf, col("last_order_date").cast("date")) <= 90,
          "At Risk")
        .otherwise("Churned").as("customer_status"))
  }

  /** stg_shopify__order_attribution
    * (stg_shopify__order_attribution.sql:9-66): landing-page path, UTM
    * extraction with '+'-decoding, own-site/shopify-pay referrer
    * nulling, checkout-page exclusion (P12). */
  def orderAttribution(stagedOrders: DataFrame, ownHost: String): DataFrame =
    stagedOrders
      .filter(col("landing_site").isNull ||
        !col("landing_site").contains("/checkout"))
      .select(
        col("shopify_order_id"), col("order_number"), col("created_at"),
        col("total_price"),
        Fns.splitPart(col("landing_site"), "?", 1).as("landing_page"),
        when(col("referring_site").contains(ownHost) ||
          col("referring_site").contains("pay.shopify.com"),
          lit(null).cast("string"))
          .otherwise(col("referring_site")).as("referrer"),
        decodeUtm(col("landing_site"), "utm_source").as("utm_source"),
        decodeUtm(col("landing_site"), "utm_medium").as("utm_medium"),
        decodeUtm(col("landing_site"), "utm_campaign").as("utm_campaign"))

  private def decodeUtm(landing: org.apache.spark.sql.Column,
                        param: String) = {
    val v = regexp_extract(landing, s"$param=([^&]*)", 1)
    when(v === "", lit(null).cast("string"))
      .otherwise(regexp_replace(v, "\\+", " "))
  }

  /** stg_shopify__order_fulfillments
    * (stg_shopify__order_fulfillments.sql:4-35, P15 staging half):
    * fulfillment child rows flattened to ROW grain with the order key
    * resolved via INNER join on the DLT parent id — the standalone
    * staged model the enriched rollup consumes. Neither side is
    * broadcast-forced: both are order-volume tables; AQE picks the
    * strategy from runtime sizes. */
  def orderFulfillments(rawFulfillments: DataFrame,
                        rawOrders: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{StringType, TimestampType}
    def opt(n: String) =
      Fns.firstExistingColumnOrNull(rawFulfillments, Seq(n), StringType)
    def optTs(n: String) =
      if (rawFulfillments.columns.contains(n))
        to_timestamp(Fns.nullifBlank(col(n)))
      else lit(null).cast(TimestampType)
    val o = rawOrders.select(col("id").as("order_id"),
      col("_dlt_id").as("order_dlt_id"))
    rawFulfillments
      .select(
        col("id").as("fulfillment_id"),
        col("_dlt_parent_id").as("order_dlt_id"),
        col("status").as("fulfillment_status"),
        opt("tracking_company").as("tracking_company"),
        opt("tracking_number").as("tracking_number"),
        opt("shipment_status").as("shipment_status"),
        to_timestamp(col("created_at")).as("fulfilled_at"),
        optTs("updated_at").as("fulfillment_updated_at"))
      .join(o, Seq("order_dlt_id"))
      .drop("order_dlt_id")
  }

  /** Staged fulfillment rows collapsed to order grain (A5,
    * int_shopify__orders_enriched.sql:13-21), joined back (J9), plus the
    * reference's derived enrichment fields — acquisition_channel,
    * has_discount, has_tracking
    * (int_shopify__orders_enriched.sql:46-70). `stagedFulfillments` is
    * the [[orderFulfillments]] model; None when the source is absent. */
  def ordersEnriched(stagedOrders: DataFrame,
                     stagedFulfillments: Option[DataFrame],
                     attribution: DataFrame): DataFrame = {
    val fulfillAgg = stagedFulfillments match {
      case Some(f) =>
        f.groupBy(col("order_id").as("shopify_order_id"))
          .agg(
            max(col("fulfillment_status")).as("fulfillment_latest_status"),
            max(col("tracking_number")).as("tracking_number"),
            max(col("tracking_company")).as("tracking_company"),
            max(col("fulfilled_at")).as("fulfilled_at"))
      case None => // fulfillment source absent: null-padded shell
        stagedOrders.select(col("shopify_order_id"),
          lit(null).cast("string").as("fulfillment_latest_status"),
          lit(null).cast("string").as("tracking_number"),
          lit(null).cast("string").as("tracking_company"),
          lit(null).cast("timestamp").as("fulfilled_at")).limit(0)
    }
    val ref = lower(coalesce(col("referrer"), lit("")))
    stagedOrders
      .join(fulfillAgg, Seq("shopify_order_id"), "left")
      .join(attribution.select(col("shopify_order_id"), col("utm_source"),
        col("utm_medium"), col("utm_campaign"), col("referrer"),
        col("landing_page")), Seq("shopify_order_id"), "left")
      .withColumn("acquisition_channel",
        when(col("utm_source").isNotNull, "Paid")
          .when(ref.contains("google") || ref.contains("bing") ||
            ref.contains("duckduckgo"), "Organic Search")
          .when(col("referrer").isNotNull, "Referral")
          .when(col("source_name") === "web", "Direct")
          .otherwise("Unknown"))
      .withColumn("has_discount",
        coalesce(col("total_discounts"), lit(0.0)) > 0)
      .withColumn("has_tracking", col("tracking_number").isNotNull)
  }

  /** int_unified__order_matching (int_unified__order_matching.sql:25-56):
    * FULL OUTER Shopify ⋈ QuickBooks on order_number with COALESCEd key,
    * match status, and amount delta (J8). */
  def orderMatching(shopifyOrders: DataFrame,
                    qbOrders: DataFrame): DataFrame = {
    val s = shopifyOrders.select(
      col("order_number").as("s_order_number"),
      col("total_price").as("shopify_amount"))
    val q = qbOrders.select(
      col("order_number").as("q_order_number"),
      col("order_amount").as("quickbooks_amount"))
    s.join(q, col("s_order_number") === col("q_order_number"),
        "full_outer")
      .select(
        coalesce(col("s_order_number"), col("q_order_number"))
          .as("order_number"),
        when(col("s_order_number").isNull, "quickbooks_only")
          .when(col("q_order_number").isNull, "shopify_only")
          .otherwise("matched").as("match_status"),
        col("shopify_amount"), col("quickbooks_amount"),
        when(col("s_order_number").isNotNull &&
          col("q_order_number").isNotNull,
          abs(col("shopify_amount") - col("quickbooks_amount")))
          .as("amount_delta"))
  }
}
