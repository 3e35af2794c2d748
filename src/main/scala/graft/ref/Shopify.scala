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
    * order key, money casts, status normalization, test-order filter. */
  def orders(raw: DataFrame): DataFrame =
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
        col("source_name"), col("_dlt_id"))

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

  /** Fulfillment child rows collapsed to order grain (A5,
    * int_shopify__orders_enriched.sql:13-21), joined back (J9), plus the
    * reference's derived enrichment fields — acquisition_channel,
    * has_discount, has_tracking
    * (int_shopify__orders_enriched.sql:46-70). */
  def ordersEnriched(stagedOrders: DataFrame,
                     fulfillments: DataFrame,
                     attribution: DataFrame): DataFrame = {
    val fulfillAgg =
      if (fulfillments.columns.contains("_dlt_parent_id")) {
        val hasCompany = fulfillments.columns.contains("tracking_company")
        fulfillments
          .groupBy(col("_dlt_parent_id").as("_dlt_id"))
          .agg(
            max(col("status")).as("fulfillment_latest_status"),
            max(col("tracking_number")).as("tracking_number"),
            (if (hasCompany) max(col("tracking_company"))
             else max(lit(null).cast("string"))).as("tracking_company"),
            max(to_timestamp(col("created_at"))).as("fulfilled_at"))
      } else // fulfillment source absent: null-padded order-grain shell
        stagedOrders.select(col("_dlt_id"),
          lit(null).cast("string").as("fulfillment_latest_status"),
          lit(null).cast("string").as("tracking_number"),
          lit(null).cast("string").as("tracking_company"),
          lit(null).cast("timestamp").as("fulfilled_at")).limit(0)
    val ref = lower(coalesce(col("referrer"), lit("")))
    stagedOrders
      .join(fulfillAgg, Seq("_dlt_id"), "left")
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
