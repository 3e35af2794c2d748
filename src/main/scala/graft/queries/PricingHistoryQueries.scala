package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det._

/** Model-driven oracle for fct_product_pricing_history — the
  * reference's largest mart — run through the actual
  * `TimeSeries.pricingHistory` over line items synthesized from the
  * lineitem table (shipdate plays the order date, price×(1-discount)
  * plays the unit rate — tie-safe for the decimal casts) and snapshots
  * synthesized from part. A few part keys are renamed to
  * shipping/tax-style services to exercise the product classification
  * branch. The DuckDB twin uses ASOF JOIN for the authoritative price
  * (the reference's correlated MAX-date subquery; Spark side is the
  * J11 union+last-non-null window rewrite — all three agree).
  */
object PricingHistoryQueries {

  val a11PricingHistory: Q = Q.sql(
    "a11_pricing_history",
    s"""WITH li AS (
      |  SELECT
      |    CASE WHEN l_partkey % 53 = 0 THEN 'shipping ' || CAST(l_partkey AS VARCHAR)
      |         WHEN l_partkey % 59 = 0 THEN 'tax ' || CAST(l_partkey AS VARCHAR)
      |         ELSE 'P' || CAST(l_partkey AS VARCHAR) END AS product_service,
      |    CAST(l_shipdate AS DATE) AS order_date,
      |    l_extendedprice * (1 - l_discount) AS rate,
      |    l_quantity AS qty,
      |    l_extendedprice AS amt,
      |    CASE WHEN l_linenumber % 2 = 0 THEN 'invoice'
      |         ELSE 'sales_receipt' END AS source_type
      |  FROM lineitem
      |), daily AS (
      |  SELECT product_service, order_date,
      |    ${sqlDavg("rate")} AS avg_unit_price,
      |    MIN(rate) AS min_unit_price,
      |    MAX(rate) AS max_unit_price,
      |    ${sqlDsum("COALESCE(qty, 0)")} AS total_units_sold,
      |    ${sqlDsum("amt")} AS total_revenue,
      |    COUNT(*) AS transaction_count,
      |    CAST(SUM(CASE WHEN source_type = 'invoice' THEN 1 ELSE 0 END) AS BIGINT) AS invoice_transactions,
      |    CAST(SUM(CASE WHEN source_type = 'sales_receipt' THEN 1 ELSE 0 END) AS BIGINT) AS sales_receipt_transactions
      |  FROM li GROUP BY 1, 2
      |), daily2 AS (
      |  SELECT *,
      |    CASE WHEN transaction_count > 1
      |         THEN max_unit_price - min_unit_price ELSE 0.0 END AS price_volatility,
      |    CASE WHEN total_units_sold > 0
      |         THEN total_revenue / total_units_sold
      |         ELSE avg_unit_price END AS volume_weighted_price,
      |    (lower(product_service) LIKE '%shipping%'
      |      OR lower(product_service) LIKE '%tax%'
      |      OR lower(product_service) LIKE '%freight%'
      |      OR lower(product_service) LIKE '%discount%') AS is_service
      |  FROM daily
      |), classified AS (
      |  SELECT *,
      |    CASE WHEN is_service THEN FALSE
      |         WHEN regexp_matches(product_service, '^[0-9]') THEN TRUE
      |         WHEN LENGTH(product_service) >= 3 AND product_service != '' THEN TRUE
      |         ELSE FALSE END AS is_actual_product,
      |    CASE WHEN NOT is_service
      |         THEN ROUND(avg_unit_price / 5) * 5 END AS price_cluster,
      |    CASE WHEN total_units_sold > 100 THEN 'HIGH_VOLUME_DISCOUNT'
      |         WHEN total_units_sold > 50 THEN 'MEDIUM_VOLUME'
      |         ELSE 'REGULAR_SALE' END AS volume_category
      |  FROM daily2
      |), clustered AS (
      |  SELECT *,
      |    CASE WHEN NOT is_service THEN COUNT(*) OVER cw ELSE 0 END AS cluster_frequency_30d,
      |    SUM(total_units_sold) OVER cw AS cluster_volume_30d
      |  FROM classified
      |  WINDOW cw AS (PARTITION BY product_service, price_cluster
      |    ORDER BY (order_date - DATE '1970-01-01')
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |), candidates AS (
      |  SELECT *,
      |    CASE WHEN is_actual_product AND cluster_frequency_30d >= 3
      |           AND volume_category IN ('REGULAR_SALE', 'MEDIUM_VOLUME')
      |           AND price_cluster >= 65
      |         THEN price_cluster END AS stable_retail_candidate,
      |    CASE WHEN is_actual_product AND price_cluster IS NOT NULL
      |         THEN price_cluster END AS dominant_price_candidate
      |  FROM clustered
      |), with_retail AS (
      |  SELECT *,
      |    CASE WHEN NOT is_actual_product THEN NULL
      |         ELSE COALESCE(
      |           stable_retail_candidate,
      |           CASE WHEN dominant_price_candidate >= 65
      |                  AND cluster_frequency_30d >= 2
      |                THEN dominant_price_candidate END,
      |           MAX(CASE WHEN volume_category = 'REGULAR_SALE'
      |                    THEN avg_unit_price END) OVER (
      |             PARTITION BY product_service ORDER BY order_date
      |             ROWS UNBOUNDED PRECEDING))
      |         END AS inferred_retail_price
      |  FROM candidates
      |), auth AS (
      |  SELECT 'P' || CAST(p_partkey AS VARCHAR) AS product_service,
      |    CASE WHEN p_partkey % 2 = 0 THEN DATE '1996-01-01'
      |         ELSE DATE '1900-01-01' END AS eff_date,
      |    p_retailprice AS authoritative_price
      |  FROM part
      |  WHERE p_retailprice IS NOT NULL AND p_retailprice > 0
      |    AND NOT (p_partkey % 53 = 0 OR p_partkey % 59 = 0)
      |), asof_priced AS (
      |  SELECT wr.*, a.authoritative_price, a.eff_date AS price_effective_date
      |  FROM with_retail wr
      |  ASOF LEFT JOIN auth a
      |    ON wr.product_service = a.product_service
      |    AND wr.order_date >= a.eff_date
      |), trended AS (
      |  SELECT *,
      |    COALESCE(authoritative_price, inferred_retail_price) AS retail_price_at_date,
      |    CASE WHEN authoritative_price IS NOT NULL THEN 'AUTHORITATIVE'
      |         WHEN stable_retail_candidate IS NOT NULL THEN 'STABLE_PATTERN'
      |         WHEN dominant_price_candidate IS NOT NULL
      |           AND cluster_frequency_30d >= 2 THEN 'DOMINANT_PRICE'
      |         ELSE 'FALLBACK_MAX' END AS retail_price_source,
      |    LAG(avg_unit_price) OVER pw AS prev_avg_price,
      |    LAG(order_date) OVER pw AS prev_sale_date,
      |    LAG(COALESCE(authoritative_price, inferred_retail_price)) OVER pw AS prev_retail_price
      |  FROM asof_priced
      |  WINDOW pw AS (PARTITION BY product_service ORDER BY order_date)
      |)
      |SELECT product_service,
      |  CAST(order_date AS VARCHAR) AS order_date,
      |  avg_unit_price, min_unit_price, max_unit_price, total_units_sold,
      |  total_revenue, transaction_count, invoice_transactions,
      |  sales_receipt_transactions, price_volatility,
      |  volume_weighted_price, is_actual_product, price_cluster,
      |  volume_category, cluster_frequency_30d, cluster_volume_30d,
      |  stable_retail_candidate, dominant_price_candidate,
      |  inferred_retail_price, authoritative_price,
      |  CAST(price_effective_date AS VARCHAR) AS price_effective_date,
      |  retail_price_at_date, retail_price_source,
      |  prev_avg_price,
      |  CAST(prev_sale_date AS VARCHAR) AS prev_sale_date,
      |  prev_retail_price,
      |  CASE WHEN prev_avg_price IS NULL THEN 'NEW'
      |       WHEN avg_unit_price > prev_avg_price THEN 'INCREASING'
      |       WHEN avg_unit_price < prev_avg_price THEN 'DECREASING'
      |       ELSE 'STABLE' END AS price_trend,
      |  CASE WHEN prev_avg_price IS NOT NULL
      |       THEN avg_unit_price - prev_avg_price ELSE 0.0 END AS price_change_amount,
      |  CASE WHEN prev_avg_price IS NOT NULL AND prev_avg_price > 0
      |       THEN (avg_unit_price - prev_avg_price) / prev_avg_price * 100
      |       ELSE 0.0 END AS price_change_pct_raw,
      |  CASE WHEN prev_sale_date IS NOT NULL
      |       THEN order_date - prev_sale_date ELSE 0 END AS days_since_last_sale,
      |  CASE WHEN retail_price_at_date IS NOT NULL AND retail_price_at_date > 0
      |       THEN (avg_unit_price - retail_price_at_date) / retail_price_at_date * 100
      |       END AS discount_from_retail_pct_raw,
      |  CASE WHEN retail_price_at_date IS NOT NULL
      |       THEN avg_unit_price - retail_price_at_date END AS discount_from_retail_amount,
      |  CASE WHEN prev_retail_price IS NOT NULL
      |         AND retail_price_at_date != prev_retail_price
      |       THEN 'RETAIL_PRICE_CHANGE'
      |       WHEN prev_retail_price IS NULL THEN 'NEW_PRODUCT'
      |       ELSE 'NO_RETAIL_CHANGE' END AS retail_price_change_type,
      |  CASE WHEN prev_retail_price IS NOT NULL
      |       THEN retail_price_at_date - prev_retail_price
      |       ELSE 0.0 END AS retail_price_change_amount,
      |  CASE WHEN prev_retail_price IS NOT NULL AND prev_retail_price > 0
      |       THEN (retail_price_at_date - prev_retail_price) / prev_retail_price * 100
      |       ELSE 0.0 END AS retail_price_change_pct_raw
      |FROM trended
      |ORDER BY product_service, order_date""".stripMargin) { (s, d) =>
    import graft.ref.TimeSeries
    val li = Tables.lineitem(s, d).select(
      when(col("l_partkey") % 53 === 0,
        concat(lit("shipping "), col("l_partkey").cast("string")))
        .when(col("l_partkey") % 59 === 0,
          concat(lit("tax "), col("l_partkey").cast("string")))
        .otherwise(concat(lit("P"), col("l_partkey").cast("string")))
        .as("product_service"),
      col("l_shipdate").cast("date").as("order_date"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("product_service_rate"),
      col("l_quantity").as("product_service_quantity"),
      col("l_extendedprice").as("line_amount"),
      when(col("l_linenumber") % 2 === 0, "invoice")
        .otherwise("sales_receipt").as("source_type"))
    val snapshots = Tables.part(s, d)
      .filter(!(col("p_partkey") % 53 === 0 || col("p_partkey") % 59 === 0))
      .select(
        concat(lit("P"), col("p_partkey").cast("string")).as("item_name"),
        when(col("p_partkey") % 2 === 0, "1996-01-01")
          .otherwise("seed").as("snapshot_date"),
        col("p_retailprice").as("sales_price"))
    TimeSeries.pricingHistory(li, snapshots, None)
      .select(col("product_service"),
        col("order_date").cast("string").as("order_date"),
        col("avg_unit_price"), col("min_unit_price"),
        col("max_unit_price"), col("total_units_sold"),
        col("total_revenue"), col("transaction_count"),
        col("invoice_transactions"), col("sales_receipt_transactions"),
        col("price_volatility"), col("volume_weighted_price"),
        col("is_actual_product"), col("price_cluster"),
        col("volume_category"), col("cluster_frequency_30d"),
        col("cluster_volume_30d"), col("stable_retail_candidate"),
        col("dominant_price_candidate"), col("inferred_retail_price"),
        col("authoritative_price"),
        col("price_effective_date").cast("string")
          .as("price_effective_date"),
        col("retail_price_at_date"), col("retail_price_source"),
        col("prev_avg_price"),
        col("prev_sale_date").cast("string").as("prev_sale_date"),
        col("prev_retail_price"), col("price_trend"),
        col("price_change_amount"),
        // ROUND(double, 2) is not engine-portable at scaled ties
        // (DuckDB rounds the shortest decimal repr, Spark the exact
        // binary value) — compare the pct columns UNROUNDED; the
        // model keeps its reference-faithful rounding.
        when(col("prev_avg_price").isNotNull && col("prev_avg_price") > 0,
          (col("avg_unit_price") - col("prev_avg_price"))
            / col("prev_avg_price") * 100).otherwise(0.0)
          .as("price_change_pct_raw"),
        col("days_since_last_sale"),
        when(col("retail_price_at_date").isNotNull &&
          col("retail_price_at_date") > 0,
          (col("avg_unit_price") - col("retail_price_at_date"))
            / col("retail_price_at_date") * 100)
          .as("discount_from_retail_pct_raw"),
        col("discount_from_retail_amount"),
        col("retail_price_change_type"),
        col("retail_price_change_amount"),
        when(col("prev_retail_price").isNotNull &&
          col("prev_retail_price") > 0,
          (col("retail_price_at_date") - col("prev_retail_price"))
            / col("prev_retail_price") * 100).otherwise(0.0)
          .as("retail_price_change_pct_raw"))
      .orderBy("product_service", "order_date")
  }

  val all: Seq[Q] = Seq(a11PricingHistory)
}
