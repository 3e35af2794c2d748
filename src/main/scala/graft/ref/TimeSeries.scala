package graft.ref

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns
import graft.functions.Det.{davg, dsum}
import graft.operators.MergeUpsert

/** Time-series and pricing marts (SURVEY A10–A13, W3–W5, J11, I1):
  * quarterly company series with QoQ/YoY lags, multi-grain unit sales,
  * product pricing history (daily rollup + rolling frames + running
  * max + as-of authoritative price), and the incremental inventory
  * snapshot model.
  */
object TimeSeries {

  /** fct_company_orders_time_series
    * (fct_company_orders_time_series.sql:15-81): quarterly rollup with
    * LAG(1) QoQ and LAG(4) YoY growth (W3 + growth macro). */
  def companyOrdersTimeSeries(companyOrders: DataFrame): DataFrame = {
    val q = companyOrders.groupBy(
        col("company_domain_key"),
        year(col("order_date")).as("yr"),
        quarter(col("order_date")).as("qtr"))
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("order_amount")).as("revenue"),
        avg(col("order_amount")).as("avg_order_value"),
        min(col("order_date")).as("first_order"),
        max(col("order_date")).as("last_order"))
    val w = Window.partitionBy(col("company_domain_key"))
      .orderBy(col("yr"), col("qtr"))
    q.withColumn("prev_q_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("prev_year_revenue", lag(col("revenue"), 4).over(w))
      .withColumn("qoq_growth_pct",
        Fns.growthPct(col("revenue"), col("prev_q_revenue")))
      .withColumn("yoy_growth_pct",
        Fns.growthPct(col("revenue"), col("prev_year_revenue")))
  }

  /** mart_product_unit_sales (mart_product_unit_sales.sql:33-78, A12):
    * product × simultaneous day/week/month/quarter/year grains. */
  def productUnitSales(lineItems: DataFrame): DataFrame =
    lineItems
      .filter(col("product_service").isNotNull)
      .groupBy(
        col("product_service"),
        date_trunc("day", col("order_date")).cast("date").as("day"),
        date_trunc("week", col("order_date")).cast("date").as("week"),
        date_trunc("month", col("order_date")).cast("date").as("month"),
        date_trunc("quarter", col("order_date")).cast("date").as("quarter"),
        date_trunc("year", col("order_date")).cast("date").as("year"))
      .agg(
        count(lit(1)).as("line_count"),
        sum(col("product_service_quantity")).as("units"),
        sum(col("line_amount")).as("amount"),
        countDistinct(col("customer")).as("distinct_customers"),
        sum(when(col("source_type") === "invoice",
          col("line_amount")).otherwise(0)).as("invoice_amount"),
        sum(when(col("source_type") === "sales_receipt",
          col("line_amount")).otherwise(0)).as("receipt_amount"))

  /** fct_product_pricing_history (fct_product_pricing_history.sql:30-393
    * — the reference's largest mart, full surface): per (product, day)
    * rollup (A11) with volatility/volume-weighted price/source mix;
    * product-vs-service classification; $5 price clustering with 30-day
    * RANGE frequency/volume windows (W4); stable/dominant retail-price
    * inference with running-max fallback (W5); the as-of authoritative
    * price (the correlated MAX-date subquery of :309-315 rewritten J11
    * style — auth rows unioned in and last-non-null filled over one
    * ordered window); LAG trend battery (W3); and the product-context
    * discount calculations.
    *
    * Scale shape: one hash aggregate over the line items, then windows
    * partitioned by product (or product×cluster) — high-cardinality
    * keys, no global windows, no correlated subqueries. */
  /** Z-order dimensions for the committed pricing-history mart: 8-bit
    * buckets of the two probe axes. `product_bucket` hashes the product
    * name (equality probes — a hash bucket has no meaningful order, so
    * range probes on product don't prune, and don't need to);
    * `month_bucket` is monotone months-since-year-0 mod 256 (wraps
    * every 21.3 years — any real mart's date span; a date-RANGE probe
    * maps to a contiguous bucket range). Defined once so the writer
    * ([[graft.ref.Catalog.saveTableZOrdered]] in ModelDag) and every
    * stats-manifest reader bucket identically. */
  val pricingZDims: Seq[(String, Column)] = Seq(
    "product_bucket" -> pmod(crc32(col("product_service")), lit(256L)),
    "month_bucket" ->
      pmod(year(col("order_date")).cast("long") * 12L +
        month(col("order_date")).cast("long") - 1L, lit(256L)))

  def pricingHistory(lineItems: DataFrame,
                     itemSnapshots: DataFrame,
                     fctProducts: Option[DataFrame] = None): DataFrame = {
    val hasLoad = lineItems.columns.contains("load_date")
    val daily = lineItems
      .filter(col("product_service").isNotNull &&
        col("product_service_rate") > 0)
      .groupBy(col("product_service"), col("order_date"))
      .agg(
        davg(col("product_service_rate")).as("avg_unit_price"),
        min(col("product_service_rate")).as("min_unit_price"),
        max(col("product_service_rate")).as("max_unit_price"),
        dsum(coalesce(col("product_service_quantity"), lit(0.0)))
          .as("total_units_sold"),
        dsum(col("line_amount")).as("total_revenue"),
        count(lit(1)).as("transaction_count"),
        sum(when(col("source_type") === "invoice", 1).otherwise(0))
          .as("invoice_transactions"),
        sum(when(col("source_type") === "sales_receipt", 1).otherwise(0))
          .as("sales_receipt_transactions"),
        (if (hasLoad) max(col("load_date"))
         else max(lit(null).cast("string"))).as("latest_load_date"))
      .withColumn("price_volatility",
        when(col("transaction_count") > 1,
          col("max_unit_price") - col("min_unit_price")).otherwise(0.0))
      .withColumn("volume_weighted_price",
        when(col("total_units_sold") > 0,
          col("total_revenue") / col("total_units_sold"))
          .otherwise(col("avg_unit_price")))
    // --- product-vs-service classification + $5 price clustering ---
    val lowerP = lower(col("product_service"))
    val isService = lowerP.contains("shipping") || lowerP.contains("tax") ||
      lowerP.contains("freight") || lowerP.contains("discount")
    val classified = daily
      .withColumn("is_actual_product",
        when(isService, false)
          .when(col("product_service").rlike("^[0-9]"), true)
          .when(length(col("product_service")) >= 3 &&
            col("product_service") =!= "", true)
          .otherwise(false))
      .withColumn("price_cluster",
        when(!isService, round(col("avg_unit_price") / 5) * 5))
      .withColumn("volume_category",
        when(col("total_units_sold") > 100, "HIGH_VOLUME_DISCOUNT")
          .when(col("total_units_sold") > 50, "MEDIUM_VOLUME")
          .otherwise("REGULAR_SALE"))
    val clusterRangeW = Window
      .partitionBy(col("product_service"), col("price_cluster"))
      .orderBy(datediff(col("order_date"), to_date(lit("1970-01-01"))))
      .rangeBetween(-30, 0)
    val clustered = classified
      .withColumn("cluster_frequency_30d",
        when(!isService, count(lit(1)).over(clusterRangeW)).otherwise(0L))
      .withColumn("cluster_volume_30d",
        sum(col("total_units_sold")).over(clusterRangeW))
      .withColumn("stable_retail_candidate",
        when(col("is_actual_product") &&
          col("cluster_frequency_30d") >= 3 &&
          col("volume_category").isin("REGULAR_SALE", "MEDIUM_VOLUME") &&
          col("price_cluster") >= 65, col("price_cluster")))
      // The reference's FIRST_VALUE here (:163-172) partitions by
      // (product, cluster) and selects price_cluster — an identity on
      // the partition key, kept for surface fidelity.
      .withColumn("dominant_price_candidate",
        when(col("is_actual_product") && col("price_cluster").isNotNull,
          col("price_cluster")))
    val seqW = Window.partitionBy(col("product_service"))
      .orderBy(col("order_date"))
    val runW = seqW.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    // --- as-of authoritative price: auth rows unioned in, last-non-null
    //     filled (J11 window rewrite of the correlated subquery) ---
    val auth = itemSnapshots
      .filter(col("sales_price").isNotNull && col("sales_price") > 0 &&
        col("snapshot_date").isNotNull &&
        (col("snapshot_date") === "seed" ||
          col("snapshot_date").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")))
      .select(
        col("item_name").as("product_service"),
        when(col("snapshot_date") === "seed", to_date(lit("1900-01-01")))
          .otherwise(col("snapshot_date").cast("date")).as("order_date"),
        struct(col("sales_price").as("price"),
          when(col("snapshot_date") === "seed",
            to_date(lit("1900-01-01")))
            .otherwise(col("snapshot_date").cast("date")).as("eff_date"))
          .as("auth_row"))
    val unioned = clustered
      .unionByName(auth, allowMissingColumns = true)
    val asOfW = Window.partitionBy(col("product_service"))
      .orderBy(col("order_date"), col("auth_row").isNull.cast("int"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The retail-inference running max is computed AFTER the auth union
    // so every (product_service)-partitioned window in this model —
    // runW here, asOfW below, the trend lags later — shares ONE
    // exchange (they differ only in sort order). Auth rows contribute
    // only nulls to the REGULAR_SALE running max (their
    // volume_category is null-padded) and are filtered out before the
    // trend battery, so daily rows are bit-identical to computing the
    // inference pre-union.
    val asOf = unioned
      .withColumn("inferred_retail_price",
        when(!col("is_actual_product"), lit(null).cast("double"))
          .otherwise(coalesce(
            col("stable_retail_candidate"),
            when(col("dominant_price_candidate") >= 65 &&
              col("cluster_frequency_30d") >= 2,
              col("dominant_price_candidate")),
            max(when(col("volume_category") === "REGULAR_SALE",
              col("avg_unit_price"))).over(runW))))
      .withColumn("auth_asof",
        last(col("auth_row"), ignoreNulls = true).over(asOfW))
      .filter(col("transaction_count").isNotNull) // keep daily rows only
      .withColumn("authoritative_price", col("auth_asof.price"))
      .withColumn("price_effective_date", col("auth_asof.eff_date"))
      .drop("auth_row", "auth_asof")
    // --- trend battery + retail price selection ---
    val trended = asOf
      .withColumn("retail_price_at_date",
        coalesce(col("authoritative_price"),
          col("inferred_retail_price")))
      .withColumn("retail_price_source",
        when(col("authoritative_price").isNotNull, "AUTHORITATIVE")
          .when(col("stable_retail_candidate").isNotNull, "STABLE_PATTERN")
          .when(col("dominant_price_candidate").isNotNull &&
            col("cluster_frequency_30d") >= 2, "DOMINANT_PRICE")
          .otherwise("FALLBACK_MAX"))
      .withColumn("prev_avg_price",
        lag(col("avg_unit_price"), 1).over(seqW))
      .withColumn("prev_sale_date", lag(col("order_date"), 1).over(seqW))
      .withColumn("prev_retail_price",
        lag(coalesce(col("authoritative_price"),
          col("inferred_retail_price")), 1).over(seqW))
      .withColumn("price_trend",
        when(col("prev_avg_price").isNull, "NEW")
          .when(col("avg_unit_price") > col("prev_avg_price"),
            "INCREASING")
          .when(col("avg_unit_price") < col("prev_avg_price"),
            "DECREASING")
          .otherwise("STABLE"))
      .withColumn("price_change_amount",
        when(col("prev_avg_price").isNotNull,
          col("avg_unit_price") - col("prev_avg_price")).otherwise(0.0))
      .withColumn("price_change_percentage",
        when(col("prev_avg_price").isNotNull && col("prev_avg_price") > 0,
          round((col("avg_unit_price") - col("prev_avg_price"))
            / col("prev_avg_price") * 100, 2)).otherwise(0.0))
      .withColumn("days_since_last_sale",
        when(col("prev_sale_date").isNotNull,
          datediff(col("order_date"), col("prev_sale_date"))).otherwise(0))
    // --- product context + discount calculations ---
    val withContext = fctProducts match {
      case Some(p) => trended.join(broadcast(p.select(
        col("product_name").as("product_service"),
        col("product_family"), col("material_type"), col("is_kit"),
        col("item_type"),
        col("sales_price").as("current_list_price"),
        col("purchase_cost").as("current_purchase_cost"))),
        Seq("product_service"), "left")
      case None => trended
        .withColumn("current_list_price", lit(null).cast("double"))
        .withColumn("current_purchase_cost", lit(null).cast("double"))
    }
    withContext
      .withColumn("discount_from_retail_pct",
        when(col("retail_price_at_date").isNotNull &&
          col("retail_price_at_date") > 0,
          round((col("avg_unit_price") - col("retail_price_at_date"))
            / col("retail_price_at_date") * 100, 2)))
      .withColumn("discount_from_retail_amount",
        when(col("retail_price_at_date").isNotNull,
          col("avg_unit_price") - col("retail_price_at_date")))
      .withColumn("retail_price_change_type",
        when(col("prev_retail_price").isNotNull &&
          col("retail_price_at_date") =!= col("prev_retail_price"),
          "RETAIL_PRICE_CHANGE")
          .when(col("prev_retail_price").isNull, "NEW_PRODUCT")
          .otherwise("NO_RETAIL_CHANGE"))
      .withColumn("retail_price_change_amount",
        when(col("prev_retail_price").isNotNull,
          col("retail_price_at_date") - col("prev_retail_price"))
          .otherwise(0.0))
      .withColumn("retail_price_change_pct",
        when(col("prev_retail_price").isNotNull &&
          col("prev_retail_price") > 0,
          round((col("retail_price_at_date") - col("prev_retail_price"))
            / col("prev_retail_price") * 100, 2)).otherwise(0.0))
      .withColumn("discount_from_current_list_pct",
        when(col("current_list_price").isNotNull &&
          col("current_list_price") > 0,
          round((col("avg_unit_price") - col("current_list_price"))
            / col("current_list_price") * 100, 2)))
      .withColumn("discount_from_current_list_amount",
        when(col("current_list_price").isNotNull,
          col("avg_unit_price") - col("current_list_price")))
  }

  /** int_quickbooks__inventory_history (I1,
    * int_quickbooks__inventory_history.sql:7-64): append only snapshot
    * rows newer than the target's max snapshot_date, with
    * on_schema_change='fail'. */
  def inventoryHistoryIncrement(existing: DataFrame,
                                incoming: DataFrame): DataFrame = {
    MergeUpsert.assertSameSchema(existing, incoming)
    MergeUpsert.incrementalNewRows(existing, "snapshot_date", incoming)
  }

  /** fct_inventory_history (fct_inventory_history.sql:12-135): one row
    * per (item, snapshot date) with LAG day-over-day change and
    * cost/price inventory valuations from the latest product catalog
    * (broadcast dim join). The on-order/on-sales-order quantities are
    * absent from the thin export → NULL-padded, with availability
    * falling back to on-hand. */
  def fctInventoryHistory(inventoryHistory: DataFrame,
                          fctProducts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("item_name"))
      .orderBy(col("snapshot_date"))
    inventoryHistory
      .filter(col("item_name").isNotNull && col("item_name") =!= "")
      .withColumn("previous_quantity_on_hand",
        lag(col("quantity_on_hand"), 1).over(w))
      .withColumn("quantity_change",
        col("quantity_on_hand") - col("previous_quantity_on_hand"))
      .withColumn("quantity_on_order", lit(null).cast("double"))
      .withColumn("quantity_on_sales_order", lit(null).cast("double"))
      .withColumn("available_quantity",
        col("quantity_on_hand") -
          coalesce(col("quantity_on_sales_order"), lit(0.0)))
      .withColumn("total_inventory_visibility",
        col("quantity_on_hand") +
          coalesce(col("quantity_on_order"), lit(0.0)))
      .withColumn("inventory_date", col("snapshot_date").cast("date"))
      .join(broadcast(fctProducts.select(
        col("product_name").as("item_name"),
        col("product_family"), col("material_type"), col("is_kit"),
        col("item_type"), col("unit_of_measure"),
        col("sales_price").as("catalog_sales_price"),
        col("purchase_cost"))), Seq("item_name"), "left")
      .withColumn("inventory_value_at_cost",
        when(col("purchase_cost").isNotNull,
          col("quantity_on_hand") * col("purchase_cost")))
      .withColumn("inventory_value_at_sales_price",
        when(col("catalog_sales_price").isNotNull,
          col("quantity_on_hand") * col("catalog_sales_price")))
  }
}
