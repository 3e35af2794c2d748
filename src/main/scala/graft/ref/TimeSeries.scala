package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns
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

  /** fct_product_pricing_history core
    * (fct_product_pricing_history.sql:32-74,113-139,165-196,236-266,
    * 300-306): per (product, day) rollup (A11), 30-day rolling RANGE
    * frame (W4), running max / first price (W5), LAG trend (W3), and
    * the as-of authoritative list price (J11 rewritten as
    * last-non-null over an ordered window instead of a correlated
    * MAX-date subquery). `itemSnapshots` supplies (item_name,
    * snapshot_date, sales_price) authoritative rows. */
  def pricingHistory(lineItems: DataFrame,
                     itemSnapshots: DataFrame): DataFrame = {
    val daily = lineItems
      .filter(col("product_service").isNotNull &&
        col("product_service_rate") > 0)
      .groupBy(col("product_service"),
        col("order_date").as("price_date"))
      .agg(
        avg(col("product_service_rate")).as("avg_rate"),
        min(col("product_service_rate")).as("min_rate"),
        max(col("product_service_rate")).as("max_rate"),
        sum(col("product_service_quantity")).as("units"),
        sum(col("line_amount")).as("amount"),
        count(lit(1)).as("line_count"))
      .withColumn("volume_weighted_price",
        col("amount") / nullif(col("units"), lit(0)))
      .withColumn("price_range", col("max_rate") - col("min_rate"))
    // authoritative price rows unioned in, then as-of filled (J11)
    val auth = itemSnapshots.select(
      col("item_name").as("product_service"),
      col("snapshot_date").cast("date").as("price_date"),
      col("sales_price").as("auth_price"))
    val unioned = daily
      .unionByName(auth, allowMissingColumns = true)
    val ordW = Window.partitionBy(col("product_service"))
      .orderBy(col("price_date"),
        col("auth_price").isNull.cast("int")) // auth rows first per day
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asOf = unioned
      .withColumn("effective_list_price",
        last(col("auth_price"), ignoreNulls = true).over(ordW))
      .filter(col("line_count").isNotNull) // keep order-derived rows
    val seqW = Window.partitionBy(col("product_service"))
      .orderBy(col("price_date"))
    val rangeW = Window.partitionBy(col("product_service"))
      .orderBy(datediff(col("price_date"), to_date(lit("1970-01-01"))))
      .rangeBetween(-30, 0)
    asOf
      .withColumn("lines_30d", count(lit(1)).over(rangeW))
      .withColumn("units_30d", sum(col("units")).over(rangeW))
      .withColumn("running_max_rate", max(col("max_rate")).over(
        seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("first_rate", first(col("avg_rate")).over(
        seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_avg_rate", lag(col("avg_rate"), 1).over(seqW))
      .withColumn("price_trend",
        when(col("prev_avg_rate").isNull, "initial")
          .when(col("avg_rate") > col("prev_avg_rate"), "up")
          .when(col("avg_rate") < col("prev_avg_rate"), "down")
          .otherwise("flat"))
      .withColumn("discount_vs_list_pct",
        when(col("effective_list_price") > 0,
          round((lit(1) - col("avg_rate") / col("effective_list_price"))
            * 100, 2)))
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
