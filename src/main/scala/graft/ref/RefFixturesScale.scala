package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SF-SHAPED reference-style raw inputs synthesized from the testdata
  * star schema — the data-throughput companion to [[RefFixtures]].
  * `refdemo_total` tracks the sink/commit path on ~10-row fixtures
  * (commit overhead dominates at ~0.6 s/model); this variant feeds the
  * SAME DAG testdata volumes (sf0.1: 15k customers, 20k items ×2
  * snapshots, 600k order lines) so the `refdemo_sf01_total` bench key
  * tracks how the model plans themselves scale. QuickBooks core only —
  * optional sources stay absent, exercising the guard branches like
  * `RefDemo --minimal`.
  *
  * Construction is purely modular arithmetic over the testdata keys
  * (deterministic, no RNG): ~1 corporate domain per 8 customers (domain
  * consolidation + company rollups get real fan-in), every 4th customer
  * an individual gmail (skip/individual mapping paths), every 10th a
  * semicolon email list (P7 splitting), '' blanks per the DLT
  * convention, item snapshots at 1995-01-01/1996-01-01 INSIDE the
  * order-date range so the pricing-history as-of join has both sides,
  * and a 3:1 invoice:sales-receipt split on the order key. */
object RefFixturesScale {

  private def s(c: org.apache.spark.sql.Column) = c.cast("string")

  def rawCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = graft.Tables.customer(spark, dir)
    val k = col("c_custkey")
    val corp = k % 4 =!= 0
    val domain = concat(lit("company"), s(k % 2000), lit(".com"))
    c.select(
      concat(lit("C"), s(k)).as("quick_books_internal_id"),
      col("c_name").as("customer_name"),
      when(corp, concat(lit("Company "), s(k % 2000))).otherwise("")
        .as("company_name"),
      when(corp,
        when(k % 10 === 0, concat(lit("buyer"), s(k), lit("@"), domain,
          lit(";backup"), s(k), lit("@"), domain))
          .otherwise(concat(lit("user"), s(k), lit("@"), domain)))
        .otherwise(concat(lit("person"), s(k), lit("@gmail.com")))
        .as("main_email"),
      when(k % 20 === 0, concat(lit("cc"), s(k), lit("@example.org")))
        .otherwise("").as("cc_email"),
      element_at(array(lit("Columbus"), lit("Austin"), lit("Calgary"),
        lit("Winona"), lit("")), (k % 5 + 1).cast("int"))
        .as("billing_address_city"),
      element_at(array(lit("OH"), lit("TX"), lit("AB"), lit("MN"),
        lit("")), (k % 5 + 1).cast("int")).as("billing_address_state"),
      element_at(array(lit("USA"), lit(""), lit("Canada"), lit("US"),
        lit("")), (k % 5 + 1).cast("int")).as("billing_address_country"),
      element_at(array(lit("RW"), lit("JS"), lit("")),
        (k % 3 + 1).cast("int")).as("sales_rep"),
      element_at(array(lit("Net 30"), lit("Net 60"), lit("")),
        (k % 3 + 1).cast("int")).as("terms"),
      s(col("c_acctbal")).as("current_balance"),
      concat(lit("199"), s(k % 5), lit("-0"), s(k % 9 + 1), lit("-1"),
        s(k % 9)).as("created_date"),
      when(k % 3 === 0, concat(lit("First"), s(k % 50))).otherwise("")
        .as("first_name"),
      when(k % 3 === 0, concat(lit("Last"), s(k % 70))).otherwise("")
        .as("last_name"),
      when(k % 5 === 0, "Purchasing Manager").otherwise("")
        .as("job_title"),
      when(k % 7 === 0, concat(lit("614-555-0"), s(k % 900 + 100)))
        .otherwise("").as("main_phone"),
      when(k % 2 === 0, "Active").otherwise("").as("status"))
  }

  private def itemName = concat(lit("P-"), s(col("p_partkey")))

  /** Two full snapshots inside the order-date range; every 3rd item's
    * price moves between them (price-trend + inventory-change work). */
  def rawItems(spark: SparkSession, dir: String): DataFrame = {
    val p = graft.Tables.part(spark, dir)
    val k = col("p_partkey")
    def snap(date: String, priceShift: Double, qohShift: Int) = p.select(
      concat(lit("I"), s(k)).as("quick_books_internal_id"),
      itemName.as("item_name"),
      element_at(array(lit("Inventory Part"), lit("Inventory Part"),
        lit("Assembly"), lit("Service")), (k % 4 + 1).cast("int"))
        .as("item_type"),
      when(k % 7 === 0, concat(col("p_type"), lit(", "), s(k % 60 + 12),
        lit(" anchors per carton")))
        .otherwise(col("p_type")).as("sales_description"),
      s(round(col("p_retailprice") +
        when(k % 3 === 0, priceShift).otherwise(0.0), 2))
        .as("sales_price"),
      s(round(col("p_retailprice") * 0.45, 2)).as("purchase_cost"),
      s(col("p_size") * 10 + qohShift).as("quantity_on_hand"),
      when(k % 4 === 3, "").otherwise("ea").as("u_m"),
      lit("Active").as("status"),
      lit(date).as("snapshot_date"),
      lit(date).as("load_date"))
    snap("1995-01-01", 0.0, 0).unionByName(snap("1996-01-01", 2.5, -40))
  }

  /** Order lines joined to their customer identity; 3:1 invoice:receipt
    * split on the order key. */
  private def orderLines(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.orders(spark, dir)
    val l = graft.Tables.lineitem(spark, dir)
    val c = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"),
        col("c_name").as("customer"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, Seq("o_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("customer"),
        s(col("o_orderdate")).as("order_date"),
        concat(lit("P-"), s(col("l_partkey"))).as("product_service"),
        s(col("l_quantity")).as("product_service_quantity"),
        s(round(col("l_extendedprice") / col("l_quantity"), 2))
          .as("product_service_rate"),
        s(col("l_extendedprice")).as("amount"),
        col("o_orderstatus"), col("l_tax"), s(col("o_totalprice"))
          .as("total_amount"))
  }

  def rawInvoices(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    orderLines(spark, dir).filter(k % 4 =!= 0).select(
      concat(lit("INV-"), s(k)).as("invoice_no"),
      col("order_date").as("invoice_date"),
      col("customer"),
      col("product_service"),
      concat(lit("Line for "), col("product_service"))
        .as("product_service_description"),
      col("product_service_quantity"),
      col("product_service_rate"),
      col("amount").as("product_service__amount"),
      when(col("o_orderstatus") === "F", "Paid")
        .when(col("o_orderstatus") === "O", "Open")
        .otherwise("Partially Paid").as("status"),
      when(col("l_tax") > 0, "Tax").otherwise("Non")
        .as("customer_sales_tax_code"),
      element_at(array(lit(""), lit(""), lit("OEM"), lit("Distributor"),
        lit("EXPORT")), (k % 5 + 1).cast("int")).as("class"),
      element_at(array(lit("Net 30"), lit("Net 60"), lit("Credit Card")),
        (k % 3 + 1).cast("int")).as("terms"),
      col("total_amount"),
      element_at(array(lit("RW"), lit("JS"), lit("")),
        (col("o_custkey") % 3 + 1).cast("int")).as("sales_rep"),
      element_at(array(lit("Columbus"), lit("Austin"), lit("Calgary"),
        lit("Winona"), lit("")), (col("o_custkey") % 5 + 1).cast("int"))
        .as("billing_address_city"),
      element_at(array(lit("OH"), lit("TX"), lit("AB"), lit("MN"),
        lit("")), (col("o_custkey") % 5 + 1).cast("int"))
        .as("billing_address_state"),
      element_at(array(lit("USA"), lit(""), lit("Canada"), lit("US"),
        lit("")), (col("o_custkey") % 5 + 1).cast("int"))
        .as("billing_address_country"))
  }

  def rawSalesReceipts(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    orderLines(spark, dir).filter(k % 4 === 0).select(
      concat(lit("SR-"), s(k)).as("sales_receipt_no"),
      col("order_date").as("sales_receipt_date"),
      col("customer"),
      col("product_service"),
      concat(lit("Line for "), col("product_service"))
        .as("product_service_description"),
      col("product_service_quantity"),
      col("product_service_rate"),
      col("amount").as("product_service_amount"),
      element_at(array(lit("Credit Card"), lit("PayPal"), lit("Amazon")),
        (k % 3 + 1).cast("int")).as("payment_method"),
      when(col("l_tax") > 0, "Tax").otherwise("Non")
        .as("customer_sales_tax_code"),
      when(k % 12 === 0, "Amazon FBA").otherwise("").as("class"),
      col("total_amount"),
      element_at(array(lit("RW"), lit("JS"), lit("")),
        (col("o_custkey") % 3 + 1).cast("int")).as("sales_rep"),
      element_at(array(lit("Columbus"), lit("Austin"), lit("Calgary"),
        lit("Winona"), lit("")), (col("o_custkey") % 5 + 1).cast("int"))
        .as("billing_address_city"),
      element_at(array(lit("OH"), lit("TX"), lit("AB"), lit("MN"),
        lit("")), (col("o_custkey") % 5 + 1).cast("int"))
        .as("billing_address_state"))
  }

  def inputs(spark: SparkSession, dir: String): ModelDag.RawInputs =
    ModelDag.RawInputs(
      customers = rawCustomers(spark, dir),
      items = rawItems(spark, dir),
      invoices = rawInvoices(spark, dir),
      salesReceipts = rawSalesReceipts(spark, dir))
}
