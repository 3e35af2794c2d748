package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic reference-shaped raw fixtures (FIXTURES.md): the DLT
  * conventions are reproduced — NULLs as '', metadata columns present —
  * and the fixture cases cover the load-bearing rules: semicolon email
  * lists, amazon-marketplace/individual/fastenal domains, name suffixes,
  * blank country + state codes, S-prefixed credit-card invoices
  * (Webgility test), Amazon/OEM/Distributor classes, percent-string
  * amounts, multi-line orders, item snapshots across dates, carton
  * phrases, kit/master suffixes.
  */
object RefFixtures {

  def rawCustomers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // id, customer, company, main_email, cc_email, city, state, country, rep, terms, balance, created
      ("C001", "Acme Industrial End User", "Acme Industrial",
        "buyer@acme.com;backup@acme.com", "cc@acme.com",
        "Columbus", "OH", "", "RW", "Net 30", "1200.50", "2023-01-10"),
      ("C002", "Acme Industrial", "",
        "ops@acme.com", "", "Columbus", "OH", "USA", "RW", "Net 30",
        "300.00", "2023-02-11"),
      ("C003", "Bolt Supply Customer", "Bolt Supply House",
        "orders@boltsupply.ca", "", "Calgary", "AB", "", "JS", "Net 60",
        "requested", "2023-03-02"),
      ("C004", "Jane Smith", "", "jane.smith@gmail.com", "",
        "Austin", "TX", "", "JS", "", "0.00", "2023-04-20"),
      ("C005", "Amazon Marketplace Buyer", "",
        "x1@marketplace.amazon.com", "", "", "", "", "", "",
        "0.00", "2023-05-05"),
      ("C006", "Fastenal Store 42", "Fastenal Company",
        "store42@stores.fastenal.com", "", "Winona", "MN", "US", "RW",
        "Net 30", "5000.00", "2023-01-15"),
      ("C007", "Bolt Supply House client", "",
        "purchasing@boltsupply.ca", "", "Calgary", "AB", "Canada", "JS",
        "Net 60", "750.25", "2023-06-01"))
      .toDF("quick_books_internal_id", "customer_name", "company_name",
        "main_email", "cc_email", "billing_address_city",
        "billing_address_state", "billing_address_country", "sales_rep",
        "terms", "current_balance", "created_date")
      .withColumn("load_date",
        org.apache.spark.sql.functions.lit("2024-06-01"))
      .withColumn("snapshot_date",
        org.apache.spark.sql.functions.lit("seed"))
      .withColumn("is_seed", org.apache.spark.sql.functions.lit(true))
      // Contact-pipeline optional columns (fixed path): names/phones/
      // titles on a couple of customers, '' elsewhere per DLT.
      .withColumn("first_name", org.apache.spark.sql.functions.expr(
        """CASE quick_books_internal_id WHEN 'C001' THEN 'Pat'
          |  WHEN 'C004' THEN 'Jane' ELSE '' END""".stripMargin))
      .withColumn("last_name", org.apache.spark.sql.functions.expr(
        """CASE quick_books_internal_id WHEN 'C001' THEN 'Jones'
          |  WHEN 'C004' THEN 'Smith' ELSE '' END""".stripMargin))
      .withColumn("job_title", org.apache.spark.sql.functions.expr(
        "CASE quick_books_internal_id WHEN 'C001' THEN 'Purchasing Manager' ELSE '' END"))
      .withColumn("main_phone", org.apache.spark.sql.functions.expr(
        "CASE quick_books_internal_id WHEN 'C001' THEN '614-555-0101' ELSE '' END"))
      .withColumn("status", org.apache.spark.sql.functions.expr(
        "CASE WHEN quick_books_internal_id IN ('C001','C002','C004','C006') THEN 'Active' ELSE '' END"))
  }

  def rawItems(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // id, name, type, sales_desc, price, cost, qoh, um, status, snapshot, load
      ("I001", "01-6310.AK4", "Inventory Part",
        "Asphalt anchor, 72 anchors per carton", "14.50", "6.20", "500",
        "ea", "Active", "2024-05-01", "2024-05-01"),
      ("I001b", "01-6310.AK4", "Inventory Part",
        "Asphalt anchor, 72 anchors per carton", "15.00", "6.40", "480",
        "ea", "Active", "2024-06-01", "2024-06-01"),
      ("I002", "01-6310.MST", "Inventory Part",
        "Master 6 6-packs", "80.00", "38.00", "60", "ea", "Active",
        "2024-06-01", "2024-06-01"),
      ("I003", "02-8100.3SK", "Inventory Part",
        "Surface mount kit, 36 for EPX2", "45.00", "21.00", "120", "kit",
        "Active", "2024-06-01", "2024-06-01"),
      ("I004", "EPX2-KIT", "Assembly",
        "Epoxy cartridge kit", "29.00", "12.00", "200", "kit", "Active",
        "2024-06-01", "2024-06-01"),
      ("I005", "SHIPPING", "Service", "Freight", "0.00", "0.00", "",
        "", "Active", "2024-06-01", "2024-06-01"))
      .toDF("quick_books_internal_id", "item_name", "item_type",
        "sales_description", "sales_price", "purchase_cost",
        "quantity_on_hand", "u_m", "status", "snapshot_date", "load_date")
  }

  def rawInvoices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // invoice_no, date, customer, product, desc, qty, rate, amount(product_service__amount), status, tax_code, class, terms, total, rep, city, state, country
      ("INV-1001", "2024-06-10", "Acme Industrial End User",
        "01-6310.AK4", "Anchors", "10", "15.00", "150.00", "Open", "Tax",
        "", "Net 30", "231.00", "RW", "Columbus", "OH", "USA"),
      ("INV-1001", "2024-06-10", "Acme Industrial End User",
        "EPX2-KIT", "Epoxy kit", "2", "29.00", "58.00", "Open", "Tax",
        "", "Net 30", "231.00", "RW", "Columbus", "OH", "USA"),
      ("INV-1001", "2024-06-10", "Acme Industrial End User",
        "SHIPPING", "Freight", "1", "23.00", "23.00", "Open", "Non",
        "", "Net 30", "231.00", "RW", "Columbus", "OH", "USA"),
      ("S-2001", "2024-05-20", "Jane Smith",
        "01-6310.AK4", "Anchors", "4", "15.00", "60.00", "Paid", "Non",
        "", "Credit Card", "60.00", "JS", "Austin", "TX", ""),
      ("INV-1002", "2024-03-15", "Bolt Supply Customer",
        "01-6310.MST", "Master pack", "5", "80.00", "400.00", "Open",
        "Non", "Distributor", "Net 60", "400.00", "JS", "Calgary", "AB",
        "Canada"),
      ("INV-1003", "2023-11-02", "Fastenal Store 42",
        "02-8100.3SK", "Kits", "12", "45.00", "540.00", "Paid", "Non",
        "OEM", "Net 30", "540.00", "RW", "Winona", "MN", "US"),
      ("INV-1004", "2024-01-25", "Acme Industrial",
        "01-6310.AK4", "Anchors", "20", "14.50", "12%", "Partially Paid",
        "Tax", "EXPORT", "Net 30", "290.00", "RW", "Columbus", "OH",
        "USA"))
      .toDF("invoice_no", "invoice_date", "customer", "product_service",
        "product_service_description", "product_service_quantity",
        "product_service_rate", "product_service__amount", "status",
        "customer_sales_tax_code", "class", "terms", "total_amount",
        "sales_rep", "billing_address_city", "billing_address_state",
        "billing_address_country")
      // Optional order columns (fct_orders surface): added via
      // withColumn to keep the tuple width under 22. INV-1004 is
      // deliberately backdated (due before order date).
      .withColumn("due_date", org.apache.spark.sql.functions.expr(
        """CASE invoice_no WHEN 'INV-1001' THEN '2024-07-10'
          |  WHEN 'INV-1004' THEN '2024-01-10' ELSE '' END""".stripMargin))
      .withColumn("memo", org.apache.spark.sql.functions.expr(
        "CASE invoice_no WHEN 'INV-1001' THEN 'Rush order' ELSE '' END"))
      .withColumn("shipping_address_line_1",
        org.apache.spark.sql.functions.expr(
          "CASE invoice_no WHEN 'INV-1001' THEN '12 Dock St' ELSE '' END"))
      .withColumn("shipping_address_city",
        org.apache.spark.sql.functions.expr(
          "CASE invoice_no WHEN 'INV-1001' THEN 'Columbus' ELSE '' END"))
      .withColumn("shipping_address_state",
        org.apache.spark.sql.functions.expr(
          "CASE invoice_no WHEN 'INV-1001' THEN 'OH' ELSE '' END"))
      .withColumn("shipping_method", org.apache.spark.sql.functions.expr(
        "CASE invoice_no WHEN 'INV-1001' THEN 'UPS Ground' ELSE '' END"))
      .withColumn("total_tax", org.apache.spark.sql.functions.expr(
        "CASE invoice_no WHEN 'INV-1001' THEN '23.10' ELSE '0' END"))
      .withColumn("currency",
        org.apache.spark.sql.functions.lit("USD"))
  }

  def rawSalesReceipts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // receipt_no, date, customer, product, desc, qty, rate, amount, payment_method, tax_code, class, total, rep, city, state
      ("SR-3001", "2024-06-05", "Jane Smith", "EPX2-KIT", "Epoxy kit",
        "1", "29.00", "29.00", "Credit Card", "Non", "", "29.00", "JS",
        "Austin", "TX"),
      ("SR-3002", "2024-04-18", "Amazon Marketplace Buyer",
        "01-6310.AK4", "Anchors", "2", "16.00", "32.00", "Amazon", "Non",
        "Amazon FBA", "32.00", "", "", ""),
      ("SR-3003", "2024-06-20", "Acme Industrial", "01-6310.AK4",
        "Anchors", "6", "15.00", "90.00", "PayPal", "Tax", "", "90.00",
        "RW", "Columbus", "OH"))
      .toDF("sales_receipt_no", "sales_receipt_date", "customer",
        "product_service", "product_service_description",
        "product_service_quantity", "product_service_rate",
        "product_service_amount", "payment_method",
        "customer_sales_tax_code", "class", "total_amount", "sales_rep",
        "billing_address_city", "billing_address_state")
  }

  def rawShopifyOrders(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // id, order_number, created_at, total, subtotal, discounts, fin_status, fulfill, email, landing_site, referring_site, test, source_name, _dlt_id
      (9001L, 2001, "2024-05-20T10:00:00Z", "60.00", "55.00", "0.00",
        "paid", "fulfilled", "jane.smith@gmail.com",
        "/products/anchor?utm_source=google+ads&utm_medium=cpc&utm_campaign=spring+sale",
        "https://www.google.com/", false, "web", "dlt_a"),
      (9002L, 2002, "2024-06-01T09:30:00Z", "120.00", "120.00", "10.00",
        "paid", "", "buyer@acme.com",
        "/checkout/thank_you?utm_source=direct", "https://asphaltanchors.com/p",
        false, "web", "dlt_b"),
      (9003L, 2003, "2024-06-02T11:00:00Z", "45.00", "45.00", "0.00",
        "pending", "", "x@y.com", "/products/kit",
        "https://pay.shopify.com/r", false, "web", "dlt_c"),
      (9004L, 2004, "2024-06-03T12:00:00Z", "999.00", "999.00", "0.00",
        "paid", "fulfilled", "test@test.com", "/products/anchor", "",
        true, "web", "dlt_d")) // test order → excluded
      .toDF("id", "order_number", "created_at", "total_price",
        "subtotal_price", "total_discounts", "financial_status",
        "fulfillment_status", "email", "landing_site", "referring_site",
        "test", "source_name", "_dlt_id")
      // Marketing-spine optional columns
      .withColumn("customer_id", org.apache.spark.sql.functions.expr(
        """CASE id WHEN 9001 THEN 701 WHEN 9002 THEN 702
          |  WHEN 9003 THEN 703 ELSE 704 END""".stripMargin))
      .withColumn("total_tax", org.apache.spark.sql.functions.expr(
        "CASE id WHEN 9001 THEN '4.80' ELSE '0.00' END"))
      .withColumn("buyer_accepts_marketing",
        org.apache.spark.sql.functions.expr("id IN (9001, 9002)"))
      .withColumn("user_agent",
        org.apache.spark.sql.functions.lit("Mozilla/5.0"))
  }

  def rawShopifyCustomers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // id, email, first, last, phone, consent_state, opt_in, consent_at, sms_state, verified, orders_count, total_spent, company, addr1, city, prov, zip, country
      (701L, "jane.smith@gmail.com", "Jane", "Smith", "512-555-0100",
        "subscribed", "single_opt_in", "2024-01-05T00:00:00Z",
        "not_subscribed", true, 3, "149.00", "", "9 Oak Ln", "Austin",
        "TX", "78701", "US"),
      (702L, "buyer@acme.com", "Pat", "Jones", "",
        "not_subscribed", "", "", "subscribed", true, 1, "120.00",
        "Acme Industrial", "1 Industrial Way", "Columbus", "OH", "43004",
        "US"),
      (703L, "x@y.com", "", "", "", "subscribed", "confirmed_opt_in",
        "2024-02-02T00:00:00Z", "not_subscribed", false, 0, "0.00",
        "", "", "", "", "", ""))
      .toDF("id", "email", "first_name", "last_name", "phone",
        "email_marketing_consent__state",
        "email_marketing_consent__opt_in_level",
        "email_marketing_consent__consent_updated_at",
        "sms_marketing_consent__state", "verified_email", "orders_count",
        "total_spent", "default_address__company",
        "default_address__address1", "default_address__city",
        "default_address__province_code", "default_address__zip",
        "default_address__country_code")
      .withColumn("created_at",
        org.apache.spark.sql.functions.lit("2023-06-01T00:00:00Z"))
      .withColumn("updated_at",
        org.apache.spark.sql.functions.lit("2024-06-01T00:00:00Z"))
  }

  def rawShopifyProducts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // id, title, vendor, type, status, tags, created, updated, _dlt_id
      (501L, "SP10 Asphalt Anchor", "AAI", "anchor", "active",
        "anchor,asphalt", "2023-01-01T00:00:00Z", "2024-01-01T00:00:00Z",
        "pd_a"),
      (502L, "EPX2 Epoxy", "AAI", "adhesive", "active", "epoxy",
        "2023-02-01T00:00:00Z", "2024-02-01T00:00:00Z", "pd_b"),
      (503L, "Retired Widget", "AAI", "misc", "archived", "",
        "2020-01-01T00:00:00Z", "2021-01-01T00:00:00Z", "pd_c"))
      .toDF("id", "title", "vendor", "product_type", "status", "tags",
        "created_at", "updated_at", "_dlt_id")
  }

  def rawShopifyVariants(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // id, title, sku, price, inventory_quantity, _dlt_parent_id
      (6001L, "Single", "01-6310.AK4", "15.00", 480, "pd_a"),
      (6002L, "Carton of 72", "01-6310.C72", "899.00", 20, "pd_a"),
      (6003L, "Kit", "EPX2-KIT", "29.00", 200, "pd_b"),
      (6004L, "No SKU", "", "10.00", 5, "pd_b"),   // dropped: blank sku
      (6005L, "Orphan", "ZZZ-1", "1.00", 1, "pd_c")) // dropped: inactive
      .toDF("id", "title", "sku", "price", "inventory_quantity",
        "_dlt_parent_id")
  }

  def rawShopifyFulfillments(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("f1", "dlt_a", "success", "1Z999", "UPS", "2024-05-21T08:00:00Z"),
      ("f2", "dlt_a", "success", "1Z999-2", "UPS", "2024-05-22T08:00:00Z"))
      .toDF("id", "_dlt_parent_id", "status", "tracking_number",
        "tracking_company", "created_at")
  }

  def rawTradeShowLeads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // lead_id, first, last, company, email, created, show_name, show_date
      ("L001", "Pat", "Jones", "Acme Industrial", "buyer@acme.com",
        "2024-01-16", "World of Asphalt", "2024-01-15"),
      ("", "Sam", "Lee", "", "sam.lee@gmail.com",
        "2024-01-15", "World of Asphalt", "2024-01-15"),
      ("L003", "Pat", "Jones", "Acme Industrial", "buyer@acme.com",
        "2024-03-02", "ConExpo", "2024-03-01"), // dup email, later → dropped
      ("", "Ana", "Diaz", "New Prospect Co", "ana@newprospect.io",
        "2024-03-01", "ConExpo", "2024-03-01"))
      .toDF("lead_id", "first_name", "last_name", "company", "email",
        "created", "show_name", "show_date")
      .withColumn("title", org.apache.spark.sql.functions.expr(
        "CASE lead_id WHEN 'L001' THEN 'Purchasing Manager' ELSE '' END"))
      .withColumn("phone", org.apache.spark.sql.functions.expr(
        "CASE lead_id WHEN 'L001' THEN '614-555-0101' ELSE '' END"))
      .withColumn("show_location", org.apache.spark.sql.functions.expr(
        """CASE show_name WHEN 'World of Asphalt' THEN 'Nashville, TN'
          |  ELSE 'Las Vegas, NV' END""".stripMargin))
      .withColumn("show_rep", org.apache.spark.sql.functions.lit("RW"))
  }

  /** Writes a small enrichment JSONL (nested payload, ''-for-null
    * discipline, a non-numeric founded_year) and returns its path. */
  def enrichmentJsonl(): String = {
    val dir = graft.queries.Q.tempDir("graft_enrich")
    val lines = Seq(
      """{"company_domain": "acme.com", "company_name": "Acme Industrial", "enrichment_source": "api", "enrichment_date": "2024-05-01", "enrichment_raw_data": {"industry": "Construction", "description": "base", "description_enriched": "Asphalt anchoring products", "founded_year": "1998", "hq_city": "Columbus", "hq_country": "United States", "employees_count": "120"}}""",
      """{"company_domain": "boltsupply.ca", "company_name": "Bolt Supply House", "enrichment_source": "api", "enrichment_date": "2024-05-02", "enrichment_raw_data": {"industry": "Distribution", "description": "fasteners", "description_enriched": "", "founded_year": "", "hq_city": "Calgary", "hq_country": "Canada", "employees_count": ""}}""")
    java.nio.file.Files.writeString(dir.resolve("enrichment.jsonl"),
      lines.mkString("\n"))
    dir.resolve("enrichment.jsonl").toString
  }

  def inputs(spark: SparkSession): ModelDag.RawInputs =
    ModelDag.RawInputs(
      customers = rawCustomers(spark),
      items = rawItems(spark),
      invoices = rawInvoices(spark),
      salesReceipts = rawSalesReceipts(spark),
      shopifyOrders = Some(rawShopifyOrders(spark)),
      shopifyFulfillments = Some(rawShopifyFulfillments(spark)),
      shopifyCustomers = Some(rawShopifyCustomers(spark)),
      shopifyProducts = Some(rawShopifyProducts(spark)),
      shopifyVariants = Some(rawShopifyVariants(spark)),
      tradeShowLeads = Some(rawTradeShowLeads(spark)),
      enrichmentJsonlPath = Some(enrichmentJsonl()),
      explicitNameMappings =
        Map("Bolt Supply Customer" -> "Bolt Supply House"))
}
