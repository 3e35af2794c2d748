package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det._

/** Flagship end-to-end chain oracle: raw invoice rows (synthesized from
  * lineitem ⋈ orders) pushed through the REAL model chain —
  * `Staging.baseOrderItems` → `orderItemsTaxStatus` → `orderItemsTyped`
  * → `Intermediate.orders` → `Marts.fctOrders` — and compared against a
  * DuckDB twin of the full pipeline semantics: percent-string amounts,
  * tax tri-state + BOOL_OR rollup, status normalization, sales-channel
  * and customer-segment attribution, the country macro family, and the
  * fct_orders flag/metric surface. The synthesized raws exercise the
  * load-bearing branches: 'S-' credit-card website orders, Amazon
  * classes, percent amounts (line 7), backdated due dates (order%11),
  * state-only country inference.
  */
object OrdersChainQueries {

  val a1FctOrdersChain: Q = {
    val countryCase = (c: String, s: String) =>
      s"""CASE WHEN UPPER(TRIM($c)) IN ('USA','US','UNITED STATES','U.S.','U.S.A.') THEN 'United States'
        |       WHEN UPPER(TRIM($c)) IN ('CA','CANADA') THEN 'Canada'
        |       WHEN UPPER(TRIM($c)) IN ('UK','UNITED KINGDOM','GB','GREAT BRITAIN') THEN 'United Kingdom'
        |       WHEN NULLIF(TRIM($c), '') IS NOT NULL
        |            THEN UPPER(LEFT(TRIM($c), 1)) || LOWER(SUBSTR(TRIM($c), 2))
        |       WHEN UPPER(TRIM($s)) IN ('AL','AK','AZ','AR','CA','CO','CT','DE','FL','GA','HI','ID','IL','IN','IA','KS','KY','LA','ME','MD','MA','MI','MN','MS','MO','MT','NE','NV','NH','NJ','NM','NY','NC','ND','OH','OK','OR','PA','RI','SC','SD','TN','TX','UT','VT','VA','WA','WV','WI','WY','DC','PR','VI','GU','AS','MP','AA','AE') THEN 'United States'
        |       WHEN UPPER(TRIM($s)) IN ('AB','BC','MB','NB','NL','NS','NT','NU','ON','PE','QC','SK','YT') THEN 'Canada'
        |       ELSE 'United States' END""".stripMargin
    Q.sql(
      "a1_fct_orders_chain",
      s"""WITH raw AS (
        |  SELECT
        |    CASE WHEN o.o_custkey % 10 = 0 THEN 'S-' || CAST(l.l_orderkey AS VARCHAR)
        |         ELSE 'INV-' || CAST(l.l_orderkey AS VARCHAR) END AS order_number,
        |    CAST(o.o_orderdate AS DATE) AS order_date,
        |    'C' || CAST(o.o_custkey AS VARCHAR) AS customer,
        |    CASE WHEN l.l_linenumber = 7
        |         THEN 0.12 * (l.l_quantity * (l.l_extendedprice * (1 - l.l_discount)))
        |         ELSE l.l_extendedprice END AS line_amount_resolved,
        |    CASE WHEN l.l_linenumber = 7
        |         THEN 0.12 * (l.l_quantity * (l.l_extendedprice * (1 - l.l_discount)))
        |         ELSE l.l_extendedprice END AS amount_resolved,
        |    CASE o.o_orderstatus WHEN 'O' THEN 'OPEN'
        |         WHEN 'F' THEN 'PAID' ELSE 'PARTIALLY_PAID' END AS order_status,
        |    CASE l.l_returnflag WHEN 'R' THEN 'Non'
        |         WHEN 'A' THEN 'Tax' ELSE '' END AS tax_code,
        |    CASE substr(o.o_orderpriority, 1, 1)
        |         WHEN '1' THEN 'OEM' WHEN '2' THEN 'Distributor'
        |         WHEN '3' THEN 'EXPORT' WHEN '4' THEN 'Amazon FBA'
        |         ELSE '' END AS cls,
        |    CASE WHEN o.o_custkey % 10 = 0 THEN 'Credit Card'
        |         ELSE 'Net 30' END AS terms,
        |    o.o_totalprice AS total_amount,
        |    l.l_returnflag AS sales_rep,
        |    CASE WHEN o.o_custkey % 4 = 0 THEN 'TX'
        |         WHEN o.o_custkey % 4 = 1 THEN 'ON'
        |         WHEN o.o_custkey % 4 = 2 THEN 'CA' ELSE '' END AS b_state,
        |    CASE WHEN o.o_custkey % 5 = 0 THEN 'USA'
        |         WHEN o.o_custkey % 5 = 1 THEN 'ca'
        |         WHEN o.o_custkey % 5 = 2 THEN ''
        |         WHEN o.o_custkey % 5 = 3 THEN 'uk'
        |         ELSE 'Germany' END AS b_country,
        |    CASE WHEN l.l_orderkey % 11 = 0 THEN CAST(o.o_orderdate AS DATE) - 5
        |         ELSE CAST(o.o_orderdate AS DATE) + 30 END AS due_date,
        |    CASE WHEN l.l_orderkey % 13 = 0 THEN 'rush' END AS memo
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), rolled AS (
        |  SELECT order_number,
        |    MAX(order_date) AS order_date,
        |    MAX(customer) AS customer,
        |    MAX(order_status) AS order_status,
        |    MAX(terms) AS terms,
        |    MAX(NULLIF(cls, '')) AS order_class,
        |    MAX(sales_rep) AS sales_rep,
        |    MAX(NULLIF(b_state, '')) AS billing_address_state,
        |    MAX(b_country) AS b_country_raw,
        |    MAX(due_date) AS due_date,
        |    MAX(memo) AS memo,
        |    BOOL_OR(COALESCE(
        |      CASE WHEN lower(tax_code) LIKE '%non%' THEN TRUE
        |           WHEN lower(tax_code) LIKE '%tax%' THEN FALSE
        |           END, FALSE)) AS is_tax_exempt,
        |    ${sqlDsum("line_amount_resolved")} AS order_amount,
        |    ${sqlDsum("amount_resolved")} AS total_line_items_amount,
        |    MAX(total_amount) AS total_amount,
        |    COUNT(*) AS line_count,
        |    COUNT(*) AS item_count
        |  FROM raw
        |  GROUP BY order_number
        |), attributed AS (
        |  SELECT *,
        |    ${countryCase("b_country_raw", "billing_address_state")} AS primary_country,
        |    CASE WHEN UPPER(COALESCE(order_class, '')) LIKE '%AMAZON%' THEN 'Amazon'
        |         WHEN order_number LIKE 'S-%' AND UPPER(COALESCE(terms, '')) = 'CREDIT CARD' THEN 'Website'
        |         ELSE 'Invoice' END AS sales_channel,
        |    CASE WHEN UPPER(COALESCE(order_class, '')) LIKE '%OEM%' THEN 'OEM'
        |         WHEN UPPER(COALESCE(order_class, '')) LIKE '%DISTRIBUTOR%' THEN 'Distributor'
        |         WHEN UPPER(COALESCE(order_class, '')) LIKE '%EXPORT%' THEN 'Export'
        |         ELSE 'Direct' END AS customer_segment
        |  FROM rolled
        |)
        |SELECT order_number,
        |  CAST(order_date AS VARCHAR) AS order_date,
        |  customer, order_status, terms, order_class, sales_rep,
        |  'invoice' AS source_type, billing_address_state,
        |  primary_country,
        |  CASE WHEN primary_country = 'United States' THEN 'United States'
        |       WHEN primary_country = 'Canada' THEN 'Canada'
        |       ELSE 'International' END AS country_category,
        |  CASE WHEN primary_country IN ('United States', 'Canada')
        |       THEN 'North America' ELSE 'International' END AS region,
        |  sales_channel, customer_segment, is_tax_exempt,
        |  order_amount, total_line_items_amount, total_amount,
        |  line_count, item_count,
        |  order_status = 'PAID' AS is_paid,
        |  COALESCE(due_date < order_date, FALSE) AS is_backdated,
        |  CAST(due_date AS VARCHAR) AS due_date,
        |  memo,
        |  0.0 AS effective_tax_rate
        |FROM attributed
        |ORDER BY order_number""".stripMargin) { (s, d) =>
      import graft.ref.{Staging, Intermediate, Marts}
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
      val rawInvoices = joined.select(
        when(col("o_custkey") % 10 === 0,
          concat(lit("S-"), col("l_orderkey").cast("string")))
          .otherwise(concat(lit("INV-"), col("l_orderkey").cast("string")))
          .as("invoice_no"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("invoice_date"),
        concat(lit("C"), col("o_custkey").cast("string")).as("customer"),
        concat(lit("P"), col("l_partkey").cast("string"))
          .as("product_service"),
        concat(lit("line "), col("l_linestatus"))
          .as("product_service_description"),
        col("l_quantity").as("product_service_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("product_service_rate"),
        // percent-string amount on line 7 exercises percentOrAbsolute
        when(col("l_linenumber") === 7, "12%")
          .otherwise(col("l_extendedprice").cast("string"))
          .as("product_service__amount"),
        when(col("o_orderstatus") === "O", "Open")
          .when(col("o_orderstatus") === "F", "Paid")
          .otherwise("Partially Paid").as("status"),
        when(col("l_returnflag") === "R", "Non")
          .when(col("l_returnflag") === "A", "Tax")
          .otherwise("").as("customer_sales_tax_code"),
        when(substring(col("o_orderpriority"), 1, 1) === "1", "OEM")
          .when(substring(col("o_orderpriority"), 1, 1) === "2",
            "Distributor")
          .when(substring(col("o_orderpriority"), 1, 1) === "3", "EXPORT")
          .when(substring(col("o_orderpriority"), 1, 1) === "4",
            "Amazon FBA")
          .otherwise("").as("class"),
        when(col("o_custkey") % 10 === 0, "Credit Card")
          .otherwise("Net 30").as("terms"),
        col("o_totalprice").as("total_amount"),
        col("l_returnflag").as("sales_rep"),
        lit("").as("billing_address_city"),
        when(col("o_custkey") % 4 === 0, "TX")
          .when(col("o_custkey") % 4 === 1, "ON")
          .when(col("o_custkey") % 4 === 2, "CA")
          .otherwise("").as("billing_address_state"),
        when(col("o_custkey") % 5 === 0, "USA")
          .when(col("o_custkey") % 5 === 1, "ca")
          .when(col("o_custkey") % 5 === 2, "")
          .when(col("o_custkey") % 5 === 3, "uk")
          .otherwise("Germany").as("billing_address_country"),
        when(col("l_orderkey") % 11 === 0,
          date_format(date_sub(col("o_orderdate").cast("date"), 5),
            "yyyy-MM-dd"))
          .otherwise(date_format(
            date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd"))
          .as("due_date"),
        when(col("l_orderkey") % 13 === 0, "rush").otherwise("")
          .as("memo"))
      // empty-but-typed receipts side: the union operator itself is
      // proven by p1_union_align; here the invoices-only path keeps the
      // oracle tractable.
      val emptyReceipts = rawInvoices.filter(lit(false)).select(
        col("invoice_no").as("sales_receipt_no"),
        col("invoice_date").as("sales_receipt_date"),
        col("customer"), col("product_service"),
        col("product_service_description"),
        col("product_service_quantity"), col("product_service_rate"),
        col("product_service__amount").as("product_service_amount"),
        lit("").as("payment_method"), col("customer_sales_tax_code"),
        col("class"), col("total_amount"), col("sales_rep"),
        col("billing_address_city"), col("billing_address_state"))
      val typed = Staging.orderItemsTyped(
        Staging.orderItemsTaxStatus(
          Staging.baseOrderItems(rawInvoices, emptyReceipts)))
      val fct = Marts.fctOrders(Intermediate.orders(typed), None, None)
      fct.select(
        col("order_number"),
        col("order_date").cast("string").as("order_date"),
        col("customer"), col("order_status"), col("terms"),
        col("order_class"), col("sales_rep"), col("source_type"),
        col("billing_address_state"), col("primary_country"),
        col("country_category"), col("region"), col("sales_channel"),
        col("customer_segment"), col("is_tax_exempt"),
        col("order_amount"), col("total_line_items_amount"),
        col("total_amount"), col("line_count"), col("item_count"),
        col("is_paid"), col("is_backdated"),
        col("due_date").cast("string").as("due_date"),
        col("memo"), col("effective_tax_rate"))
        .orderBy("order_number")
    }
  }

  val all: Seq[Q] = Seq(a1FctOrdersChain)
}
