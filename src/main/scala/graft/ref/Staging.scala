package graft.ref

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Staging layer — trim/NULLIF cleanup, type casts, source-union
  * alignment, derived flags. Each builder takes the raw frames and
  * returns the staged DataFrame; names follow the reference models.
  *
  * Raw inputs carry the DLT conventions: every NULL loaded as '' and
  * metadata columns load_date/snapshot_date/is_seed present
  * (pipelines/quickbooks/pipeline.py:185-214).
  */
object Staging {

  private def nb(c: String): Column = Fns.nullifBlank(col(c))

  /** stg_quickbooks__customers (stg_quickbooks__customers.sql:11-112):
    * normalized customer name coalesce-chain, country inference from
    * state when blank (macros/country_normalization.sql:6-75). */
  def customers(raw: DataFrame): DataFrame =
    raw.select(
      nb("quick_books_internal_id").as("customer_id"),
      nb("customer_name").as("customer_name"),
      nb("company_name").as("company_name"),
      coalesce(nb("company_name"), nb("customer_name"),
        lit("Unknown Customer")).as("normalized_customer_name"),
      nb("main_email").as("main_email"),
      nb("cc_email").as("cc_email"),
      nb("billing_address_city").as("billing_city"),
      nb("billing_address_state").as("billing_state"),
      nb("billing_address_country").as("billing_country_raw"),
      Fns.normalizeCountry(col("billing_address_country"),
        col("billing_address_state")).as("billing_country"),
      nb("sales_rep").as("sales_rep"),
      nb("terms").as("terms"),
      Fns.safeNumeric(col("current_balance")).as("current_balance"),
      nb("created_date").cast("date").as("created_date"))

  /** stg_quickbooks__customer_contacts_clean
    * (stg_quickbooks__customer_contacts_clean.sql:18-44, P8): the
    * contact-facing cleanup staging — every contact field trimmed and
    * ''→NULL. Name/phone/title columns are optional on thin raws
    * (macros/optional_columns.sql pattern); audit timestamps
    * (processed_at) are deliberately dropped per the determinism rules. */
  def customerContactsClean(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StringType
    def o(n: String): Column =
      Fns.nullifBlank(Fns.firstExistingColumnOrNull(raw, Seq(n), StringType))
        .as(n)
    raw.select(
      nb("quick_books_internal_id").as("customer_id"),
      nb("customer_name").as("customer_name"),
      nb("company_name").as("company_name"),
      nb("main_email").as("main_email"),
      nb("cc_email").as("cc_email"),
      o("first_name"), o("last_name"), o("name_title"), o("job_title"),
      o("main_phone"), o("alt_phone"), o("work_phone"), o("mobile_phone"),
      o("fax"),
      o("billing_address_line_1"),
      nb("billing_address_city").as("billing_address_city"),
      nb("billing_address_state").as("billing_address_state"),
      o("billing_address_postal_code"),
      o("customer_type"),
      Fns.safeNumeric(col("current_balance")).as("current_balance"),
      Fns.nullifBlank(Fns.firstExistingColumnOrNull(raw, Seq("status"),
        StringType)).as("customer_status"),
      nb("created_date").cast("date").as("created_date"))
  }

  /** stg_quickbooks__items (stg_quickbooks__items.sql:6-53). */
  def items(raw: DataFrame): DataFrame =
    raw.select(
      nb("quick_books_internal_id").as("item_id"),
      nb("item_name").as("item_name"),
      nb("item_type").as("item_type"),
      nb("sales_description").as("sales_description"),
      Fns.safeNumeric(col("sales_price")).as("sales_price"),
      Fns.safeNumeric(col("purchase_cost")).as("purchase_cost"),
      Fns.safeNumeric(col("quantity_on_hand")).as("quantity_on_hand"),
      nb("u_m").as("unit_of_measure"),
      nb("status").as("status"),
      nb("snapshot_date").as("snapshot_date"),
      col("load_date"))

  /** Optional order-item columns (base_quickbooks__order_items.sql:1-173,
    * int_quickbooks__orders.sql:27-74): present in the full QuickBooks
    * export, but tolerated as absent via the optional-columns macro
    * (macros/optional_columns.sql:6-22) so thin raws keep working. */
  private def optionalOrderCols(raw: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types.{StringType, DoubleType}
    def s(n: String): Column =
      Fns.nullifBlank(Fns.firstExistingColumnOrNull(raw, Seq(n), StringType))
        .as(n)
    def d(n: String): Column =
      Fns.nullifBlank(Fns.firstExistingColumnOrNull(raw, Seq(n), StringType))
        .cast("date").as(n)
    def num(n: String): Column =
      (if (raw.columns.contains(n)) Fns.safeNumeric(col(n))
       else lit(null).cast(DoubleType)).as(n)
    Seq(
      d("due_date"),
      s("billing_address_line_1"), s("billing_address_line_2"),
      s("billing_address_line_3"), s("billing_address_postal_code"),
      s("shipping_address_line_1"), s("shipping_address_line_2"),
      s("shipping_address_line_3"), s("shipping_address_city"),
      s("shipping_address_state"), s("shipping_address_postal_code"),
      s("shipping_address_country"),
      s("shipping_method"), d("ship_date"),
      s("memo"), s("message_to_customer"), s("currency"),
      num("exchange_rate"), num("total_tax"),
      s("transaction_id"), s("quickbooks_internal_id"), s("external_id"),
      d("created_date"), d("modified_date"))
  }

  /** base_quickbooks__order_items (base_quickbooks__order_items.sql:1-173):
    * invoices ∪ sales receipts with per-source renames, hardcoded
    * status/payment_method, NULL pads for columns absent on one side. */
  def baseOrderItems(invoices: DataFrame, receipts: DataFrame): DataFrame = {
    val inv = invoices.select(Seq(
      nb("invoice_no").as("order_number"),
      nb("invoice_date").cast("date").as("order_date"),
      nb("customer").as("customer"),
      nb("product_service").as("product_service"),
      nb("product_service_description").as("product_service_description"),
      Fns.safeNumeric(col("product_service_quantity"))
        .as("product_service_quantity"),
      Fns.safeNumeric(col("product_service_rate")).as("product_service_rate"),
      nb("product_service__amount").as("product_service_amount_raw"),
      nb("status").as("status"),
      lit("invoice").as("payment_method"),
      nb("customer_sales_tax_code").as("customer_sales_tax_code"),
      nb("class").as("class"),
      nb("terms").as("terms"),
      Fns.safeNumeric(col("total_amount")).as("total_amount"),
      nb("sales_rep").as("sales_rep"),
      nb("billing_address_city").as("billing_city"),
      nb("billing_address_state").as("billing_state"),
      nb("billing_address_country").as("billing_country"),
      lit("invoice").as("source_type")) ++ optionalOrderCols(invoices): _*)
    val rec = receipts.select(Seq(
      nb("sales_receipt_no").as("order_number"),
      nb("sales_receipt_date").cast("date").as("order_date"),
      nb("customer").as("customer"),
      nb("product_service").as("product_service"),
      nb("product_service_description").as("product_service_description"),
      Fns.safeNumeric(col("product_service_quantity"))
        .as("product_service_quantity"),
      Fns.safeNumeric(col("product_service_rate")).as("product_service_rate"),
      nb("product_service_amount").as("product_service_amount_raw"),
      lit("PAID").as("status"),
      nb("payment_method").as("payment_method"),
      nb("customer_sales_tax_code").as("customer_sales_tax_code"),
      nb("class").as("class"),
      lit(null).cast("string").as("terms"),
      Fns.safeNumeric(col("total_amount")).as("total_amount"),
      nb("sales_rep").as("sales_rep"),
      nb("billing_address_city").as("billing_city"),
      nb("billing_address_state").as("billing_state"),
      lit(null).cast("string").as("billing_country"),
      lit("sales_receipt").as("source_type")) ++
      optionalOrderCols(receipts): _*)
    inv.unionByName(rec, allowMissingColumns = true)
  }

  /** stg_quickbooks__order_items_tax_status
    * (stg_quickbooks__order_items_tax_status.sql:9-40). */
  def orderItemsTaxStatus(base: DataFrame): DataFrame =
    base.withColumn("is_tax_exempt",
      Fns.taxExemptFlag(col("customer_sales_tax_code")))

  /** int_quickbooks__order_items_typed
    * (int_quickbooks__order_items_typed.sql): status normalization +
    * numeric guards; dates already cast in base. */
  def orderItemsTyped(staged: DataFrame): DataFrame =
    staged
      .withColumn("order_status",
        when(upper(col("status")).isin("PAID", "CLOSED"), "PAID")
          .when(upper(col("status")) === "OPEN", "OPEN")
          .when(upper(col("status")).contains("PARTIAL"), "PARTIALLY_PAID")
          .otherwise(coalesce(upper(col("status")), lit("UNKNOWN"))))
      // Percent-string amounts are a percentage of the line's qty×rate
      // base (int_quickbooks__order_items_typed.sql:114-131).
      .withColumn("product_service_amount",
        when(col("product_service_amount_raw").isNull,
          lit(null).cast("double"))
          .otherwise(Fns.percentOrAbsolute(
            col("product_service_amount_raw"),
            col("product_service_quantity") * col("product_service_rate"))))
      .withColumn("line_amount",
        coalesce(col("product_service_amount"),
          col("product_service_quantity") * col("product_service_rate")))

  /** stg_quickbooks__domain_mapping / customer_name_mapping staging
    * (stg_quickbooks__domain_mapping.sql:10-28): lowercase/trim/filter. */
  def domainMapping(raw: DataFrame): DataFrame =
    raw.select(
      lower(trim(col("original_domain"))).as("original_domain"),
      trim(col("normalized_domain")).as("normalized_domain"),
      col("domain_type"))
      .filter(col("original_domain").isNotNull &&
        col("original_domain") =!= "")

  def customerNameMapping(raw: DataFrame): DataFrame =
    raw.select(
      trim(col("original_name")).as("original_name"),
      trim(col("normalized_name")).as("normalized_name"),
      col("normalization_type"))
      .filter(col("original_name").isNotNull && col("original_name") =!= "")
}
