package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic topological runner for the reference's model DAG
  * (SURVEY §3.2) — stages 1-3 of the orchestrator collapsed into one
  * SparkSession: consolidation job, staging views, intermediate
  * tables/views, marts (all marts materialized as tables, like
  * dbt_project.yml:20-33). The Shopify dependency is existence-guarded
  * at plan-construction time (fct_orders.sql:24-55); trade-show-style
  * mart-reads-mart edges are expressed by running marts in declared
  * order.
  */
object ModelDag {

  /** Raw inputs, reference-shaped (FIXTURES.md). */
  final case class RawInputs(
      customers: DataFrame,
      items: DataFrame,
      invoices: DataFrame,
      salesReceipts: DataFrame,
      individualDomains: Seq[String] = Seq("gmail.com", "yahoo.com",
        "hotmail.com", "outlook.com", "aol.com"),
      explicitNameMappings: Map[String, String] = Map.empty)

  final val AsOfDate = "2024-06-30"

  /** Runs the full DAG; returns every materialized model by name. */
  def run(cat: Catalog, raw: RawInputs): Map[String, DataFrame] = {
    // ---- consolidation job (python pre-transform, SURVEY §3.3) ----
    val domainMappingRaw = cat.saveTable("raw", "domain_mapping",
      DomainConsolidation.buildDomainMapping(raw.customers,
        raw.individualDomains))
    val nameMappingRaw = cat.saveTable("raw", "customer_name_mapping",
      DomainConsolidation.buildCustomerNameMapping(raw.customers,
        raw.explicitNameMappings))

    // ---- staging (views; mapping stagings are tables per
    //      stg_quickbooks__domain_mapping.sql:4-7) ----
    val stgCustomers = cat.saveView("staging", "customers",
      Staging.customers(raw.customers))
    val stgItems = cat.saveView("staging", "items",
      Staging.items(raw.items))
    val base = cat.saveView("staging", "base_order_items",
      Staging.baseOrderItems(raw.invoices, raw.salesReceipts))
    val taxed = cat.saveView("staging", "order_items_tax_status",
      Staging.orderItemsTaxStatus(base))
    val stgDomainMapping = cat.saveTable("staging", "domain_mapping",
      Staging.domainMapping(domainMappingRaw))
    val stgNameMapping = cat.saveTable("staging", "customer_name_mapping",
      Staging.customerNameMapping(nameMappingRaw))

    // ---- intermediate ----
    val typed = cat.saveView("intermediate", "order_items_typed",
      Staging.orderItemsTyped(taxed))
    val orders = cat.saveTable("intermediate", "orders",
      Intermediate.orders(typed))
    val revenue = cat.saveTable("intermediate", "customer_revenue",
      Intermediate.customerRevenue(orders))
    val itemsEnriched = cat.saveTable("intermediate", "items_enriched",
      Intermediate.itemsEnriched(stgItems))
    val mapping = cat.saveTable("intermediate", "customer_company_mapping",
      Intermediate.customerCompanyMapping(stgCustomers, stgDomainMapping,
        stgNameMapping))
    val consolidation = cat.saveTable("intermediate",
      "company_consolidation",
      Intermediate.companyConsolidation(mapping, revenue))

    // ---- marts (tables) ----
    val shopify =
      if (cat.exists("intermediate", "shopify_orders_enriched"))
        Some(cat.load("intermediate", "shopify_orders_enriched"))
      else None
    val fctOrders = cat.saveTable("mart", "fct_orders",
      Marts.fctOrders(orders, shopify))
    val fctProducts = cat.saveTable("mart", "fct_products",
      Marts.fctProducts(itemsEnriched))
    val fctLineItems = cat.saveTable("mart", "fct_order_line_items",
      Marts.fctOrderLineItems(typed, fctProducts))
    val fctCompanies = cat.saveTable("mart", "fct_companies",
      Marts.fctCompanies(consolidation))
    val bridge = cat.saveTable("mart", "bridge_customer_company",
      Marts.bridgeCustomerCompany(mapping))
    val companyOrders = cat.saveTable("mart", "fct_company_orders",
      Marts.fctCompanyOrders(fctLineItems, bridge))
    val aging = cat.saveTable("mart", "dim_accounts_receivable_aging",
      Marts.arAging(fctOrders, AsOfDate))
    val dso = cat.saveTable("mart", "fct_dso_metrics",
      Marts.dsoMetrics(fctOrders, AsOfDate))
    val periodMetrics = cat.saveTable("mart", "mart_company_period_metrics",
      Marts.companyPeriodMetrics(companyOrders, AsOfDate))

    Map(
      "raw.domain_mapping" -> domainMappingRaw,
      "raw.customer_name_mapping" -> nameMappingRaw,
      "staging.customers" -> stgCustomers,
      "staging.items" -> stgItems,
      "staging.base_order_items" -> base,
      "intermediate.orders" -> orders,
      "intermediate.customer_revenue" -> revenue,
      "intermediate.items_enriched" -> itemsEnriched,
      "intermediate.customer_company_mapping" -> mapping,
      "intermediate.company_consolidation" -> consolidation,
      "mart.fct_orders" -> fctOrders,
      "mart.fct_products" -> fctProducts,
      "mart.fct_order_line_items" -> fctLineItems,
      "mart.fct_companies" -> fctCompanies,
      "mart.bridge_customer_company" -> bridge,
      "mart.fct_company_orders" -> companyOrders,
      "mart.dim_accounts_receivable_aging" -> aging,
      "mart.fct_dso_metrics" -> dso,
      "mart.mart_company_period_metrics" -> periodMetrics)
  }
}
