package graft

import org.apache.spark.sql.functions._
import graft.ref._
import graft.quality.Checks

/** End-to-end reference-pipeline run on the FIXTURES.md-shaped raw
  * tables, asserting the reference's own test battery (SURVEY §5):
  * schema tests on the marts, the Webgility channel regression, domain
  * consolidation behavior, and percent-amount typing.
  */
class RefPipelineSpec extends SparkSpec {

  private lazy val out: Map[String, org.apache.spark.sql.DataFrame] = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_spec")
    ModelDag.run(new Catalog(spark, wh.toString), RefFixtures.inputs(spark))
  }

  test("schema tests: unique + not_null + accepted_values on marts") {
    val orders = out("mart.fct_orders")
    val results = Seq(
      Checks.unique(orders, "fct_orders", "order_number"),
      Checks.notNull(orders, "fct_orders", "order_number"),
      Checks.acceptedValues(orders, "fct_orders", "sales_channel",
        Seq("Amazon", "Website", "Invoice", "Other")),
      Checks.acceptedValues(orders, "fct_orders", "customer_segment",
        Seq("OEM", "Distributor", "Export", "Direct")),
      Checks.unique(out("mart.fct_products"), "fct_products",
        "product_name"),
      Checks.uniqueCombination(out("mart.fct_company_orders"),
        "fct_company_orders", Seq("company_domain_key", "order_number")),
      Checks.nonEmpty(out("mart.fct_companies"), "fct_companies"))
    assert(Checks.runAll(results).forall(_.passed))
  }

  test("webgility regression: S- invoice with Credit Card terms → Website") {
    val ch = out("mart.fct_orders")
      .filter(col("order_number") === "S-2001")
      .select("sales_channel").head().getString(0)
    assert(ch == "Website")
  }

  test("amazon-classed order → Amazon channel") {
    val ch = out("mart.fct_orders")
      .filter(col("order_number") === "SR-3002")
      .select("sales_channel").head().getString(0)
    assert(ch == "Amazon")
  }

  test("domain consolidation: marketplace skipped, gmail individual, fastenal collapsed") {
    val dm = out("raw.domain_mapping").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(dm("marketplace.amazon.com") ==
      (("SKIP_AMAZON_MARKETPLACE", "skip")))
    assert(dm("gmail.com") == (("INDIVIDUAL_GMAIL.COM", "individual")))
    assert(dm("stores.fastenal.com") == (("fastenal.com", "corporate")))
    assert(dm("acme.com") == (("acme.com", "corporate")))
  }

  test("company consolidation merges same-domain customers") {
    val acme = out("mart.bridge_customer_company")
      .filter(col("company_domain_key") === "acme.com").count()
    assert(acme == 2, "both Acme customers should map to acme.com")
    val boltKey = out("intermediate.customer_company_mapping")
      .filter(col("customer_name").contains("Bolt Supply"))
      .select("company_domain_key").distinct().count()
    assert(boltKey == 1, "both Bolt Supply customers share one company key")
  }

  test("explicit name mapping takes precedence over automatic rules") {
    val m = out("raw.customer_name_mapping")
      .filter(col("original_name") === "Bolt Supply Customer")
      .select("normalized_name", "normalization_type").head()
    assert(m.getString(0) == "Bolt Supply House")
    assert(m.getString(1) == "explicit")
  }

  test("percent-string amount resolves against qty*rate base") {
    val amt = out("mart.fct_order_line_items")
      .filter(col("order_number") === "INV-1004")
      .select("line_amount").head().getDouble(0)
    assert(math.abs(amt - 0.12 * 20 * 14.50) < 1e-9)
  }

  test("multi-line order rolls to one row with summed amount") {
    val o = out("mart.fct_orders")
      .filter(col("order_number") === "INV-1001")
    assert(o.count() == 1)
    val r = o.select("line_count", "order_amount").head()
    assert(r.getLong(0) == 3)
    assert(math.abs(r.getDouble(1) - 231.0) < 1e-9)
  }

  test("items dedup to latest snapshot; enrichment parses carton count") {
    val anchors = out("mart.fct_products")
      .filter(col("product_name") === "01-6310.AK4")
    assert(anchors.count() == 1)
    val r = anchors
      .select("sales_price", "carton_count", "product_family",
        "is_master_pack").head()
    assert(r.getDouble(0) == 15.00, "latest snapshot wins")
    assert(r.getInt(1) == 72)
    assert(r.getString(2) == "01")
    val mst = out("mart.fct_products")
      .filter(col("product_name") === "01-6310.MST")
      .select("is_master_pack").head().getBoolean(0)
    assert(mst)
  }

  test("AR aging has three analysis levels and open orders only") {
    val aging = out("mart.dim_accounts_receivable_aging")
    val levels = aging.select("analysis_level").distinct()
      .collect().map(_.getString(0)).toSet
    assert(levels == Set("invoice", "customer", "bucket"))
  }

  test("DSO metrics: one row per trailing period with cross-joined AR") {
    val dso = out("mart.fct_dso_metrics")
    assert(dso.count() == 3)
    assert(dso.select("total_ar").distinct().count() == 1)
  }
}
