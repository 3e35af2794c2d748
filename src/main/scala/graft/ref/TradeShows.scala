package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns
import graft.functions.Det.dsum

/** Trade-show models (SURVEY S10, J10, J12-rewrite, A14):
  * stg_trade_shows__leads → leads_with_company_match →
  * fct_trade_show_leads → fct_trade_show_performance.
  */
object TradeShows {

  /** stg_trade_shows__leads (stg_trade_shows__leads.sql:16-134):
    * trim/NULLIF, full name, lowered email + domain, personal-email
    * classification, generated ids for missing lead_ids, dedup by email
    * preferring non-generated ids then earliest created. */
  def leads(raw: DataFrame, personalDomains: Seq[String]): DataFrame = {
    // Personal/address/show-context columns are optional on thin raws
    // (stg_trade_shows__leads.sql full surface).
    def o(n: String) = {
      import org.apache.spark.sql.types.StringType
      Fns.nullifBlank(Fns.firstExistingColumnOrNull(raw, Seq(n),
        StringType)).as(n)
    }
    val cleaned = raw.select(
      Fns.nullifBlank(col("lead_id")).as("lead_id_raw"),
      Fns.nullifBlank(col("first_name")).as("first_name"),
      Fns.nullifBlank(col("last_name")).as("last_name"),
      Fns.nullifBlank(col("company")).as("company"),
      lower(trim(col("email"))).as("email"),
      Fns.nullifBlank(col("created")).cast("date").as("created"),
      col("show_name"),
      col("show_date").cast("date").as("show_date"),
      o("title"), o("phone"), o("address_1"), o("address_2"), o("city"),
      o("state"), o("postal_code"), o("country"), o("show_location"),
      o("show_rep"), o("source_id"), o("notes"))
      .filter(col("email").isNotNull && col("email") =!= "")
      .withColumn("lead_id",
        coalesce(col("lead_id_raw"),
          Fns.generatedLeadId(col("first_name"), col("last_name"),
            col("email"), col("show_name"))))
      .withColumn("full_name",
        concat_ws(" ", col("first_name"), col("last_name")))
      .withColumn("email_domain", Fns.splitPart(col("email"), "@", 2))
      .withColumn("is_personal_email",
        col("email_domain").isin(personalDomains: _*))
      .withColumn("email_type",
        when(col("email_domain").isin(personalDomains: _*),
          "personal_email").otherwise("business_email"))
      .withColumn("has_valid_email",
        col("email").contains("@") &&
          Fns.splitPart(col("email"), "@", 2) =!= "")
      .withColumn("has_company_name", col("company").isNotNull)
      .withColumn("has_phone", col("phone").isNotNull)
    val w = Window.partitionBy(col("email"))
      .orderBy(col("lead_id").startsWith("gen_").cast("int"),
        col("created").asc_nulls_last, col("lead_id"))
    cleaned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "lead_id_raw")
  }

  /** int_trade_shows__leads_with_company_match
    * (int_trade_shows__leads_with_company_match.sql:17-64, J10): leads ⋈
    * domain_mapping ⋈ fct_companies — a mart-level dependency, so this
    * model runs after the company marts (SURVEY §3.2 wrinkle #2). */
  def leadsWithCompanyMatch(leads: DataFrame, domainMapping: DataFrame,
                            fctCompanies: DataFrame): DataFrame =
    leads
      .join(broadcast(domainMapping.select(
        col("original_domain").as("email_domain"),
        col("normalized_domain"), col("domain_type"))),
        Seq("email_domain"), "left")
      .withColumn("company_domain_key",
        when(col("domain_type") === "corporate", col("normalized_domain")))
      .join(broadcast(fctCompanies.select(col("company_domain_key"),
        col("company_name").as("matched_company_name"),
        col("total_revenue").as("company_lifetime_revenue"),
        col("total_orders").as("company_lifetime_orders"),
        col("first_order_date").as("company_first_order_date"),
        col("latest_order_date").as("company_latest_order_date"))),
        Seq("company_domain_key"), "left")
      .withColumn("matched_to_company",
        col("matched_company_name").isNotNull)
      // is_new_customer_from_show: company's first-ever order is on or
      // after the show (fct_trade_show_leads company matching CTEs).
      .withColumn("is_new_customer_from_show",
        coalesce(col("company_first_order_date") >= col("show_date"),
          lit(false)))

  /** fct_trade_show_leads — the J12 REWRITE: the reference computes 6
    * correlated scalar subqueries per lead over company_orders
    * (fct_trade_show_leads.sql:107-170,216-222); here it is ONE left
    * join on company_domain_key with order_date >= show_date plus
    * conditional aggregation per window. Leads with no matched company
    * (NULL key) keep zero revenue via the left join + coalesce —
    * row multiplicity preserved (SURVEY §7.4 #3). */
  def fctLeads(matchedLeads: DataFrame,
               companyOrders: DataFrame,
               customerEmails: Option[DataFrame] = None): DataFrame = {
    // Renamed join key: leads and orders can share a source scan in
    // synthesized pipelines (self-join lineage) — a unique name keeps
    // the range-conditioned join unambiguous.
    val ordersSide = companyOrders.select(
      col("company_domain_key").as("co_company"),
      col("order_date"), col("order_amount"),
      (if (companyOrders.columns.contains("purchaser_email"))
        col("purchaser_email")
      else lit(null).cast("string")).as("purchaser_email"))
    val joined = matchedLeads
      .join(ordersSide,
        col("company_domain_key") === col("co_company") &&
          col("order_date") >= col("show_date"), "left")
      .drop("co_company")
    def winSum(days: Int) = coalesce(
      dsum(when(col("order_date") <= date_add(col("show_date"), days),
        col("order_amount"))), lit(0.0))
    def winCnt(days: Int) =
      sum(when(col("order_date") <= date_add(col("show_date"), days), 1)
        .otherwise(0))
    // Aggregate by (lead_id, show_date) ONLY — show_date because the
    // window conditions reference it inside the aggregate expressions;
    // every other lead attribute is functionally dependent on lead_id
    // (the leads staging dedups to unique lead_ids) and is joined back
    // AFTER the rollup. The alternative — ~20 mixed-type grouping keys
    // — would drag every lead string through the countDistinct Expand
    // (2× the joined rows) and the aggregate hash buffers; at scale
    // that is most of the shuffle width for zero information.
    val grouped0 = joined
      .groupBy(col("lead_id"), col("show_date"))
      .agg(
        winSum(30).as("revenue_30d"),
        winSum(90).as("revenue_90d"),
        winSum(180).as("revenue_180d"),
        winSum(365).as("revenue_365d"),
        coalesce(dsum(col("order_amount")), lit(0.0))
          .as("revenue_all_time"),
        winCnt(90).as("orders_90d"),
        winCnt(365).as("orders_365d"),
        sum(when(col("order_amount").isNotNull, 1).otherwise(0))
          .as("orders_all_time"),
        // distinct purchasers at the company since the show
        // (fct_trade_show_leads.sql:216-222) — decorrelated into the
        // same conditional aggregate instead of a scalar subquery.
        countDistinct(col("purchaser_email"))
          .as("distinct_purchasers_count"),
        min(when(col("order_amount").isNotNull, col("order_date")))
          .as("first_order_after_show"))
      .drop("show_date")
    val grouped = matchedLeads.join(grouped0, Seq("lead_id"))
      .withColumn("days_to_conversion",
        datediff(col("first_order_after_show"), col("show_date")))
      // Attribution windows off the company's FIRST-EVER order date
      // (fct_trade_show_leads.sql:60-106): did the company become a
      // buyer inside the window after the show.
      .withColumn("days_from_show_to_first_order",
        datediff(col("company_first_order_date"), col("show_date")))
    val withAttr = Seq(30, 90, 180, 365).foldLeft(grouped) { (df, d) =>
      df.withColumn(s"attributed_${d}d",
        coalesce(col("company_first_order_date") >= col("show_date") &&
          col("company_first_order_date") <=
            date_add(col("show_date"), d), lit(false)))
    }.withColumn("attributed_all_time",
      coalesce(col("company_first_order_date") >= col("show_date"),
        lit(false)))
    // J14: is THIS lead's email one of the company's customer emails
    // (fct_trade_show_leads.sql:254-257) — equi-join on
    // (company, lower(email)), broadcast dim.
    customerEmails match {
      case Some(ce) =>
        // Renamed join keys: leads and the email dim may share a source
        // scan (self-join lineage), so df("col") references would be
        // ambiguous — unique names disambiguate at analysis time.
        val emails = ce.select(
          col("company_domain_key").as("ce_company"),
          lower(col("customer_email")).as("ce_email")).distinct()
        withAttr.join(broadcast(emails),
          col("company_domain_key") === col("ce_company") &&
            lower(col("email")) === col("ce_email"), "left")
          .withColumn("lead_email_is_customer", col("ce_email").isNotNull)
          .drop("ce_company", "ce_email")
      case None =>
        withAttr.withColumn("lead_email_is_customer", lit(false))
    }
  }

  /** fct_trade_show_performance (fct_trade_show_performance.sql:16-120,
    * A14): per-show rollup — the full conditional-sum battery (lead
    * collection, categorization, person-vs-company attribution, per
    * window conversions/revenue/orders, averages and derived rates) in
    * ONE hash aggregate. */
  def showPerformance(fctLeads: DataFrame): DataFrame = {
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1).otherwise(0))
    val extraKeys = Seq("show_location", "show_rep")
      .filter(fctLeads.columns.contains).map(col)
    val validEmails =
      if (fctLeads.columns.contains("has_valid_email"))
        countDistinct(when(col("has_valid_email"), col("email")))
      else countDistinct(col("email"))
    fctLeads
      .groupBy(Seq(col("show_name"), col("show_date")) ++ extraKeys: _*)
      .agg(
        count(lit(1)).as("total_leads_collected"),
        countDistinct(col("email")).as("unique_emails_collected"),
        validEmails.as("valid_emails"),
        countDistinct(when(col("matched_to_company"),
          col("company_domain_key"))).as("companies_matched"),
        cnt(col("matched_to_company")).as("leads_matched_to_companies"),
        cnt(!col("matched_to_company")).as("leads_unmatched"),
        cnt(col("is_personal_email")).as("leads_individual_emails"),
        cnt(col("lead_email_is_customer"))
          .as("leads_who_are_direct_customers"),
        cnt(!col("lead_email_is_customer") && col("attributed_all_time"))
          .as("leads_attributed_via_company_colleagues"),
        sum(col("distinct_purchasers_count"))
          .as("total_distinct_purchasers"),
        cnt(col("is_new_customer_from_show")).as("new_customers_acquired"),
        cnt(col("attributed_30d")).as("conversions_30d"),
        sum(col("revenue_30d")).as("total_revenue_30d"),
        cnt(col("attributed_90d")).as("conversions_90d"),
        sum(col("revenue_90d")).as("total_revenue_90d"),
        sum(col("orders_90d")).as("total_orders_90d"),
        cnt(col("attributed_180d")).as("conversions_180d"),
        sum(col("revenue_180d")).as("total_revenue_180d"),
        cnt(col("attributed_365d")).as("conversions_365d"),
        sum(col("revenue_365d")).as("total_revenue_365d"),
        sum(col("orders_365d")).as("total_orders_365d"),
        cnt(col("attributed_all_time")).as("conversions_all_time"),
        sum(col("revenue_all_time")).as("total_revenue_all_time"),
        sum(col("orders_all_time")).as("total_orders_all_time"),
        avg(when(col("attributed_90d"),
          col("days_from_show_to_first_order")))
          .as("avg_days_to_conversion_90d"),
        avg(when(col("attributed_365d"),
          col("days_from_show_to_first_order")))
          .as("avg_days_to_conversion_365d"),
        avg(when(col("attributed_all_time"),
          col("days_from_show_to_first_order")))
          .as("avg_days_to_conversion_all_time"),
        avg(col("days_to_conversion")).as("avg_days_to_conversion"))
      .withColumn("match_rate_pct",
        when(col("total_leads_collected") > 0,
          round(col("leads_matched_to_companies") * 100.0 /
            col("total_leads_collected"), 2)).otherwise(0.0))
      .withColumn("conversion_rate_90d_pct",
        when(col("leads_matched_to_companies") > 0,
          round(col("conversions_90d") * 100.0 /
            col("leads_matched_to_companies"), 2)).otherwise(0.0))
  }
}
