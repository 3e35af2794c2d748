package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

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
    val cleaned = raw.select(
      Fns.nullifBlank(col("lead_id")).as("lead_id_raw"),
      Fns.nullifBlank(col("first_name")).as("first_name"),
      Fns.nullifBlank(col("last_name")).as("last_name"),
      Fns.nullifBlank(col("company")).as("company"),
      lower(trim(col("email"))).as("email"),
      Fns.nullifBlank(col("created")).cast("date").as("created"),
      col("show_name"),
      col("show_date").cast("date").as("show_date"))
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
        col("company_name").as("matched_company_name"))),
        Seq("company_domain_key"), "left")
      .withColumn("matched_to_company",
        col("matched_company_name").isNotNull)

  /** fct_trade_show_leads — the J12 REWRITE: the reference computes 6
    * correlated scalar subqueries per lead over company_orders
    * (fct_trade_show_leads.sql:107-170,216-222); here it is ONE left
    * join on company_domain_key with order_date >= show_date plus
    * conditional aggregation per window. Leads with no matched company
    * (NULL key) keep zero revenue via the left join + coalesce —
    * row multiplicity preserved (SURVEY §7.4 #3). */
  def fctLeads(matchedLeads: DataFrame,
               companyOrders: DataFrame): DataFrame = {
    val ordersSide = companyOrders.select(
      col("company_domain_key"), col("order_date"), col("order_amount"))
    val joined = matchedLeads
      .join(ordersSide,
        matchedLeads("company_domain_key") ===
          ordersSide("company_domain_key") &&
          col("order_date") >= col("show_date"), "left")
      .drop(ordersSide("company_domain_key"))
    def winSum(days: Int) = coalesce(
      sum(when(col("order_date") <= date_add(col("show_date"), days),
        col("order_amount"))), lit(0.0))
    def winCnt(days: Int) =
      sum(when(col("order_date") <= date_add(col("show_date"), days), 1)
        .otherwise(0))
    joined
      .groupBy(col("lead_id"), col("email"), col("full_name"),
        col("show_name"), col("show_date"), col("company_domain_key"),
        col("matched_to_company"), col("is_personal_email"))
      .agg(
        winSum(30).as("revenue_30d"),
        winSum(90).as("revenue_90d"),
        winSum(180).as("revenue_180d"),
        winSum(365).as("revenue_365d"),
        coalesce(sum(col("order_amount")), lit(0.0)).as("revenue_all_time"),
        winCnt(365).as("orders_365d"),
        min(when(col("order_amount").isNotNull, col("order_date")))
          .as("first_order_after_show"))
      .withColumn("days_to_conversion",
        datediff(col("first_order_after_show"), col("show_date")))
  }

  /** fct_trade_show_performance (fct_trade_show_performance.sql:16-74,
    * A14): per-show rollup with conditional sums over the windows. */
  def showPerformance(fctLeads: DataFrame): DataFrame =
    fctLeads.groupBy(col("show_name"), col("show_date"))
      .agg(
        count(lit(1)).as("lead_count"),
        countDistinct(col("email")).as("distinct_emails"),
        countDistinct(when(col("matched_to_company"),
          col("company_domain_key"))).as("matched_companies"),
        sum(when(col("matched_to_company"), 1).otherwise(0))
          .as("matched_lead_count"),
        sum(col("revenue_30d")).as("revenue_30d"),
        sum(col("revenue_90d")).as("revenue_90d"),
        sum(col("revenue_365d")).as("revenue_365d"),
        sum(col("revenue_all_time")).as("revenue_all_time"),
        avg(col("days_to_conversion")).as("avg_days_to_conversion"))
}
