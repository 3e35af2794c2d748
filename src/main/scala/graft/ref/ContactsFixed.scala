package graft.ref

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** The FIXED contact pipeline (SURVEY §3.2 wrinkle #3) — the reference
  * runs this five-model chain alongside the legacy path in
  * [[Contacts]]:
  *
  *   int_contact_email_parsing → int_contact_name_enrichment →
  *   int_contact_quality_scoring → int_customer_person_mapping_fixed →
  *   dim_customer_contacts_fixed
  *
  * The "fixed" part is surrogate-key stability: contact ids hash
  * (customer, email, source) WITHOUT email_position
  * (int_contact_email_parsing.sql:87-90,
  * tests/test_contact_surrogate_key_stability.sql:8-36), so re-ordering
  * a customer's email list never changes ids.
  *
  * Every window is keyed by customer/email/company — high-cardinality,
  * uniform partitions, so each model is one shuffle at any scale. Audit
  * CURRENT_TIMESTAMP columns are dropped per the determinism rules.
  */
object ContactsFixed {

  private def localPart(email: Column): Column =
    Fns.splitPart(email, "@", 1)

  /** int_contact_email_parsing (int_contact_email_parsing.sql:16-140):
    * split main+cc `;`-lists with ordinality, validate, filter amazon
    * marketplace, dedup per (customer, lower(email)) preferring main
    * then position, derive contact_priority, mint the STABLE
    * email_contact_id (no position in the hash). */
  def emailParsing(cleanContacts: DataFrame): DataFrame = {
    def side(emailCol: String, tag: String): DataFrame = {
      val exploded = cleanContacts
        .filter(col(emailCol).isNotNull)
        .select(col("*"),
          posexplode(split(col(emailCol), ";")).as(Seq("pos0", "email_part")))
        .withColumn("individual_email", trim(col("email_part")))
        .filter(col("individual_email") =!= "")
      // Post-filter compacted position, like the reference's ROW_NUMBER
      // over the ordinality (int_contact_email_parsing.sql:20,32).
      val w = Window.partitionBy(col("customer_id")).orderBy(col("pos0"))
      exploded
        .withColumn("email_position", row_number().over(w))
        .withColumn("email_source", lit(tag))
        .drop("pos0", "email_part", "main_email", "cc_email")
    }
    val combined = side("main_email", "main")
      .unionByName(side("cc_email", "cc"))
      .withColumn("email_domain",
        lower(Fns.splitPart(col("individual_email"), "@", 2)))
      .withColumn("is_valid_email",
        col("individual_email").contains("@") &&
          Fns.splitPart(col("individual_email"), "@", 2) =!= "" &&
          localPart(col("individual_email")) =!= "")
      .withColumn("passes_business_rules",
        !lower(col("individual_email")).endsWith("@marketplace.amazon.com"))
    val dedupW = Window
      .partitionBy(col("customer_id"), lower(col("individual_email")))
      .orderBy(when(col("email_source") === "main", 1).otherwise(2),
        col("email_position"))
    combined
      .filter(col("is_valid_email") && col("passes_business_rules"))
      .withColumn("email_rank", row_number().over(dedupW))
      .filter(col("email_rank") === 1)
      .drop("email_rank")
      .withColumn("contact_priority",
        when(col("email_source") === "main" && col("email_position") === 1,
          "primary")
          .when(col("email_source") === "main", "additional_main")
          .otherwise("cc"))
      .withColumn("email_contact_id",
        Fns.surrogateKey(col("customer_id"), col("individual_email"),
          col("email_source")))
      .withColumnRenamed("first_name", "original_first_name")
      .withColumnRenamed("last_name", "original_last_name")
  }

  /** int_contact_name_enrichment
    * (int_contact_name_enrichment.sql:16-171): derive names from the
    * original record (primary contacts) or the email local part, build
    * full_name with fallbacks, classify name quality/source, and null
    * the phone/address passthroughs for non-primary contacts. */
  def nameEnrichment(emailContacts: DataFrame): DataFrame = {
    val dotFirst = localPart(col("individual_email"))
    val first = Fns.splitPart(dotFirst, ".", 1)
    val last = Fns.splitPart(dotFirst, ".", 2)
    val primaryOnly = Seq("main_phone", "alt_phone", "work_phone",
      "mobile_phone", "fax", "billing_address_line_1",
      "billing_address_city", "billing_address_state",
      "billing_address_postal_code")
    val enriched = emailContacts
      .withColumn("derived_first_name",
        when(col("contact_priority") === "primary" &&
          col("original_first_name").isNotNull, col("original_first_name"))
          .when(first =!= "", initcap(first)))
      .withColumn("derived_last_name",
        when(col("contact_priority") === "primary" &&
          col("original_last_name").isNotNull, col("original_last_name"))
          .when(last =!= "", initcap(last)))
      .withColumn("full_name",
        when(col("derived_first_name").isNotNull &&
          col("derived_last_name").isNotNull,
          trim(concat_ws(" ", col("derived_first_name"),
            col("derived_last_name"))))
          .when(col("derived_first_name").isNotNull,
            col("derived_first_name"))
          .when(col("derived_last_name").isNotNull,
            col("derived_last_name"))
          .when(dotFirst =!= "",
            initcap(regexp_replace(dotFirst, "\\.", " "))))
      .withColumn("name_quality",
        when(col("contact_priority") === "primary" &&
          col("original_first_name").isNotNull &&
          col("original_last_name").isNotNull, "original_complete")
          .when(col("contact_priority") === "primary" &&
            (col("original_first_name").isNotNull ||
              col("original_last_name").isNotNull), "original_partial")
          .when(last =!= "", "email_derived_complete")
          .when(first =!= "", "email_derived_partial")
          .otherwise("minimal"))
      .withColumn("name_source",
        when(col("contact_priority") === "primary" &&
          (col("original_first_name").isNotNull ||
            col("original_last_name").isNotNull), "quickbooks_original")
          .when(first =!= "", "email_derived")
          .otherwise("none"))
      .withColumnRenamed("derived_first_name", "first_name")
      .withColumnRenamed("derived_last_name", "last_name")
    primaryOnly.foldLeft(enriched) { (df, c) =>
      df.withColumn(c,
        when(col("contact_priority") === "primary", col(c)))
    }
  }

  /** int_contact_quality_scoring
    * (int_contact_quality_scoring.sql:16-170): capability flags, the
    * 0-100 completeness score, data-quality / tier / engagement
    * classifications and the marketing flags. */
  def qualityScoring(enriched: DataFrame): DataFrame = {
    def pts(cond: Column, p: Int): Column =
      when(cond, p).otherwise(0)
    enriched
      .withColumn("has_email", col("individual_email").isNotNull)
      .withColumn("has_main_phone", col("main_phone").isNotNull)
      .withColumn("has_additional_phone",
        col("alt_phone").isNotNull || col("work_phone").isNotNull ||
          col("mobile_phone").isNotNull)
      .withColumn("has_full_name", col("full_name").isNotNull)
      .withColumn("has_job_title", col("job_title").isNotNull)
      .withColumn("has_address", col("billing_address_line_1").isNotNull)
      .withColumn("primary_contact_method",
        when(col("individual_email").isNotNull, "email")
          .when(col("main_phone").isNotNull, "phone")
          .when(col("alt_phone").isNotNull || col("work_phone").isNotNull ||
            col("mobile_phone").isNotNull, "phone")
          .otherwise("none"))
      .withColumn("completeness_score",
        (pts(col("individual_email").isNotNull, 25) +
          pts(col("full_name").isNotNull, 20) +
          pts(col("main_phone").isNotNull, 15) +
          pts(col("job_title").isNotNull, 10) +
          pts(col("billing_address_line_1").isNotNull, 10) +
          when(col("name_quality")
            .isin("original_complete", "email_derived_complete"), 10)
            .otherwise(5) +
          pts(col("alt_phone").isNotNull || col("work_phone").isNotNull ||
            col("mobile_phone").isNotNull, 5) +
          pts(col("name_title").isNotNull, 5)).cast("int"))
      .withColumn("contact_data_quality",
        when(col("completeness_score") >= 75, "complete")
          .when(col("completeness_score") >= 50, "good")
          .when(col("completeness_score") >= 25, "partial")
          .otherwise("minimal"))
      .withColumn("contact_tier",
        when(col("contact_priority") === "primary" &&
          col("completeness_score") >= 75, "high_value_contact")
          .when(col("completeness_score") >= 75, "complete_contact")
          .when(col("has_email") && col("completeness_score") >= 50,
            "email_contact")
          .when(col("has_main_phone") && col("completeness_score") >= 40,
            "phone_contact")
          .otherwise("basic_contact"))
      .withColumn("email_marketable",
        col("has_email") && col("customer_status").isNotNull)
      .withColumn("phone_contactable",
        (col("has_main_phone") || col("has_additional_phone")) &&
          col("customer_status").isNotNull)
      .withColumn("key_account_contact",
        col("contact_priority") === "primary" && col("current_balance") > 0)
      .withColumn("engagement_potential",
        when(col("contact_priority") === "primary" &&
          col("completeness_score") >= 75 && col("current_balance") > 1000,
          "high_engagement")
          .when(col("completeness_score") >= 60 && col("has_email"),
            "medium_engagement")
          .when(col("completeness_score") >= 40, "low_engagement")
          .otherwise("minimal_engagement"))
  }

  /** int_customer_person_mapping_fixed
    * (int_customer_person_mapping_fixed.sql:46-196): join the company
    * mapping, cross-customer case-insensitive email dedup keeping the
    * best representative (completeness → priority → domain preference →
    * balance → customer), rank contacts within each company, mint the
    * stable person_company_id. A trailing email tiebreak is added to the
    * reference's ordering so equal-score ties are deterministic. */
  def personMappingFixed(qualityContacts: DataFrame,
                         companyMapping: DataFrame): DataFrame = {
    val mapping = companyMapping.select(
      col("customer_id"), col("company_domain_key"),
      Fns.domainType(col("company_domain_key")).as("domain_type"))
    val joined = qualityContacts.join(mapping, Seq("customer_id"), "left")
      .filter(col("individual_email").isNotNull &&
        col("company_domain_key").isNotNull &&
        col("company_domain_key") =!= "NO_EMAIL_DOMAIN")
    val priorityOrd = when(col("contact_priority") === "primary", 1)
      .when(col("contact_priority") === "additional_main", 2).otherwise(3)
    val domainOrd = when(col("domain_type") === "corporate", 1)
      .when(col("domain_type") === "individual", 2).otherwise(3)
    val emailW = Window.partitionBy(lower(col("individual_email")))
      .orderBy(col("completeness_score").desc, priorityOrd, domainOrd,
        col("current_balance").desc_nulls_last, col("customer_id"),
        col("email_source"))
    val unique = joined
      .withColumn("email_rank", row_number().over(emailW))
      .filter(col("email_rank") === 1).drop("email_rank")
    val companyW = Window.partitionBy(col("company_domain_key"))
      .orderBy(col("completeness_score").desc,
        when(col("contact_priority") === "primary", 1).otherwise(2),
        col("current_balance").desc_nulls_last, col("customer_id"),
        lower(col("individual_email")))
    unique
      .withColumn("contact_role",
        when(col("individual_email").isNotNull &&
          col("completeness_score") >= 75, "primary_contact")
          .when(col("individual_email").isNotNull &&
            col("completeness_score") >= 50, "secondary_contact")
          .when(col("individual_email").isNotNull, "email_contact")
          .when(col("has_main_phone"), "phone_contact")
          .when(col("full_name").isNotNull, "name_only_contact")
          .otherwise("minimal_contact"))
      .withColumn("company_contact_rank", row_number().over(companyW))
      .withColumn("total_company_contacts",
        count(lit(1)).over(Window.partitionBy(col("company_domain_key"))))
      .withColumn("person_company_id",
        Fns.surrogateKey(col("email_contact_id"),
          col("company_domain_key")))
      .withColumn("person_id", col("email_contact_id"))
      .withColumn("is_primary_company_contact",
        col("company_contact_rank") === 1)
      .withColumn("company_has_multiple_contacts",
        col("total_company_contacts") > 1)
      .withColumnRenamed("full_name", "person_name")
      .withColumnRenamed("individual_email", "main_email")
      .withColumnRenamed("email_domain", "main_email_domain")
      .withColumnRenamed("customer_id", "source_customer_id")
      .withColumnRenamed("customer_name", "source_customer_name")
      .withColumnRenamed("company_name", "source_company_name")
  }

  /** dim_customer_contacts_fixed
    * (dim_customer_contacts_fixed.sql:12-148): person mapping enriched
    * with consolidated-company context, the change-detection
    * contact_dim_key, and the additional-phones JSON card. */
  def dimCustomerContactsFixed(personMapping: DataFrame,
                               consolidation: DataFrame): DataFrame = {
    val companies = consolidation.select(
      col("company_domain_key"),
      col("company_name").as("consolidated_company_name"),
      col("primary_country").as("company_country"),
      col("total_revenue").as("company_total_revenue"))
    personMapping
      .join(broadcast(companies), Seq("company_domain_key"), "left")
      .withColumn("contact_id", col("person_id"))
      .withColumn("contact_dim_key",
        Fns.surrogateKey(col("person_id"), col("person_name"),
          col("main_email"), col("company_domain_key")))
      .withColumn("additional_contact_methods",
        to_json(struct(
          col("alt_phone").as("alt_phone"),
          col("work_phone").as("work_phone"),
          col("mobile_phone").as("mobile_phone"),
          col("fax").as("fax")),
          Map("ignoreNullFields" -> "false")))
      .withColumn("company_name",
        coalesce(col("consolidated_company_name"),
          col("source_company_name")))
      .withColumnRenamed("main_email", "primary_email")
      .withColumnRenamed("main_phone", "primary_phone")
  }
}
