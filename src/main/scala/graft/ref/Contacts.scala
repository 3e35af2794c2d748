package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** Legacy contact-extraction pipeline (SURVEY P7/W8 in context):
  * stg_quickbooks__customer_contacts → person mapping →
  * dim_customer_contacts (stg_quickbooks__customer_contacts.sql:16-337,
  * int_quickbooks__customer_person_mapping.sql:90-160,
  * dim_customer_contacts.sql:64-149).
  */
object Contacts {

  /** Explode main+cc `;`-email lists with ordinality, rank-1 per
    * (customer, lower(email)), filter amazon-marketplace addresses,
    * derive display names from email local parts, surrogate-key each
    * contact. */
  def customerContacts(stagedCustomers: DataFrame): DataFrame = {
    def side(emailCol: String, tag: String) = stagedCustomers
      .select(col("customer_id"), col("customer_name"),
        col(emailCol).as("email_list"), lit(tag).as("email_source"))
      .filter(col("email_list").isNotNull)
      .select(col("customer_id"), col("customer_name"),
        col("email_source"),
        posexplode(split(col("email_list"), ";"))
          .as(Seq("pos0", "email_raw")))
      .select(col("customer_id"), col("customer_name"),
        col("email_source"),
        lower(trim(col("email_raw"))).as("email"),
        (col("pos0") + 1).as("email_position"))
      .filter(col("email") =!= "")
    val exploded = side("main_email", "main")
      .unionByName(side("cc_email", "cc"))
      .filter(!col("email").endsWith("@marketplace.amazon.com"))
    val w = Window.partitionBy(col("customer_id"), col("email"))
      .orderBy(col("email_source"), col("email_position"))
    exploded
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("derived_first_name",
        initcap(Fns.splitPart(Fns.splitPart(col("email"), "@", 1), ".", 1)))
      .withColumn("email_domain", Fns.splitPart(col("email"), "@", 2))
      .withColumn("contact_key",
        Fns.surrogateKey(col("customer_id"), col("email"),
          col("email_source"), col("email_position")))
  }

  /** Person mapping: one row per (company, email) with partition counts
    * (W7) and a primary-contact rank; dedup guarantees the email-dedup
    * singular test (tests/test_contact_email_deduplication.sql:8-13). */
  def personMapping(contacts: DataFrame, bridge: DataFrame): DataFrame = {
    val withCompany = contacts
      .join(bridge.select(col("customer_id"), col("company_domain_key")),
        Seq("customer_id"), "left")
    val w = Window
      .partitionBy(coalesce(col("company_domain_key"), col("customer_id")),
        col("email"))
      .orderBy(col("email_source"), col("email_position"),
        col("customer_id"))
    val deduped = withCompany
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
    val cw = Window.partitionBy(col("company_domain_key"))
    val pw = Window.partitionBy(col("company_domain_key"))
      .orderBy(col("email_position"), col("email"), col("customer_id"))
    deduped
      .withColumn("company_contact_count", count(lit(1)).over(cw))
      .withColumn("contact_rank", row_number().over(pw))
      .withColumn("is_primary_company_contact", col("contact_rank") === 1)
  }

  /** dim_customer_contacts: JSON contact card + final projection
    * (dim_customer_contacts.sql:64-149) — with the reference's
    * dimensional aliases: full name from the email local part,
    * contact_role from source/position, primary_email for fact-table
    * joins (fct_orders.sql:75-86 consumes exactly these). */
  def dimCustomerContacts(mapping: DataFrame): DataFrame =
    mapping.select(
      col("contact_key"),
      col("contact_key").as("contact_id"),
      col("company_domain_key"),
      col("customer_id"), col("customer_name"),
      col("email"), col("email_domain"), col("email_source"),
      col("derived_first_name"),
      initcap(regexp_replace(
        graft.functions.Fns.splitPart(col("email"), "@", 1), "\\.", " "))
        .as("full_name"),
      col("email").as("primary_email"),
      lit(null).cast("string").as("primary_phone"),
      when(col("email_source") === "main" && col("email_position") === 1,
        "primary")
        .when(col("email_source") === "main", "additional_main")
        .otherwise("cc").as("contact_role"),
      col("is_primary_company_contact"),
      col("company_contact_count"),
      to_json(struct(
        col("email").as("email"),
        col("derived_first_name").as("name"),
        col("email_source").as("source")),
        Map("ignoreNullFields" -> "false")).as("contact_card"))
}
