package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** The pre-transform consolidation job (domain_consolidation.py): reads
  * raw customers, derives the two broadcast-sized lookup tables
  * `domain_mapping` and `customer_name_mapping`. The reference does this
  * with a Python row loop + per-row INSERT (domain_consolidation.py:
  * 296-377,455-529); here both are single distributed plans ending in an
  * overwrite — the drop/recreate semantics are exactly
  * `write.mode("overwrite")` (SURVEY §2.1 S11).
  */
object DomainConsolidation {

  /** domain_mapping(original_domain PK, normalized_domain, domain_type)
    * from the union of main + cc email domains
    * (domain_consolidation.py:306-356; U2 union-distinct at :317). */
  def buildDomainMapping(rawCustomers: DataFrame,
                         individualDomains: Seq[String]): DataFrame = {
    val main = rawCustomers
      .select(Fns.emailPrimaryDomain(col("main_email")).as("original_domain"))
    val cc = rawCustomers
      .select(Fns.emailPrimaryDomain(col("cc_email")).as("original_domain"))
    val domains = main.union(cc).filter(col("original_domain").isNotNull)
      .distinct()
    domains
      .withColumn("normalized_domain",
        Fns.normalizeDomain(col("original_domain"), individualDomains))
      .withColumn("domain_type", Fns.domainType(col("normalized_domain")))
  }

  /** customer_name_mapping(original_name PK, normalized_name,
    * normalization_type) — explicit file mappings take precedence over
    * the automatic suffix-stripping rules
    * (domain_consolidation.py:102-168,455-529). */
  def buildCustomerNameMapping(rawCustomers: DataFrame,
                               explicitMappings: Map[String, String])
      : DataFrame = {
    val spark = rawCustomers.sparkSession
    import spark.implicits._
    val names = rawCustomers
      .select(Fns.nullifBlank(col("customer_name")).as("original_name"))
      .filter(col("original_name").isNotNull)
      .distinct()
    val explicit = explicitMappings.toSeq
      .toDF("original_name", "explicit_name")
    val auto = Fns.normalizeCustomerName(col("original_name"))
    names.join(broadcast(explicit), Seq("original_name"), "left")
      .withColumn("normalized_name",
        coalesce(col("explicit_name"), auto))
      .withColumn("normalization_type",
        when(col("explicit_name").isNotNull, "explicit")
          .when(auto =!= col("original_name"), "automatic")
          .otherwise("no_change"))
      .drop("explicit_name")
  }
}
