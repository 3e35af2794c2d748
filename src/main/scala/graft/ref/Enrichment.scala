package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Company-enrichment JSONL ingestion + staging (SURVEY S8, P10):
  * line-delimited JSON with a nested API payload, loaded with
  * `spark.read.json` (schema inferred as a struct), nulls smoothed to
  * '' like the reference's recursive null→'' pass
  * (pipelines/quickbooks/pipeline.py:374-411), then staged by
  * projecting the nested fields with guarded casts
  * (stg_quickbooks__company_enrichment.sql:11-51).
  */
object Enrichment {

  /** S8 — JSONL scan: nested payload arrives as a StructType column;
    * string nulls → '' (numeric/boolean stay NULL), plus load metadata. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
      .na.fill("")
      .withColumn("load_date", current_date().cast("string"))
      .withColumn("is_seed", lit(true))

  /** P10 — enrichment staging: flattened projection, COALESCE of the
    * enriched description over the base one, guarded integer cast of
    * founded_year (may be ''). */
  def staging(raw: DataFrame): DataFrame = {
    val d = col("enrichment_raw_data")
    raw.select(
      lower(trim(col("company_domain"))).as("company_domain_key"),
      Fns.nullifBlank(col("company_name")).as("enriched_company_name"),
      col("enrichment_source"),
      Fns.nullifBlank(col("enrichment_date")).cast("date")
        .as("enrichment_date"),
      Fns.nullifBlank(d.getField("industry")).as("industry"),
      coalesce(
        Fns.nullifBlank(d.getField("description_enriched")),
        Fns.nullifBlank(d.getField("description"))).as("description"),
      when(d.getField("founded_year").rlike("^[0-9]{4}$"),
        d.getField("founded_year").cast("int")).as("founded_year"),
      Fns.nullifBlank(d.getField("hq_city")).as("hq_city"),
      Fns.nullifBlank(d.getField("hq_country")).as("hq_country"),
      when(d.getField("employees_count").rlike("^[0-9]+$"),
        d.getField("employees_count").cast("int")).as("employees_count"))
      .filter(col("company_domain_key") =!= "")
  }

  /** fct_companies ⋈ enrichment (left, by domain key) — the enrichment
    * columns land on the company mart when the source exists. */
  def enrichCompanies(fctCompanies: DataFrame,
                      stagedEnrichment: DataFrame): DataFrame =
    fctCompanies.join(
      broadcast(stagedEnrichment.select(
        col("company_domain_key"), col("industry"), col("description"),
        col("founded_year"), col("employees_count"), col("hq_country"))),
      Seq("company_domain_key"), "left")
}
