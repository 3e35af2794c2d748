package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fns

/** Remaining reference-operator families exercised on testdata: the
  * country-normalization macro (P5), the legacy email split/rank
  * pipeline (P7/W8), and JSON_BUILD_OBJECT (§2.7 JSON).
  */
object RefOpQueries {

  /** P5 — normalize_country / country inference. Nation names play the
    * raw country strings; a state code is derived synthetically so the
    * inference branch is exercised too
    * (macros/country_normalization.sql:6-75). */
  val p5Country: Q = Q.sql(
    "p5_country_normalize",
    """WITH src AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'USA'
      |         WHEN c_custkey % 5 = 1 THEN 'ca'
      |         WHEN c_custkey % 5 = 2 THEN ''
      |         WHEN c_custkey % 5 = 3 THEN 'uk'
      |         ELSE 'Germany' END AS country_raw,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'TX'
      |         WHEN c_custkey % 3 = 1 THEN 'ON'
      |         ELSE '' END AS state_raw
      |  FROM customer
      |)
      |SELECT c_custkey, country_raw, state_raw,
      |  CASE WHEN UPPER(TRIM(country_raw)) IN ('USA','US','UNITED STATES','U.S.','U.S.A.') THEN 'United States'
      |       WHEN UPPER(TRIM(country_raw)) IN ('CA','CANADA') THEN 'Canada'
      |       WHEN UPPER(TRIM(country_raw)) IN ('UK','UNITED KINGDOM','GB','GREAT BRITAIN') THEN 'United Kingdom'
      |       WHEN NULLIF(TRIM(country_raw),'') IS NOT NULL
      |            THEN UPPER(LEFT(TRIM(country_raw),1)) || LOWER(SUBSTR(TRIM(country_raw),2))
      |       WHEN UPPER(TRIM(state_raw)) IN ('AL','AK','AZ','AR','CA','CO','CT','DE','FL','GA','HI','ID','IL','IN','IA','KS','KY','LA','ME','MD','MA','MI','MN','MS','MO','MT','NE','NV','NH','NJ','NM','NY','NC','ND','OH','OK','OR','PA','RI','SC','SD','TN','TX','UT','VT','VA','WA','WV','WI','WY','DC','PR','VI','GU','AS','MP','AA','AE') THEN 'United States'
      |       WHEN UPPER(TRIM(state_raw)) IN ('AB','BC','MB','NB','NL','NS','NT','NU','ON','PE','QC','SK','YT') THEN 'Canada'
      |       ELSE 'United States' END AS normalized_country
      |FROM src ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val src = Tables.customer(s, d).select(
      col("c_custkey"),
      when(col("c_custkey") % 5 === 0, "USA")
        .when(col("c_custkey") % 5 === 1, "ca")
        .when(col("c_custkey") % 5 === 2, "")
        .when(col("c_custkey") % 5 === 3, "uk")
        .otherwise("Germany").as("country_raw"),
      when(col("c_custkey") % 3 === 0, "TX")
        .when(col("c_custkey") % 3 === 1, "ON")
        .otherwise("").as("state_raw"))
    src.withColumn("normalized_country",
      Fns.normalizeCountry(col("country_raw"), col("state_raw")))
      .orderBy("c_custkey")
  }

  /** P7/W8 — legacy email split + contact extraction: `;`-lists split
    * with ordinality, rank-1 per (customer, email), derived display
    * name, marketplace filter, surrogate key
    * (stg_quickbooks__customer_contacts.sql:16-337). Emails constructed
    * deterministically from customer attributes so both engines see
    * identical input. */
  val p7EmailSplit: Q = Q.sql(
    "p7_email_split_rank",
    """WITH src AS (
      |  SELECT c_custkey,
      |    lower(replace(c_name, ' ', '')) || '@corp.com;' ||
      |      lower(c_mktsegment) || '.team@corp.com' ||
      |      CASE WHEN c_custkey % 7 = 0 THEN ';seller@marketplace.amazon.com' ELSE '' END
      |      AS email_list
      |  FROM customer
      |), split AS (
      |  SELECT c_custkey,
      |    unnest(string_split(email_list, ';')) AS email,
      |    unnest(generate_series(1, len(string_split(email_list, ';')))) AS email_position
      |  FROM src
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, lower(email)
      |    ORDER BY email_position) AS rn
      |  FROM split
      |  WHERE email NOT LIKE '%@marketplace.amazon.com'
      |)
      |SELECT c_custkey, email, email_position,
      |  UPPER(LEFT(COALESCE(SPLIT_PART(SPLIT_PART(email, '@', 1), '.', 1), ''), 1))
      |    || LOWER(SUBSTR(COALESCE(SPLIT_PART(SPLIT_PART(email, '@', 1), '.', 1), ''), 2)) AS derived_name,
      |  MD5(CONCAT_WS('-',
      |    COALESCE(CAST(c_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    COALESCE(CAST(email AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    COALESCE(CAST(email_position AS VARCHAR), '_dbt_utils_surrogate_key_null_')))
      |    AS contact_key
      |FROM ranked WHERE rn = 1
      |ORDER BY c_custkey, email_position""".stripMargin) { (s, d) =>
    val src = Tables.customer(s, d).select(
      col("c_custkey"),
      concat(
        lower(regexp_replace(col("c_name"), " ", "")), lit("@corp.com;"),
        lower(col("c_mktsegment")), lit(".team@corp.com"),
        when(col("c_custkey") % 7 === 0,
          ";seller@marketplace.amazon.com").otherwise(""))
        .as("email_list"))
    val split0 = src.select(col("c_custkey"),
      posexplode(org.apache.spark.sql.functions.split(col("email_list"), ";"))
        .as(Seq("pos0", "email")))
      .select(col("c_custkey"), col("email"),
        (col("pos0") + 1).as("email_position"))
      .filter(!col("email").endsWith("@marketplace.amazon.com"))
    val w = Window.partitionBy(col("c_custkey"), lower(col("email")))
      .orderBy(col("email_position"))
    split0.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("email"), col("email_position"),
        initcap(Fns.splitPart(Fns.splitPart(col("email"), "@", 1), ".", 1))
          .as("derived_name"),
        Fns.surrogateKey(col("c_custkey"), col("email"),
          col("email_position")).as("contact_key"))
      .orderBy("c_custkey", "email_position")
  }

  /** §2.7 JSON — JSON_BUILD_OBJECT → to_json(struct(...)); values are
    * string-cast so number rendering can't diverge between engines;
    * ignoreNullFields=false matches PG/DuckDB null emission
    * (dim_customer_contacts.sql:64-69). */
  val fJsonBuild: Q = Q.sql(
    "f_json_build_object",
    """SELECT c_custkey,
      |  CAST(to_json(struct_pack(
      |    name := c_name,
      |    segment := c_mktsegment,
      |    balance := CAST(c_acctbal AS VARCHAR),
      |    nation := CAST(c_nationkey AS VARCHAR))) AS VARCHAR) AS contact_json
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      to_json(struct(
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").cast("string").as("balance"),
        col("c_nationkey").cast("string").as("nation")),
        Map("ignoreNullFields" -> "false")).as("contact_json"))
      .orderBy("c_custkey")
  }

  val all: Seq[Q] = Seq(p5Country, p7EmailSplit, fJsonBuild)
}
