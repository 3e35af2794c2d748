package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Scalar `Column` function library — the reference's SQL/Python scalar
  * surface re-expressed as Catalyst column expressions (SURVEY §2.7/§2.8).
  * Everything here stays inside whole-stage codegen: no UDFs.
  *
  * PostgreSQL-compatibility notes are attached per function; these are the
  * semantic deltas called out in SURVEY §7.4.
  */
object Fns {

  /** PG `NULLIF(TRIM(x), '')` — the reference's pervasive empty-string→NULL
    * cleanup (stg_quickbooks__customer_contacts_clean.sql:18-44). */
  def nullifBlank(c: Column): Column = {
    val t = trim(c)
    when(t === "", lit(null)).otherwise(t)
  }

  /** PG `SPLIT_PART(s, delim, n)` (1-based). PG returns '' (not NULL) when
    * the part is missing — reproduce exactly (SURVEY §2.7 string notes). */
  def splitPart(s: Column, delim: String, n: Int): Column =
    coalesce(
      try_element_at(split(s, java.util.regex.Pattern.quote(delim)), lit(n)),
      lit(""))

  /** Domain of the first email in a `;`-separated list, lowercased —
    * domain_consolidation.py:56-71 `extract_primary_domain`. */
  def emailPrimaryDomain(email: Column): Column =
    lower(nullifBlank(splitPart(splitPart(email, ";", 1), "@", 2)))

  /** dbt_utils.generate_surrogate_key: md5 of '-'-joined columns with a
    * sentinel for NULLs (stg_quickbooks__customer_contacts.sql:276).
    * Byte-identical to the dbt macro output. */
  def surrogateKey(cols: Column*): Column = {
    val sentinel = lit("_dbt_utils_surrogate_key_null_")
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), sentinel)): _*))
  }

  /** Trade-show generated lead id: `gen_` + first 16 hex chars of md5 of
    * lowercased '|'-joined identity (pipelines/trade_shows/pipeline.py:150-161). */
  def generatedLeadId(cols: Column*): Column =
    concat(lit("gen_"), substring(md5(lower(concat_ws("|", cols: _*))), 1, 16))

  /** `safe_cast_numeric`: strip `$ , %` then cast, defaulting on failure
    * (pipelines/shared/utils.py:105-137; percent handling at
    * int_quickbooks__order_items_typed.sql:114-131). */
  def safeNumeric(c: Column, default: Double = 0.0): Column = {
    val cleaned = regexp_replace(c.cast("string"), "[,$%\\s]", "")
    // rlike-guarded cast: branch value only evaluates when the guard
    // matches, so this is safe under ANSI mode (no try_cast needed).
    val parsed = when(
      cleaned.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
      cleaned.cast("double"))
    coalesce(parsed, lit(default))
  }

  /** Percent-or-absolute amount: '12%' of a base, else plain numeric
    * (int_quickbooks__order_items_typed.sql:114-131). */
  def percentOrAbsolute(raw: Column, base: Column): Column =
    when(raw.cast("string").contains("%"),
      safeNumeric(raw) / 100.0 * base)
      .otherwise(safeNumeric(raw))

  /** Growth percent macro (macros/calculate_growth_percentage.sql:6-12):
    * (cur - prev) / NULLIF(prev, 0) * 100, NULL-safe. */
  def growthPct(current: Column, previous: Column): Column =
    round((current - previous) / nullif(previous, lit(0)) * 100, 2)

  /** US state codes (56 incl. territories) and CA provinces used by the
    * country-normalization macro family (macros/country_normalization.sql:6-75). */
  private val usStates = Seq(
    "AL","AK","AZ","AR","CA","CO","CT","DE","FL","GA","HI","ID","IL","IN",
    "IA","KS","KY","LA","ME","MD","MA","MI","MN","MS","MO","MT","NE","NV",
    "NH","NJ","NM","NY","NC","ND","OH","OK","OR","PA","RI","SC","SD","TN",
    "TX","UT","VT","VA","WA","WV","WI","WY","DC","PR","VI","GU","AS","MP",
    "AA","AE")
  private val caProvinces = Seq(
    "AB","BC","MB","NB","NL","NS","NT","NU","ON","PE","QC","SK","YT")

  /** `normalize_country(country, state)`: explicit strings first, else
    * inferred from state code, default 'United States'
    * (macros/country_normalization.sql:6-75). */
  def normalizeCountry(country: Column, state: Column): Column = {
    val c = upper(trim(country))
    val s = upper(trim(state))
    when(c.isin("USA", "US", "UNITED STATES", "U.S.", "U.S.A."), "United States")
      .when(c.isin("CA", "CANADA"), "Canada")
      .when(c.isin("UK", "UNITED KINGDOM", "GB", "GREAT BRITAIN"), "United Kingdom")
      .when(nullifBlank(country).isNotNull, initcap(trim(country)))
      .when(s.isin(usStates: _*), "United States")
      .when(s.isin(caProvinces: _*), "Canada")
      .otherwise("United States")
  }

  /** `country_category(...)` (macros/country_normalization.sql:23-29):
    * US / Canada / International from the already-normalized primary
    * country. Note the reference's `normalize_country(b,c,s,s)` COALESCE
    * is moot — `_infer_country_from_address` never returns NULL (its ELSE
    * is 'United States'), so billing inference always wins; primary
    * country is therefore exactly [[normalizeCountry]] of the billing
    * pair. */
  def countryCategory(primaryCountry: Column): Column =
    when(primaryCountry === "United States", "United States")
      .when(primaryCountry === "Canada", "Canada")
      .otherwise("International")

  /** `region(...)` (macros/country_normalization.sql:31-36). */
  def regionOf(primaryCountry: Column): Column =
    when(primaryCountry.isin("United States", "Canada"), "North America")
      .otherwise("International")

  /** Customer-name normalization (domain_consolidation.py:102-132): strip
    * `End User`/`Customer`/`Client` suffixes (case-insensitive), collapse
    * whitespace, drop trailing commas/spaces. */
  def normalizeCustomerName(name: Column): Column = {
    val stripped = regexp_replace(trim(name),
      "(?i)[,\\s]*(end\\s+user|customer|client)\\s*$", "")
    trim(regexp_replace(regexp_replace(stripped, "\\s+", " "), "[,\\s]+$", ""))
  }

  /** Domain normalization rules (domain_consolidation.py:73-100). The
    * individual-domain list arrives as a literal set (broadcast upstream). */
  def normalizeDomain(domain: Column, individualDomains: Seq[String]): Column = {
    val d = lower(trim(domain))
    when(d === "marketplace.amazon.com", "SKIP_AMAZON_MARKETPLACE")
      .when(d.isin(individualDomains: _*), concat(lit("INDIVIDUAL_"), upper(d)))
      .when(d.contains("fastenal.com"), "fastenal.com")
      .otherwise(d)
  }

  /** domain_type derivation (domain_consolidation.py:350-356). */
  def domainType(normalized: Column): Column =
    when(normalized === "SKIP_AMAZON_MARKETPLACE", "skip")
      .when(normalized.startsWith("INDIVIDUAL_"), "individual")
      .otherwise("corporate")

  /** Tax-exempt tri-state flag (stg_quickbooks__order_items_tax_status.sql:9-22):
    * ILIKE '%non%' → true, ILIKE '%tax%' → false, else NULL. */
  def taxExemptFlag(code: Column): Column =
    when(lower(code).contains("non"), lit(true))
      .when(lower(code).contains("tax"), lit(false))
      .otherwise(lit(null).cast("boolean"))

  /** `SELECT * EXCEPT(...)` (dbt_utils.star, P3). */
  def starExcept(df: DataFrame, except: Seq[String]): DataFrame = {
    val keep = df.columns.filterNot(except.contains)
    df.select(keep.map(col).toIndexedSeq: _*)
  }

  /** `first_existing_column_or_null` (macros/optional_columns.sql:6-22):
    * schema-introspection at plan time. */
  def firstExistingColumnOrNull(df: DataFrame, candidates: Seq[String],
                                t: DataType): Column =
    candidates.find(df.columns.contains)
      .map(col)
      .getOrElse(lit(null).cast(t))

  /** Column-name standardization (pipelines/quickbooks/pipeline.py:151-154):
    * strip, '/'→'_', ' '→'_', remove '.', then snake_case like DLT. */
  def normalizeColumnName(name: String): String = {
    val cleaned = name.trim
      .replace("/", "_").replace(" ", "_").replace(".", "")
    // DLT-style snake_case: split camelCase boundaries, lowercase.
    cleaned
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("__+", "_")
      .toLowerCase
  }

  /** Apply [[normalizeColumnName]] to every column of a frame (S2). */
  def standardizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeColumnName).toIndexedSeq: _*)

  /** GDPR PSEUDONYMIZATION (the middle ground between keeping PII and
    * `AtomicTable.deleteWhere` erasure): replace an identifier with a
    * deterministic salted token — the same input always maps to the
    * same token, so joins, group-bys and dedup keyed on the column
    * keep working across tables and runs, while the raw value never
    * leaves the trust boundary. md5(salt|normalized) truncated to 8
    * hex chars (32 bits — collision-check tokens vs inputs at your
    * cardinality; widen for billion-key tables); rotate the salt to
    * unlink historical tokens. Codegen'd per-row expression, no UDF,
    * engine-portable (the oracle replays the exact hash). */
  def pseudonymizeEmail(c: Column, salt: String): Column =
    concat(lit("user_"),
      substring(md5(concat(lit(salt + "|"), lower(trim(c)))), 1, 8),
      lit("@redacted.invalid"))

  /** [[pseudonymizeEmail]] for person/company names. */
  def pseudonymizeName(c: Column, salt: String): Column =
    concat(lit("person_"),
      substring(md5(concat(lit(salt + "|"), lower(trim(c)))), 1, 8))
}
