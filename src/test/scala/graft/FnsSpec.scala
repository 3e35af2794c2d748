package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("splitPart matches PG semantics: 1-based, '' for missing part") {
    val df = Seq("a;b;c", "solo", "", "x;").toDF("s")
    val got = df.select(
      Fns.splitPart($"s", ";", 1).as("p1"),
      Fns.splitPart($"s", ";", 2).as("p2"),
      Fns.splitPart($"s", ";", 9).as("p9")).collect()
    assert(got(0).toSeq == Seq("a", "b", ""))
    assert(got(1).toSeq == Seq("solo", "", ""))
    assert(got(2).toSeq == Seq("", "", ""))
    assert(got(3).toSeq == Seq("x", "", ""))
  }

  test("surrogateKey reproduces the dbt_utils recipe byte-for-byte") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = Seq((Some("cust1"), Some("NY")), (None, Some("CA")))
      .toDF("a", "b")
    val got = df.select(Fns.surrogateKey($"a", $"b")).as[String].collect()
    assert(got(0) == md5hex("cust1-NY"))
    assert(got(1) == md5hex("_dbt_utils_surrogate_key_null_-CA"))
  }

  test("generatedLeadId = gen_ + 16 hex of md5(lower(joined))") {
    val got = Seq(("John", "Doe")).toDF("f", "l")
      .select(Fns.generatedLeadId($"f", $"l")).as[String].head()
    assert(got.startsWith("gen_") && got.length == 20)
    assert(got == "gen_" + java.security.MessageDigest.getInstance("MD5")
      .digest("john|doe".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16))
  }

  test("safeNumeric strips $,% and whitespace, defaults on garbage") {
    val df = Seq("$1,234.50", "12%", "abc", "", null, " 7.5 ", "-3.25")
      .toDF("s")
    val got = df.select(Fns.safeNumeric($"s")).as[Double].collect()
    assert(got.toSeq == Seq(1234.50, 12.0, 0.0, 0.0, 0.0, 7.5, -3.25))
  }

  test("percentOrAbsolute: percent of base vs plain numeric") {
    val df = Seq(("10%", 200.0), ("15", 200.0)).toDF("raw", "base")
    val got = df.select(Fns.percentOrAbsolute($"raw", $"base"))
      .as[Double].collect()
    assert(got.toSeq == Seq(20.0, 15.0))
  }

  test("normalizeCustomerName strips suffixes and tidies whitespace") {
    val df = Seq("Acme Corp End User", "Beta  LLC ,", "Gamma Customer",
      "Delta client", "Plain Co").toDF("n")
    val got = df.select(Fns.normalizeCustomerName($"n")).as[String].collect()
    assert(got.toSeq ==
      Seq("Acme Corp", "Beta LLC", "Gamma", "Delta", "Plain Co"))
  }

  test("normalizeCountry: explicit strings, state/province inference, default") {
    val df = Seq(
      ("USA", ""), ("ca", ""), ("uk", ""), ("Germany", ""),
      ("", "TX"), ("", "ON"), ("", "")).toDF("c", "st")
    val got = df.select(Fns.normalizeCountry($"c", $"st")).as[String].collect()
    assert(got.toSeq == Seq("United States", "Canada", "United Kingdom",
      "Germany", "United States", "Canada", "United States"))
  }

  test("taxExemptFlag tri-state") {
    val df = Seq("Non-taxable", "Tax", "other", null).toDF("c")
    val got = df.select(Fns.taxExemptFlag($"c").as("f"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(got.toSeq == Seq(Some(true), Some(false), None, None))
  }

  test("normalizeDomain + domainType rules") {
    val df = Seq("marketplace.amazon.com", "gmail.com", "shop.fastenal.com",
      "acme.com").toDF("d")
    val got = df.select(
      Fns.normalizeDomain($"d", Seq("gmail.com")).as("nd"))
      .withColumn("t", Fns.domainType($"nd"))
      .as[(String, String)].collect()
    assert(got.toSeq == Seq(
      ("SKIP_AMAZON_MARKETPLACE", "skip"),
      ("INDIVIDUAL_GMAIL.COM", "individual"),
      ("fastenal.com", "corporate"),
      ("acme.com", "corporate")))
  }

  test("normalizeColumnName: strip, separators, camelCase") {
    assert(Fns.normalizeColumnName(" QuickBooks Internal Id ") ==
      "quick_books_internal_id")
    assert(Fns.normalizeColumnName("A/B C.D") == "a_b_cd")
  }

  test("emailPrimaryDomain: first of ;-list, after @, lowercased") {
    val df = Seq("John@ACME.com;x@y.z", "plain", null).toDF("e")
    val got = df.select(Fns.emailPrimaryDomain($"e"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("acme.com"), None, None))
  }
}
