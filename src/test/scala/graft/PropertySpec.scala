package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.plans.QuantDot

/** Property-style tests over seeded random inputs, batched into single
  * Spark jobs (one DataFrame of N cases per property, not N jobs).
  * Mirrors SURVEY §5's test plan: email-splitting conservation,
  * surrogate-key stability, safe-numeric parsing, plus the QuantDot
  * reference semantics.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("simhash pigeonhole recall: every Hamming<=3 pair is found, none above") {
    import graft.llm.Dedup
    // Random 32-bit base signatures spaced far apart (independent
    // uniform draws are ~16 bits apart in expectation), each with a
    // partner flipped in k ∈ {0..3} random positions. The banding must
    // recover EVERY (base, partner) pair — the pigeonhole guarantee —
    // and the verify must emit nothing above the threshold.
    val cases = (0 until 60).map { i =>
      val base = Array.fill(32)(if (rnd.nextBoolean()) '1' else '0')
      val k = i % 4
      val partner = base.clone()
      rnd.shuffle((0 until 32).toList).take(k)
        .foreach(p => partner(p) = if (partner(p) == '1') '0' else '1')
      (i.toLong * 2, new String(base), i.toLong * 2 + 1,
        new String(partner), k)
    }
    val sigs = cases.flatMap { case (ia, a, ib, b, _) =>
      Seq((ia, a), (ib, b)) }.toDF("doc_id", "simhash")
    val pairs = Dedup.simhashNearDups(sigs, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    cases.foreach { case (ia, _, ib, _, k) =>
      assert(found.contains((ia, ib)),
        s"pair ($ia,$ib) at hamming $k not recovered")
    }
    def ham(a: String, b: String) = a.zip(b).count(x => x._1 != x._2)
    val byId = cases.flatMap { case (ia, a, ib, b, _) =>
      Seq(ia -> a, ib -> b) }.toMap
    pairs.foreach { case (a, b, h) =>
      assert(h == ham(byId(a), byId(b)) && h <= 3, s"bad pair ($a,$b,$h)")
    }
  }

  test("safeNumeric parses any decorated numeric back to its value") {
    val cases = (1 to 200).map { _ =>
      val v = BigDecimal(rnd.nextInt(2000000) - 1000000, 2).toDouble
      val decorated = (if (rnd.nextBoolean()) "$" else "") +
        f"$v%.2f" + (if (rnd.nextBoolean()) " " else "")
      (decorated, v)
    }
    val got = cases.toDF("s", "expected")
      .select(Fns.safeNumeric($"s").as("got"), $"expected")
      .as[(Double, Double)].collect()
    got.foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("surrogateKey equals MessageDigest md5 for random inputs incl nulls") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cases = (1 to 200).map { _ =>
      val a = if (rnd.nextInt(10) == 0) null
        else rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(8)).mkString
      (a, b)
    }
    val got = cases.toDF("a", "b")
      .select(Fns.surrogateKey($"a", $"b")).as[String].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      val ea = Option(a).getOrElse("_dbt_utils_surrogate_key_null_")
      assert(g == md5hex(s"$ea-$b"))
    }
  }

  test("splitPart matches PG semantics on random token lists") {
    val cases = (1 to 200).map { _ =>
      val toks = Seq.fill(rnd.nextInt(5))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      val n = 1 + rnd.nextInt(6)
      (toks.mkString(";"), n, toks.lift(n - 1).getOrElse(""))
    }
    cases.groupBy(_._2).foreach { case (n, group) =>
      val got = group.map(c => (c._1, c._3)).toDF("s", "expected")
        .select(Fns.splitPart($"s", ";", n).as("got"), $"expected")
        .as[(String, String)].collect()
      got.foreach { case (g, e) => assert(g == e, s"n=$n: '$g' != '$e'") }
    }
  }

  test("email-splitting conservation: exploded rows == independently derived count") {
    // Reimplementation of tests/test_contact_email_splitting_integrity
    // .sql:9-101 — the model's output row count must equal a count
    // derived independently from the raw strings.
    val cases = (1 to 100).map { i =>
      val k = rnd.nextInt(4)
      val emails = Seq.fill(k)(
        s"u${rnd.nextInt(1000)}@d${rnd.nextInt(50)}.com").mkString(";")
      (i.toLong, emails)
    }
    val df = cases.toDF("id", "emails")
    val exploded = df
      .select($"id", posexplode(split($"emails", ";")).as(Seq("p", "e")))
      .filter(length($"e") > 0)
    val expected = cases.map { case (_, s) =>
      s.split(";").count(_.nonEmpty) }.sum
    assert(exploded.count() == expected)
  }

  test("QuantDot matches a BigDecimal reference on random float arrays") {
    QuantDot.register(spark)
    def refQuant(v: Float): Long =
      BigDecimal(v.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val cases = (1 to 100).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Seq.fill(n)(rnd.nextFloat() * 2 - 1), Seq.fill(n)(rnd.nextFloat() * 2 - 1))
    }
    val got = cases.toDF("a", "b")
      .select(expr("graft_quant_dot(a, b)")).as[Long].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      val e = a.zip(b).map { case (x, y) => refQuant(x) * refQuant(y) }.sum
      assert(g == e, s"quantdot mismatch: $g != $e")
    }
  }

  test("QuantDot rejects non-float-array arguments at analysis time") {
    QuantDot.register(spark)
    val df = Seq((Seq(1.0, 2.0), "x")).toDF("a", "s")
    val err = intercept[Exception] {
      df.select(expr("graft_quant_dot(a, s)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
