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

  test("BPE: applying the TRAINED merge table reproduces training's result") {
    import graft.llm.TextAnalysis
    // Cross-validation of the two halves of distributed BPE: train
    // rounds=3 on a random corpus, read the learned merges out of the
    // result, replay them with the fixed-table apply path — per-doc
    // final symbol counts must be IDENTICAL (they run different plans:
    // in-plan learned broadcast vs literal predicates).
    val words = Seq("the", "there", "then", "other", "her", "here",
      "where", "ere", "ore", "err")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(6)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val trained = TextAnalysis.bpeTrainApply(docs, $"doc_id", $"text",
      rounds = 3)
    val merges = trained.select("merge_1", "merge_2", "merge_3")
      .head() match {
      case r => (0 until 3).map { i =>
        val Array(l, tr) = r.getString(i).split("\\+", 2)
        (l, tr)
      }
    }
    val applied = TextAnalysis.bpeApplyMerges(docs, $"doc_id", $"text",
      merges)
    val a = trained.select("doc_id", "n_syms_after")
      .as[(Long, Long)].collect().toMap
    val b = applied.select("doc_id", "n_syms_after")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("temperatureMix invariants: quota sum <= totalN, kept = min(quota, n)") {
    import graft.llm.TextAnalysis
    // Random skewed group sizes; floors make the quota sum land in
    // (totalN - nGroups, totalN]; per-group kept rows are exactly
    // min(quota, group size) whatever the seed.
    val sizes = (0 until 12).map(g => (s"g$g", 1 + rnd.nextInt(400)))
    val docs = sizes.zipWithIndex.flatMap { case ((g, n), gi) =>
      (0 until n).map(i => (gi * 100000L + i, g)) }
      .toDF("doc_id", "src")
    val totalN = 500L
    val got = TextAnalysis.temperatureMix(docs, $"doc_id", $"src",
      totalN, seed = "prop7")
    val quotas = got.select("mix_group", "quota").distinct()
      .as[(String, Long)].collect().toMap
    assert(quotas.values.sum <= totalN)
    assert(quotas.values.sum > totalN - sizes.size)
    val kept = got.groupBy("mix_group").count()
      .as[(String, Long)].collect().toMap
    val bySize = sizes.toMap
    kept.foreach { case (g, n) =>
      assert(n == math.min(quotas(g), bySize(g).toLong),
        s"group $g kept $n, quota ${quotas(g)}, size ${bySize(g)}") }
  }

  test("normalizeForDedup is idempotent and casing/punctuation-invariant") {
    import graft.llm.TextAnalysis
    val strings = (0 until 200).map { _ =>
      val len = rnd.nextInt(40)
      new String(Array.fill(len)(
        "aZ9 ,.!-_\t&#:/\\\"'()".charAt(rnd.nextInt(19))))
    }
    val df = strings.toDF("s")
      .select(TextAnalysis.normalizeForDedup($"s").as("n1"))
      .select($"n1", TextAnalysis.normalizeForDedup($"n1").as("n2"))
    assert(df.filter($"n1" =!= $"n2").count() == 0)
    // perturbing case/punct/whitespace never changes the normal form
    val perturbed = strings.toDF("s").select(
      TextAnalysis.normalizeForDedup($"s").as("a"),
      TextAnalysis.normalizeForDedup(
        concat(lit("  "), upper($"s"), lit("!?"))).as("b"))
    assert(perturbed.filter($"a" =!= $"b").count() == 0)
  }

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

  test("chunkDocuments invariants: full coverage, stride starts, exact slices") {
    import graft.llm.{Packing, TextAnalysis => TA}
    // Random docs of 0..60 tokens; random (stride, chunkSize) per run.
    val stride = 1 + rnd.nextInt(9)
    val chunkSize = stride + rnd.nextInt(9)
    val docs = (0 until 80).map { i =>
      val n = rnd.nextInt(61)
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Packing.chunkDocuments(df, $"doc_id", TA.tokens($"text"),
      chunkSize, stride).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val chunks = got.getOrElse(id, Array.empty).sortBy(
        _.getAs[Long]("chunk_idx"))
      if (toks.isEmpty) assert(chunks.isEmpty, s"doc $id: empty → no chunks")
      else {
        // starts are exactly the stride multiples below n
        assert(chunks.map(_.getAs[Long]("start_tok")).toSeq ==
          (0L until toks.length.toLong by stride.toLong))
        chunks.foreach { c =>
          val s0 = c.getAs[Long]("start_tok").toInt
          val expect = toks.slice(s0, s0 + chunkSize)
          assert(c.getAs[String]("chunk_text") == expect.mkString(" "))
          assert(c.getAs[Long]("chunk_tokens") == expect.length.toLong)
        }
        // every token position is covered by at least one chunk
        val covered = chunks.flatMap { c =>
          val s0 = c.getAs[Long]("start_tok").toInt
          s0 until math.min(s0 + chunkSize, toks.length)
        }.toSet
        assert(covered == toks.indices.toSet, s"doc $id coverage gap")
      }
    }
  }

  test("packSequences invariants: offsets inside budget, contiguous packs") {
    import graft.llm.Packing
    val budget = 50L + rnd.nextInt(50)
    val docs = (0 until 300).map(i => (i.toLong, rnd.nextInt(40)))
      .toDF("doc_id", "n_tok")
    val rows = Packing.packSequences(docs, $"doc_id", $"n_tok",
      budget, nShards = 4).collect()
    rows.foreach { r =>
      val off = r.getAs[Long]("offset_in_pack")
      assert(off >= 0 && off < budget)
      assert(r.getAs[Long]("pack_id") == r.getAs[Long]("shard") *
        Packing.PackIdRadix + r.getAs[Long]("pack_in_shard"))
      assert(r.getAs[Boolean]("spans_boundary") ==
        (off + r.getAs[Long]("n_tokens") > budget))
    }
    // per shard: packs are contiguous 0..max and cum_before is the
    // running sum in doc order
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("cum_before") == cum)
        assert(r.getAs[Long]("pack_in_shard") == cum / budget)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("corpusShuffle is a permutation: every doc exactly once, all shards used") {
    import graft.llm.{TextAnalysis => TA}
    val n = 500L
    val docs = (0L until n).toDF("doc_id")
    val rows = TA.corpusShuffle(docs, $"doc_id", "permcheck", nShards = 8)
      .collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == (0L until n).toSet)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet == (0L until 8L).toSet, "all shards populated")
    // global identity: (shard, position) pairs are unique — a reader
    // interleaving shards in position order sees each doc exactly once
    assert(rows.map(r => (r.getAs[Long]("shard"),
      r.getAs[Long]("position"))).distinct.length == n)
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

  test("xlsx round-trip: random grids with XML-special content survive decode") {
    import graft.sources.Xlsx
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    // 20 random grids: mixed shared-string / inline / numeric cells,
    // random XML-special and unicode content, ragged rows.
    (0 until 20).foreach { trial =>
      val nRows = 1 + rnd.nextInt(6)
      val nCols = 1 + rnd.nextInt(5)
      val alphabet = "ab<>&\"'é☃ %|;\t"
      def randStr() = (0 until 1 + rnd.nextInt(8))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val grid: Seq[Seq[Option[String]]] = (0 until nRows).map { _ =>
        (0 until nCols).map { _ =>
          rnd.nextInt(4) match {
            case 0 => None // skipped cell
            case 1 => Some(rnd.nextInt(1000).toString) // numeric
            case _ => Some(randStr())
          }
        }
      }
      val shared = grid.flatten.flatten.distinct.zipWithIndex.toMap
      val sst = "<?xml version=\"1.0\"?><sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        shared.toSeq.sortBy(_._2)
          .map { case (s, _) => s"<si><t>${esc(s)}</t></si>" }
          .mkString + "</sst>"
      def cellRef(r: Int, c: Int): String = {
        var n = c + 1; var s = ""
        while (n > 0) { s = ('A' + (n - 1) % 26).toChar + s; n = (n - 1) / 26 }
        s"$s${r + 1}"
      }
      val rowsXml = grid.zipWithIndex.map { case (row, r) =>
        val cells = row.zipWithIndex.collect { case (Some(v), c) =>
          if (rnd.nextBoolean())
            s"""<c r="${cellRef(r, c)}" t="s"><v>${shared(v)}</v></c>"""
          else
            s"""<c r="${cellRef(r, c)}" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${r + 1}">$cells</row>"""
      }.mkString
      val sheetXml = "<?xml version=\"1.0\"?><worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        s"<sheetData>$rowsXml</sheetData></worksheet>"
      val wb = """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""
      val rels = """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>"""
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      Seq("xl/workbook.xml" -> wb, "xl/_rels/workbook.xml.rels" -> rels,
        "xl/sharedStrings.xml" -> sst,
        "xl/worksheets/sheet1.xml" -> sheetXml).foreach { case (n, c) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        z.closeEntry()
      }
      z.close()
      val decoded = Xlsx.decodeSheet(bos.toByteArray, "S")
      // trailing all-skipped columns are unobservable in the cell XML;
      // compare up to the decoded width, padded
      val width = decoded.rows.map(_.length).maxOption.getOrElse(0)
      val expected = grid.map(r =>
        r.map(_.orNull).padTo(width, null).take(width))
      assert(decoded.rows == expected.map(_.toVector).toVector,
        s"trial $trial: grid=$grid")
    }
  }

  test("connectedComponents matches union-find on random graphs") {
    import graft.llm.Dedup
    // 5 random graphs of varying density; ground truth from a plain
    // in-memory union-find with path compression.
    (0 until 5).foreach { trial =>
      val n = 30 + rnd.nextInt(50)
      val nEdges = rnd.nextInt(2 * n)
      val edges = (0 until nEdges)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical = min id in component == find root when unions always
      // hang the larger root under the smaller
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Dedup.connectedComponents(
        (0L until n.toLong).toDF("id"),
        edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"trial $trial n=$n edges=$edges")
    }
  }

  test("xlsx 1900-epoch serial math matches java.time; date codes classify") {
    import graft.sources.Xlsx
    // modern serials (≥ 61, past the Lotus phantom day): the epoch shift
    // must equal the independent unix-epoch identity serial - 25569
    (0 until 500).foreach { _ =>
      val serial = 61 + rnd.nextInt(80000)
      assert(Xlsx.serialToIsoDate(serial.toDouble) ==
        java.time.LocalDate.ofEpochDay(serial.toLong - 25569).toString)
    }
    assert(Xlsx.serialToIsoDate(1) == "1900-01-01")
    assert(Xlsx.serialToIsoDate(59) == "1900-02-28")
    assert(Xlsx.serialToIsoDate(60) == "1900-02-28",
      "phantom 1900-02-29 maps to Feb 28, as openpyxl does")
    assert(Xlsx.serialToIsoDate(61) == "1900-03-01")
    assert(Xlsx.serialToIsoDate(45299.99) == "2024-01-08",
      "time fraction truncated")
    // Mac 1904 system: serial s = 1900-system serial s + 1462, no
    // phantom-day shift anywhere.
    (0 until 200).foreach { _ =>
      val serial = rnd.nextInt(80000)
      assert(Xlsx.serialToIsoDate(serial.toDouble, date1904 = true) ==
        java.time.LocalDate.of(1904, 1, 1).plusDays(serial.toLong).toString)
    }
    assert(Xlsx.serialToIsoDate(43837, date1904 = true) == "2024-01-08")
    assert(Xlsx.serialToIsoDate(0, date1904 = true) == "1904-01-01")
    assert(Xlsx.isDateCode("yyyy-mm-dd;@"))
    assert(Xlsx.isDateCode("m/d/yy h:mm"))
    assert(Xlsx.isDateCode("[$-409]d-mmm-yy"))
    assert(!Xlsx.isDateCode("#,##0.00"))
    assert(!Xlsx.isDateCode("General"))
    assert(!Xlsx.isDateCode("0.00%"))
    assert(!Xlsx.isDateCode("\"Day \"0.0"),
      "quoted literals must not trigger date detection")
  }

  test("xlsx column refs decode beyond Z") {
    import graft.sources.Xlsx
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("AZ1") == 51)
    assert(Xlsx.colIndex("BC12") == 54)
  }
}
