package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** In-engine XLSX decode — SURVEY §2.1 S1 (the reference lands
  * QuickBooks exports as multi-sheet XLSX and reads them with pandas,
  * pipelines/quickbooks/pipeline.py:52-61,159-172). An .xlsx file is a
  * ZIP of OOXML parts; this reader walks exactly the parts needed to
  * recover cell values as strings:
  *
  *   - `xl/workbook.xml`            sheet names + relationship ids
  *   - `xl/_rels/workbook.xml.rels` relationship id → worksheet part
  *   - `xl/sharedStrings.xml`       the shared-string pool
  *   - `xl/worksheets/sheetN.xml`   rows of `<c r="A1" t="s"><v>…`
  *
  * Cells come back as the STORED string: shared strings (`t="s"`) and
  * inline strings (`t="inlineStr"`, rich-text runs concatenated)
  * resolve to their text; numbers, booleans and formula results keep
  * their stored lexical form. Typing (safe casts, date parsing) is
  * downstream's job, matching how the CSV landing path feeds
  * `Fns.standardizeColumns` + the staging models' guarded casts — and
  * matching the reference, which also ingests everything as text and
  * types in staging.
  *
  * DATE-STYLE SERIALS: a real workbook stores a date cell as a number
  * plus a date number-format (`xl/styles.xml` cellXfs → numFmt). With
  * `convertDateSerials = true` such cells decode to ISO `yyyy-MM-dd`
  * strings via the 1900-epoch conversion pandas/openpyxl apply
  * implicitly (pipelines/quickbooks/pipeline.py:159-172) — including
  * the Lotus leap-year quirk (serials < 61 are shifted so serial 1 =
  * 1900-01-01; the phantom Feb 29 1900 maps to Feb 28 like openpyxl).
  * The flag defaults to OFF, preserving the stored-lexical contract
  * for the reference's landed exports, which carry dates as text.
  * Time fractions are truncated (date-only surface; the reference's
  * QuickBooks columns are dates).
  *
  * Parsing is StAX (streaming, JDK-built-in): one pass per part, no
  * DOM, memory bounded by a row. SCALE: one landed XLSX is small by
  * construction (the reference's daily drops are 70 KB–851 KB,
  * BASELINE.md) and ZIP + XML decode of one file is inherently serial,
  * so [[read]]/[[readAll]] decode on the driver and hand distributed
  * work a DataFrame. When a drop has MANY files, [[readManyAsRows]]
  * moves the same decode onto executors via Spark's `binaryFile`
  * source — one file per task, scaling with file count like the
  * multimodal binary pipeline (`llm/Multimodal`).
  */
object Xlsx {

  /** One decoded sheet: header-less grid of stored cell strings; absent
    * cells are null, rows padded to the widest row. */
  final case class Sheet(name: String, rows: Vector[Vector[String]])

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
    try Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory)
      .map(e => e.getName -> zin.readAllBytes()).toMap
    finally zin.close()
  }

  private def newReader(part: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // No DTDs/external entities in OOXML parts; disable resolution.
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(part))
  }

  /** `A`→0, `AA`→26 … (the column part of a cell ref like `BC12`). */
  private[graft] def colIndex(cellRef: String): Int = {
    val letters = cellRef.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def sharedStrings(parts: Map[String, Array[Byte]]): IndexedSeq[String] =
    parts.get("xl/sharedStrings.xml").map { p =>
      val r = newReader(p)
      val out = Vector.newBuilder[String]
      var cur: StringBuilder = null
      var inText = false
      var inPhonetic = false // <rPh> phonetic runs are not cell text
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => cur = new StringBuilder
                case "rPh" => inPhonetic = true
                case "t" if cur != null && !inPhonetic => inText = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if inText =>
              cur.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "t" => inText = false
                case "rPh" => inPhonetic = false
                case "si" => out += cur.toString; cur = null
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      out.result()
    }.getOrElse(Vector.empty)

  /** Excel number-format ids that render as dates (ECMA-376 §18.8.30
    * builtin table: 14-22 dates/datetimes, 27-36 locale dates, 45-47
    * date-times). */
  private val builtinDateFormats: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47)).toSet

  /** Heuristic for CUSTOM format codes (the POI `isADateFormat` idea):
    * after stripping quoted literals and `[...]` sections (colors,
    * locale prefixes), a date format still contains y/m/d/h/s tokens
    * while numeric/currency/text formats contain none. */
  private[graft] def isDateCode(code: String): Boolean = {
    val stripped = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
      .toLowerCase
    stripped.exists(c => c == 'y' || c == 'm' || c == 'd' || c == 'h' ||
      c == 's')
  }

  /** cellXfs style indexes whose number format is a date format. */
  private def dateStyleIndexes(parts: Map[String, Array[Byte]]): Set[Int] =
    parts.get("xl/styles.xml").map { p =>
      val customDate = scala.collection.mutable.Set.empty[Int]
      val xfFormats = Vector.newBuilder[Int]
      var inCellXfs = false
      val r = newReader(p)
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "numFmt" =>
                  val id = Option(r.getAttributeValue(null, "numFmtId"))
                  val code = r.getAttributeValue(null, "formatCode")
                  if (id.exists(_.forall(_.isDigit)) && code != null &&
                    isDateCode(code)) customDate += id.get.toInt
                case "cellXfs" => inCellXfs = true
                case "xf" if inCellXfs =>
                  xfFormats += Option(r.getAttributeValue(null, "numFmtId"))
                    .filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(0)
                case _ =>
              }
            case XMLStreamConstants.END_ELEMENT
              if r.getLocalName == "cellXfs" => inCellXfs = false
            case _ =>
          }
        }
      } finally r.close()
      xfFormats.result().zipWithIndex.collect {
        case (fmt, i) if builtinDateFormats(fmt) || customDate(fmt) => i
      }.toSet
    }.getOrElse(Set.empty)

  /** Serial → ISO date, mirroring openpyxl's `from_excel`. Default
    * (Windows) 1900 system: epoch 1899-12-30, serials below the phantom
    * 1900-02-29 shifted up one (so serial 1 = 1900-01-01, serial 60 =
    * 1900-02-28, serial 61 = 1900-03-01); for serials ≥ 61 this equals
    * `LocalDate.ofEpochDay(serial - 25569)` — the property test checks
    * that identity independently. Mac-origin workbooks
    * (`<workbookPr date1904="1"/>`) use the 1904 system: serial 0 =
    * 1904-01-01, no phantom day, no shift. Time fraction truncated. */
  private[graft] def serialToIsoDate(serial: Double,
                                     date1904: Boolean = false): String = {
    val whole = math.floor(serial).toLong
    if (date1904)
      java.time.LocalDate.of(1904, 1, 1).plusDays(whole).toString
    else {
      val days = if (whole > 0 && whole < 60) whole + 1 else whole
      java.time.LocalDate.of(1899, 12, 30).plusDays(days).toString
    }
  }

  /** True when `xl/workbook.xml` declares the Mac 1904 date system. */
  private def isDate1904(parts: Map[String, Array[Byte]]): Boolean =
    parts.get("xl/workbook.xml").exists { wb =>
      val r = newReader(wb)
      try {
        var flag = false
        var done = false
        while (!done && r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr") {
            flag = {
              val v = r.getAttributeValue(null, "date1904")
              v == "1" || v == "true"
            }
            done = true
          }
        }
        flag
      } finally r.close()
    }

  private val numericSerial = "^-?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?$".r

  /** Sheet name → worksheet part path, in workbook order. */
  private def sheetTargets(parts: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val rels: Map[String, String] = parts.get("xl/_rels/workbook.xml.rels")
      .map { p =>
        val r = newReader(p)
        val m = Map.newBuilder[String, String]
        try {
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship") {
              val id = r.getAttributeValue(null, "Id")
              val target = r.getAttributeValue(null, "Target")
              if (id != null && target != null)
                m += id -> s"xl/${target.stripPrefix("/xl/").stripPrefix("./")}"
            }
          }
        } finally r.close()
        m.result()
      }.getOrElse(Map.empty)
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: no xl/workbook.xml"))
    val r = newReader(wb)
    val out = Seq.newBuilder[(String, String)]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // r:id lives in the officeDocument relationships namespace;
          // match by local name to tolerate prefix variation.
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          rid.flatMap(rels.get).foreach(t => out += name -> t)
        }
      }
    } finally r.close()
    out.result()
  }

  private def parseSheet(part: Array[Byte], shared: IndexedSeq[String],
                         dateStyles: Set[Int], convertDates: Boolean,
                         date1904: Boolean): Vector[Vector[String]] = {
    val r = newReader(part)
    val rows = Vector.newBuilder[Vector[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var cellStyle = -1
    // Accumulated text of the CURRENT cell: inline strings may carry
    // multiple rich-text runs (<is><r><t>a</t></r><r><t>b</t></r></is>);
    // each run appends here and the cell is emitted once at </c>,
    // mirroring the sharedStrings per-<si> accumulator.
    var cellBuf: StringBuilder = null
    var buf: StringBuilder = null
    var inValue = false
    var inPhonetic = false // <rPh> phonetic runs are not cell text
    var width = 0
    def put(col: Int, v: String): Unit = {
      while (row.length <= col) row += null
      row(col) = v
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                row = scala.collection.mutable.ArrayBuffer.empty[String]
                cellCol = -1
              case "c" if row != null =>
                val ref = r.getAttributeValue(null, "r")
                // minimal writers may omit r= — fall back to position
                cellCol = if (ref != null) colIndex(ref) else cellCol + 1
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                cellStyle = Option(r.getAttributeValue(null, "s"))
                  .filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(-1)
                cellBuf = null
              case "rPh" => inPhonetic = true
              case "v" | "t" if row != null && cellCol >= 0 && !inPhonetic =>
                buf = new StringBuilder; inValue = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inValue =>
            buf.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" if inValue =>
                inValue = false
                if (cellBuf == null) cellBuf = new StringBuilder
                cellBuf.append(buf.toString)
              case "rPh" => inPhonetic = false
              case "c" if row != null && cellCol >= 0 && cellBuf != null =>
                val raw = cellBuf.toString
                val v = cellType match {
                  case "s" => shared(raw.trim.toInt)
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case _ =>
                    if (convertDates && dateStyles.contains(cellStyle) &&
                      numericSerial.matches(raw.trim))
                      serialToIsoDate(raw.trim.toDouble, date1904)
                    else raw
                }
                put(cellCol, v)
                cellBuf = null
              case "row" if row != null =>
                width = math.max(width, row.length)
                rows += row.toVector
                row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result().map(r => r ++ Vector.fill(width - r.length)(null))
  }

  /** Decode every sheet of one workbook from bytes. With
    * `convertDateSerials` on, numeric cells carrying a date style
    * decode to ISO dates (see object scaladoc). */
  def decode(bytes: Array[Byte],
             convertDateSerials: Boolean = false): Seq[Sheet] = {
    val parts = zipEntries(bytes)
    val shared = sharedStrings(parts)
    val dateStyles =
      if (convertDateSerials) dateStyleIndexes(parts) else Set.empty[Int]
    val date1904 = convertDateSerials && isDate1904(parts)
    sheetTargets(parts).map { case (name, target) =>
      Sheet(name, parts.get(target)
        .map(parseSheet(_, shared, dateStyles, convertDateSerials, date1904))
        .getOrElse(Vector.empty))
    }
  }

  /** Decode one named sheet of one workbook from bytes. */
  def decodeSheet(bytes: Array[Byte], sheet: String,
                  convertDateSerials: Boolean = false): Sheet = {
    val sheets = decode(bytes, convertDateSerials)
    sheets.find(_.name == sheet).getOrElse(
      throw new IllegalArgumentException(
        s"sheet '$sheet' not found; has ${sheets.map(_.name)}"))
  }

  private def toDf(spark: SparkSession, sheet: Sheet): DataFrame = {
    val header = sheet.rows.headOption.getOrElse(Vector.empty)
      .zipWithIndex.map { case (h, i) => if (h == null) s"_c$i" else h }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = sheet.rows.drop(1).map { r =>
      Row.fromSeq(r.padTo(header.length, null).take(header.length))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava), schema)
  }

  /** S1 — multi-sheet scan: sheet name → all-string DataFrame with the
    * first row as header (pipeline.py:52-61 reads the same 23-sheet
    * workbooks). Driver-side decode of one small landed file; see the
    * object scaladoc for the many-file distributed path. */
  def readAll(spark: SparkSession, path: String,
              convertDateSerials: Boolean = false): Map[String, DataFrame] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    decode(bytes, convertDateSerials).map(s => s.name -> toDf(spark, s)).toMap
  }

  /** One sheet of one workbook as an all-string DataFrame. */
  def read(spark: SparkSession, path: String, sheet: String,
           convertDateSerials: Boolean = false): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    toDf(spark, decodeSheet(bytes, sheet, convertDateSerials))
  }

  /** Distributed decode for MANY workbooks sharing one sheet schema:
    * Spark's `binaryFile` source partitions work by file, each task
    * decodes its file's `sheet` and emits (source_file, columns…) rows.
    * `columns` fixes the output schema up front (required for a
    * distributed plan); each file's own header row maps its cells to
    * those columns by name, so column order may vary per file and
    * missing columns degrade to null — the same tolerance as the
    * staging models' optional-column guards. Only `*.xlsx` files are
    * scanned (a landing dir can legally mix dated CSVs with workbooks,
    * `Ingest.discover`), and a workbook that lacks `sheet` contributes
    * zero rows instead of failing the whole job — per-file degradation,
    * the behavior a 1000-file drop needs. */
  def readManyAsRows(spark: SparkSession, dir: String, sheet: String,
                     columns: Seq[String],
                     convertDateSerials: Boolean = false): DataFrame = {
    val schema = StructType(
      StructField("source_file", StringType, nullable = false) +:
        columns.map(StructField(_, StringType, nullable = true)))
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(dir)
      .select("path", "content")
    val rows = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      decode(r.getAs[Array[Byte]](1), convertDateSerials)
        .find(_.name == sheet) match {
        case None => Seq.empty[Row]
        case Some(s) =>
          val header = s.rows.headOption.getOrElse(Vector.empty)
          val idx: Map[String, Int] =
            header.zipWithIndex.filter(_._1 != null).toMap
          s.rows.drop(1).map { cells =>
            Row.fromSeq(path +: columns.map(c =>
              idx.get(c).filter(_ < cells.length).map(cells(_)).orNull))
          }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
