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
  * inline strings (`t="inlineStr"`) resolve to their text; numbers,
  * booleans and formula results keep their stored lexical form. Typing
  * (safe casts, date parsing) is downstream's job, matching how the
  * CSV landing path feeds `Fns.standardizeColumns` + the staging
  * models' guarded casts — and matching the reference, which also
  * ingests everything as text and types in staging. Style-based date
  * serials (a number plus a date format) are surfaced as the serial
  * string; the reference's landed exports carry dates as text.
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
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => cur = new StringBuilder
                case "t" if cur != null => inText = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if inText =>
              cur.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "t" => inText = false
                case "si" => out += cur.toString; cur = null
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      out.result()
    }.getOrElse(Vector.empty)

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

  private def parseSheet(part: Array[Byte],
                         shared: IndexedSeq[String]): Vector[Vector[String]] = {
    val r = newReader(part)
    val rows = Vector.newBuilder[Vector[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var buf: StringBuilder = null
    var inValue = false
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
              case "v" | "t" if row != null && cellCol >= 0 =>
                buf = new StringBuilder; inValue = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inValue =>
            buf.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" if inValue =>
                inValue = false
                val raw = buf.toString
                val v = cellType match {
                  case "s" => shared(raw.trim.toInt)
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case _ => raw
                }
                put(cellCol, v)
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

  /** Decode every sheet of one workbook from bytes. */
  def decode(bytes: Array[Byte]): Seq[Sheet] = {
    val parts = zipEntries(bytes)
    val shared = sharedStrings(parts)
    sheetTargets(parts).map { case (name, target) =>
      Sheet(name, parts.get(target).map(parseSheet(_, shared))
        .getOrElse(Vector.empty))
    }
  }

  /** Decode one named sheet of one workbook from bytes. */
  def decodeSheet(bytes: Array[Byte], sheet: String): Sheet =
    decode(bytes).find(_.name == sheet).getOrElse(
      throw new IllegalArgumentException(
        s"sheet '$sheet' not found; has ${decode(bytes).map(_.name)}"))

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
  def readAll(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    decode(bytes).map(s => s.name -> toDf(spark, s)).toMap
  }

  /** One sheet of one workbook as an all-string DataFrame. */
  def read(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    toDf(spark, decodeSheet(bytes, sheet))
  }

  /** Distributed decode for MANY workbooks sharing one sheet schema:
    * Spark's `binaryFile` source partitions work by file, each task
    * decodes its file's `sheet` and emits (source_file, columns…) rows.
    * `columns` fixes the output schema up front (required for a
    * distributed plan); each file's own header row maps its cells to
    * those columns by name, so column order may vary per file and
    * missing columns degrade to null — the same tolerance as the
    * staging models' optional-column guards. */
  def readManyAsRows(spark: SparkSession, dir: String, sheet: String,
                     columns: Seq[String]): DataFrame = {
    val schema = StructType(
      StructField("source_file", StringType, nullable = false) +:
        columns.map(StructField(_, StringType, nullable = true)))
    val bin = spark.read.format("binaryFile").load(dir)
      .select("path", "content")
    val rows = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      val s = decodeSheet(r.getAs[Array[Byte]](1), sheet)
      val header = s.rows.headOption.getOrElse(Vector.empty)
      val idx: Map[String, Int] =
        header.zipWithIndex.filter(_._1 != null).toMap
      s.rows.drop(1).map { cells =>
        Row.fromSeq(path +: columns.map(c =>
          idx.get(c).filter(_ < cells.length).map(cells(_)).orNull))
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
