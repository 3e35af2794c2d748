package graft.cli

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ref.RefFixtures

/** Writes a reference-shaped SOURCE TREE for [[Main]] — the on-disk
  * layout the orchestrator consumes (the reference's `DROPBOX_PATH`,
  * orchestrator.py:91-115):
  *
  * {{{
  * <dir>/seed/All Lists_05_01_2024_seed.xlsx      (Customer + Item sheets)
  * <dir>/seed/2024-06-20_transactions.xlsx        (Invoice + Sales Receipt)
  * <dir>/seed/company_enrichment.jsonl
  * <dir>/input/All Lists_06_01_2024_export.xlsx   (daily snapshot)
  * <dir>/input/2024-06-21_transactions.xlsx       (daily invoice file)
  * <dir>/trade_shows/trade_show_leads.xlsx        (Leads sheet)
  * <dir>/config/individual_email_domains.txt
  * <dir>/config/customer_name_mappings.txt
  * }}}
  *
  * Content derives from [[graft.ref.RefFixtures]] so the CLI pipeline
  * lands on the same staged values the RefPipelineSpec battery checks:
  * the seed carries the 2024-05-01 item snapshot (old AK4 price 14.50),
  * the daily lists file carries the 2024-06-01 snapshot (15.00) — so
  * only after `--incremental` does latest-snapshot dedup flip the
  * price — and the daily transactions file adds invoice INV-1005.
  * Workbooks are real OOXML (inline strings) decoded by the in-engine
  * [[graft.sources.Xlsx]]; headers are the human-readable QuickBooks
  * forms that `Fns.standardizeColumns` maps back to the DLT names.
  */
object DemoSource {

  /** Seed-snapshot items (2024-05-01): AK4 at the pre-raise price. */
  private val itemHeader = Seq("Quick Books Internal Id", "Item Name",
    "Item Type", "Sales Description", "Sales Price", "Purchase Cost",
    "Quantity On Hand", "U M", "Status")
  private val itemsSeed = Seq(
    Seq("I001", "01-6310.AK4", "Inventory Part",
      "Asphalt anchor, 72 anchors per carton", "14.50", "6.20", "500",
      "ea", "Active"),
    Seq("I002", "01-6310.MST", "Inventory Part", "Master 6 6-packs",
      "80.00", "38.00", "60", "ea", "Active"),
    Seq("I003", "02-8100.3SK", "Inventory Part",
      "Surface mount kit, 36 for EPX2", "45.00", "21.00", "120", "kit",
      "Active"),
    Seq("I004", "EPX2-KIT", "Assembly", "Epoxy cartridge kit", "29.00",
      "12.00", "200", "kit", "Active"),
    Seq("I005", "SHIPPING", "Service", "Freight", "0.00", "0.00", "", "",
      "Active"))

  /** Daily-snapshot items (2024-06-01): the RefFixtures current values. */
  private val itemsDaily = Seq(
    Seq("I001", "01-6310.AK4", "Inventory Part",
      "Asphalt anchor, 72 anchors per carton", "15.00", "6.40", "480",
      "ea", "Active"),
    Seq("I002", "01-6310.MST", "Inventory Part", "Master 6 6-packs",
      "80.00", "38.00", "60", "ea", "Active"),
    Seq("I003", "02-8100.3SK", "Inventory Part",
      "Surface mount kit, 36 for EPX2", "45.00", "21.00", "120", "kit",
      "Active"),
    Seq("I004", "EPX2-KIT", "Assembly", "Epoxy cartridge kit", "29.00",
      "12.00", "200", "kit", "Active"),
    Seq("I005", "SHIPPING", "Service", "Freight", "0.00", "0.00", "", "",
      "Active"))

  /** The one incremental transaction: a new June invoice for Acme. */
  private val invoiceDailyRows = Seq(
    Seq("INV-1005", "2024-06-21", "Acme Industrial", "01-6310.AK4",
      "Anchors", "8", "15.00", "120.00", "Open", "Tax", "", "Net 30",
      "120.00", "RW", "Columbus", "OH", "USA", "2024-07-21", "", "", "",
      "", "", "0", "USD"))

  /** Snake-name → human XLSX header. The DLT double-underscore artifact
    * (`product_service__amount` from "Product/Service Amount") cannot
    * round-trip through `normalizeColumnName` (it collapses `__`), so
    * [[Main]] renames it back after standardization. */
  private def header(snake: String): String = snake match {
    case "product_service" => "Product/Service"
    case "product_service_description" => "Product/Service Description"
    case "product_service_quantity" => "Product/Service Quantity"
    case "product_service_rate" => "Product/Service Rate"
    case "product_service__amount" => "Product/Service Amount"
    case "product_service_amount" => "Product Service Amount"
    case _ => snake.split('_').filter(_.nonEmpty)
      .map(w => w.head.toUpper + w.tail).mkString(" ")
  }

  /** Collect a fixture frame to header+rows, dropping the load-metadata
    * columns the CLI stamps itself at ingest time. */
  private def sheetOf(df: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.toSeq
      .filterNot(Set("load_date", "snapshot_date", "is_seed"))
    val rows = df.select(cols.map(c =>
        org.apache.spark.sql.functions.col(c).cast("string")): _*)
      .collect().toSeq
      .map(r => cols.indices.map(i =>
        Option(r.getString(i)).getOrElse("")))
    (cols.map(header), rows)
  }

  /** Writes the full demo tree; returns the root dir. */
  def write(spark: SparkSession, dir: Path): Path = {
    Seq("seed", "input", "trade_shows", "config")
      .foreach(d => Files.createDirectories(dir.resolve(d)))

    val (custHeader, custRows) = sheetOf(RefFixtures.rawCustomers(spark))
    writeXlsx(dir.resolve("seed/All Lists_05_01_2024_seed.xlsx"), Seq(
      "Customer" -> (custHeader +: custRows),
      "Item" -> (itemHeader +: itemsSeed)))
    writeXlsx(dir.resolve("input/All Lists_06_01_2024_export.xlsx"), Seq(
      "Customer" -> (custHeader +: custRows),
      "Item" -> (itemHeader +: itemsDaily)))

    val (invHeader, invRows) = sheetOf(RefFixtures.rawInvoices(spark))
    val (recHeader, recRows) = sheetOf(RefFixtures.rawSalesReceipts(spark))
    writeXlsx(dir.resolve("seed/2024-06-20_transactions.xlsx"), Seq(
      "Invoice" -> (invHeader +: invRows),
      "Sales Receipt" -> (recHeader +: recRows)))
    writeXlsx(dir.resolve("input/2024-06-21_transactions.xlsx"), Seq(
      "Invoice" -> (invHeader +: invoiceDailyRows)))

    val (leadHeader, leadRows) = sheetOf(RefFixtures.rawTradeShowLeads(spark))
    writeXlsx(dir.resolve("trade_shows/trade_show_leads.xlsx"),
      Seq("Leads" -> (leadHeader +: leadRows)))

    Files.copy(java.nio.file.Paths.get(RefFixtures.enrichmentJsonl()),
      dir.resolve("seed/company_enrichment.jsonl"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    Files.writeString(dir.resolve("config/individual_email_domains.txt"),
      """# personal-email providers → INDIVIDUAL_ domain keys
        |gmail.com
        |yahoo.com
        |hotmail.com
        |outlook.com
        |aol.com
        |""".stripMargin)
    Files.writeString(dir.resolve("config/customer_name_mappings.txt"),
      """# explicit original -> normalized overrides
        |Bolt Supply Customer -> Bolt Supply House
        |""".stripMargin)
    dir
  }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal real OOXML workbook: one worksheet part per sheet, every
    * cell an inline string (the shape QuickBooks CSV-ish exports take;
    * [[graft.sources.Xlsx]] exercises shared strings/serials elsewhere). */
  private[graft] def writeXlsx(path: Path,
                               sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val ct = new StringBuilder
    ct ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    ct ++= """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">"""
    ct ++= """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>"""
    ct ++= """<Default Extension="xml" ContentType="application/xml"/>"""
    ct ++= """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>"""
    sheets.indices.foreach { i =>
      ct ++= s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
    }
    ct ++= "</Types>"

    val wbSheets = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val wb =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$wbSheets</sheets></workbook>"""
    val wbRels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""",
      "", "</Relationships>")
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

    def sheetXml(rows: Seq[Seq[String]]): String = {
      val b = new StringBuilder
      b ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      b ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      rows.foreach { cells =>
        b ++= "<row>"
        cells.foreach(c =>
          b ++= s"""<c t="inlineStr"><is><t>${esc(c)}</t></is></c>""")
        b ++= "</row>"
      }
      b ++= "</sheetData></worksheet>"
      b.toString
    }

    val parts = Seq(
      "[Content_Types].xml" -> ct.toString,
      "_rels/.rels" -> rootRels,
      "xl/workbook.xml" -> wb,
      "xl/_rels/workbook.xml.rels" -> wbRels) ++
      sheets.zipWithIndex.map { case ((_, rows), i) =>
        s"xl/worksheets/sheet${i + 1}.xml" -> sheetXml(rows)
      }
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(path))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
