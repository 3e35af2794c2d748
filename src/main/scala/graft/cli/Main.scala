package graft.cli

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Fns
import graft.ingest.Ingest
import graft.operators.MergeUpsert
import graft.quality.Checks
import graft.ref.{Catalog, ModelDag}

/** UNIFIED PIPELINE DRIVER — the one-command counterpart of the
  * reference's `orchestrator.py run_full_pipeline(mode)`
  * (orchestrator.py:506-573): sources in priority order with a
  * processed-file mtime skip (orchestrator.py:86-141) → raw-layer load
  * (DLT merge semantics) → the full transform DAG → non-fatal data-
  * quality checks, all inside ONE SparkSession.
  *
  * {{{
  * runMain graft.cli.Main --seed        --data DIR [--warehouse DIR]
  * runMain graft.cli.Main --incremental --data DIR [--warehouse DIR]
  * runMain graft.cli.Main               # self-demo: seed → incremental → skip
  * }}}
  *
  * Source layout (see [[DemoSource]] for a generated example):
  * `seed/` holds the historical workbooks (+ `company_enrichment
  * .jsonl`), `input/` the daily exports — both discovered via the
  * filename conventions of [[Ingest.discover]] (S4) — plus the
  * `trade_shows/` workbooks and the two flat-file configs under `config/`
  * (domain_consolidation.py:21-54). `--seed` replaces the raw tables
  * from `seed/`; `--incremental` requires a prior seed and merges each
  * newer `input/` file chronologically (DLT `write_disposition="merge"`,
  * pipelines/quickbooks/pipeline.py:301-306). Every raw table is an
  * [[graft.operators.AtomicTable]] commit, so a crashed run never
  * leaves a half-written raw layer and the transform always reads a
  * committed snapshot.
  *
  * Differences from the reference, both deliberate: Shopify extraction
  * is out-of-engine (docs/ADR-001), so the DAG's Shopify models engage
  * only when another loader has landed `raw.shopify_*`; and seed
  * workbooks are discovered by the dated-name convention rather than
  * the hardcoded `all_lists.xlsx` (the convention subsumes the fixed
  * name and keeps multi-file seeds ordered).
  */
object Main {

  final case class SourceRun(source: String, status: String,
                             files: Seq[String], tables: Map[String, Long])
  final case class Report(mode: String, sources: Seq[SourceRun],
                          models: Int, quality: Seq[Checks.Result],
                          overallStatus: String,
                          modelsSkipped: Seq[String] = Nil,
                          txnRecovered: Seq[String] = Nil,
                          txnRolledBack: Seq[String] = Nil,
                          manifestSeq: Long = -1L,
                          lint: Option[graft.tools.DagLint.Report] = None) {
    def source(name: String): SourceRun = sources.find(_.source == name).get
  }

  /** raw-layer table per sheet, with post-standardization renames for
    * DLT flattening artifacts `normalizeColumnName` cannot produce
    * (base_quickbooks__order_items.sql reads the double-underscore
    * amount; models/staging/raw_data/sources.yml names the tables). */
  private val sheetTables: Map[String, (String, Map[String, String])] = Map(
    "Customer" -> (("xlsx_customer", Map.empty)),
    "Item" -> (("xlsx_item", Map.empty)),
    "Invoice" -> (("xlsx_invoice",
      Map("product_service_amount" -> "product_service__amount"))),
    "Sales Receipt" -> (("xlsx_sales_receipt", Map.empty)))

  /** DLT primary keys (pipelines/quickbooks/pipeline.py:186-214): the
    * item grain is per snapshot; order lines are per product line. */
  private val mergeKeys: Map[String, Seq[String]] = Map(
    "xlsx_customer" -> Seq("quick_books_internal_id"),
    "xlsx_item" -> Seq("item_name", "snapshot_date"),
    "xlsx_invoice" -> Seq("invoice_no", "product_service"),
    "xlsx_sales_receipt" -> Seq("sales_receipt_no", "product_service"))

  def main(args: Array[String]): Unit = {
    // pipeline session: graft optimizer extensions attached, so every
    // model join benefits from committed ANALYZE stats (see Sessions)
    val spark = graft.Sessions.pipeline(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val dataArg = optValue(args, "--data")
    val wh = optValue(args, "--warehouse").getOrElse(
      Files.createTempDirectory("graft_cli_wh").toString)
    val seed = args.contains("--seed")
    val inc = args.contains("--incremental")
    require(!(seed && inc), "--seed and --incremental are mutually exclusive")
    val strict = args.contains("--strict")
    def checkStrict(r: Report): Report = {
      if (strict && r.lint.exists(!_.ok)) {
        System.err.println("[cli] --strict: daglint violations — failing")
        spark.stop()
        sys.exit(1)
      }
      r
    }
    if (args.contains("--corpus")) {
      // LLM-corpus pipeline driver (r19 VERDICT task #1) — same shapes
      // as the reference DAG below: --data runs one governed pass;
      // no --data runs the self-demo (seed → incremental → skip).
      import graft.corpus.{CorpusDemoSource, CorpusPipeline}
      dataArg match {
        case Some(data) =>
          require(seed || inc, "pass --seed or --incremental with --data")
          printCorpus(CorpusPipeline.run(spark,
            if (seed) "seed" else "incremental", data, wh))
        case None =>
          val dataP = Files.createTempDirectory("graft_corpus_demo")
          CorpusDemoSource.write(spark, dataP, upTo = 2)
          println(s"[cli] corpus demo batches at $dataP, warehouse at $wh")
          printCorpus(CorpusPipeline.run(spark, "seed", dataP.toString, wh))
          CorpusDemoSource.write(spark, dataP, upTo = 3) // next drop lands
          printCorpus(CorpusPipeline.run(spark, "incremental",
            dataP.toString, wh))
          printCorpus(CorpusPipeline.run(spark, "incremental",
            dataP.toString, wh)) // skip pass
      }
      if (args.contains("--maintain")) {
        val actions = CorpusPipeline.maintain(spark, wh)
        if (actions.isEmpty) println("[cli] maintenance: steady state")
        else actions.foreach(a => println(
          s"[cli] maintenance: ${a.table} ${a.action} (${a.detail})"))
      }
      spark.stop()
      return
    }
    dataArg match {
      case Some(data) =>
        require(seed || inc, "pass --seed or --incremental with --data")
        print(checkStrict(run(spark, if (seed) "seed" else "incremental",
          data, wh, optValue(args, "--source"))))
      case None => // self-demo over a generated tree: seed → inc → skip
        val data = DemoSource.write(spark,
          Files.createTempDirectory("graft_cli_demo")).toString
        println(s"[cli] demo source tree at $data, warehouse at $wh")
        print(checkStrict(run(spark, "seed", data, wh)))
        print(checkStrict(run(spark, "incremental", data, wh)))
        print(checkStrict(run(spark, "incremental", data, wh)))
    }
    if (args.contains("--maintain")) {
      val actions = maintain(spark, wh)
      if (actions.isEmpty) println("[cli] maintenance: steady state")
      else actions.foreach(a => println(
        s"[cli] maintenance: ${a.table} ${a.action} (${a.detail})"))
    }
    spark.stop()
  }

  private def printCorpus(r: graft.corpus.CorpusPipeline.Report): Unit = {
    r.batches.foreach(b => println(
      s"[cli] corpus batch ${b.batch} (ordinal ${b.ordinal}): " +
        s"${b.status}, ${b.rowsIn} in, ${b.keptCurated} curated, " +
        s"${b.keptExact} past exact dedup"))
    val failed = r.quality.filterNot(_.passed)
    val skipNote =
      if (r.modelsSkipped.isEmpty) ""
      else s" (${r.modelsSkipped.size} unchanged, served from cache)"
    println(s"[cli] corpus ${r.mode}: ${r.models} models$skipNote, " +
      s"${r.canonicalDocs} canonical docs, export " +
      s"${if (r.exportRewritten) "rewritten" else "served"}, " +
      s"${r.quality.size} quality checks (${failed.size} failed), " +
      s"manifest seq ${r.manifestSeq} → ${r.overallStatus}")
  }

  /** POST-RUN TABLE SERVICES over the key marts (dbt's post-hook /
    * auto-OPTIMIZE slot): compact fragmented versions, (re)ANALYZE
    * fresh commits so the stats-driven broadcast advisor has numbers,
    * vacuum beyond retention — all decided from committed metadata
    * ([[graft.operators.Maintenance]]); a steady-state warehouse runs
    * zero actions.
    *
    * Base+delta INDEX dirs (anything committed under
    * `warehouseRoot/index/` — the persisted dedup indexes a streaming
    * or daily-crawl deployment accretes) are swept by the same loop:
    * Maintenance plans `compact_to_base` on delta debt (r18, task #5's
    * guard makes this safe — the snapshot rules refuse delta layouts)
    * and nothing else, so the merged view is byte-identical before and
    * after. */
  def maintain(spark: SparkSession, warehouseRoot: String)
      : Seq[graft.operators.Maintenance.Action] = {
    import graft.operators.Maintenance
    val marts = Seq(
      "fct_orders" -> Seq("order_number"),
      "fct_companies" -> Seq("company_domain_key")
    ).flatMap { case (t, keys) =>
      Maintenance.run(spark, s"$warehouseRoot/mart/$t",
        Maintenance.Policy(statsCols = keys))
    }
    marts ++ maintainIndexes(spark, warehouseRoot)
  }

  /** Index-dir half of [[maintain]], shared with the corpus pipeline
    * ([[graft.corpus.CorpusPipeline.maintain]] sweeps the same
    * `warehouse/index/` layout its folds commit into — one production
    * sweep, not per-driver copies). */
  def maintainIndexes(spark: SparkSession, warehouseRoot: String)
      : Seq[graft.operators.Maintenance.Action] = {
    import graft.operators.Maintenance
    val idxRoot = new org.apache.hadoop.fs.Path(s"$warehouseRoot/index")
    val fs = idxRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    import graft.operators.AtomicTable
    val indexes =
      if (!fs.exists(idxRoot)) Nil
      else {
        // A ShardedNearDupIndex commits at <name>/{labels,bands}, never
        // at <name> itself — recurse ONE extra level so nested dirs are
        // swept too (r18 ADVICE: a flat listing planned Nil for them and
        // their delta debt silently never compacted). A dir counts as a
        // table when it has committed versions at its own level.
        val level1 = fs.listStatus(idxRoot).toSeq.filter(_.isDirectory)
          .map(_.getPath)
        // Nested tables report as "<index>/<labels|bands>" — a flat
        // Path.getName made every sharded index's dirs surface as just
        // "labels"/"bands", indistinguishable when two indexes live
        // under warehouse/index (r19 ADVICE). Qualification is decided
        // HERE, where nesting depth is known, not by path comparison.
        val tables: Seq[(org.apache.hadoop.fs.Path, Option[String])] =
          level1.flatMap { p =>
            if (AtomicTable.committedVersions(spark, p.toString).nonEmpty)
              Seq((p, None))
            else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
              .filter(c =>
                AtomicTable.committedVersions(spark, c.toString).nonEmpty)
              .map(c => (c, Some(p.getName)))
          }.sortBy(_._1.toString)
        tables.flatMap { case (p, parentName) =>
          val d = p.toString
          def qualified(acts: Seq[Maintenance.Action])
              : Seq[Maintenance.Action] =
            parentName.fold(acts)(pn =>
              acts.map(a => a.copy(table = s"$pn/${a.table}")))
          qualified(
          if (p.getName == "labels" && AtomicTable.isDeltaLayout(spark, d)) {
            // labels dirs carry lab_v upsert rows: compact through the
            // last-writer-wins resolve (dead row VERSIONS disappear, not
            // just files) instead of the generic file fold.
            val acts = Maintenance.plan(spark, d, Maintenance.Policy())
            if (acts.exists(_.action == "compact_to_base"))
              graft.llm.ShardedNearDupIndex.compactLabels(spark,
                p.getParent.toString)
            acts
          } else if (p.getName == "bands" &&
              AtomicTable.isDeltaLayout(spark, d)) {
            // bands dirs compact through the rank-materializing fold so
            // probeCap's committed-bulk filter has stored probe_rk rows
            val acts = Maintenance.plan(spark, d, Maintenance.Policy())
            if (acts.exists(_.action == "compact_to_base"))
              graft.llm.ShardedNearDupIndex.compactBands(spark,
                p.getParent.toString)
            acts
          } else Maintenance.run(spark, d, Maintenance.Policy()))
        }
      }
    indexes
  }

  private def optValue(args: Array[String], flag: String): Option[String] =
    args.indexOf(flag) match {
      case -1 => None
      case i =>
        require(i + 1 < args.length, s"$flag needs a value")
        Some(args(i + 1))
    }

  private def print(r: Report): Unit = {
    r.sources.foreach { s =>
      println(s"[cli] source ${s.source}: ${s.status}" +
        (if (s.tables.isEmpty) ""
         else s.tables.toSeq.sorted
           .map { case (t, n) => s"$t=$n" }.mkString(" (", ", ", ")")))
    }
    val failed = r.quality.filterNot(_.passed)
    val skipNote =
      if (r.modelsSkipped.isEmpty) ""
      else s" (${r.modelsSkipped.size} unchanged, served from cache)"
    val lintNote = r.lint match {
      case Some(l) if !l.ok =>
        s", daglint RED (${l.unaccepted.size} unaccepted, " +
          s"${l.stale.size} stale, ${l.staleExposures.size} stale-exposure)"
      case Some(l) =>
        s", daglint ok (${l.violations.size} accepted)"
      case None => ""
    }
    println(s"[cli] ${r.mode}: ${r.models} models materialized$skipNote, " +
      s"${r.quality.size} quality checks " +
      s"(${failed.size} failed), snapshot manifest seq ${r.manifestSeq}" +
      s"$lintNote → ${r.overallStatus}")
  }

  /** One full pipeline pass. Testable entry: everything `main` does
    * minus session/arg handling. `sourceFilter` mirrors the reference's
    * `--source` flag (orchestrator.py main): only the named source's
    * pipeline runs; others report `filtered` and the transform reads
    * their previously committed raw tables. */
  def run(spark: SparkSession, mode: String, dataDir: String,
          warehouseDir: String,
          sourceFilter: Option[String] = None): Report = {
    require(mode == "seed" || mode == "incremental", s"bad mode $mode")
    // ---- 0. crash recovery + skip-unchanged catalog ----
    // Repair any transaction a previous run crashed mid-publish BEFORE
    // anything commits: recover() must run before new commits or a new
    // version could collide with a crashed transaction's staged dir
    // (TxnCommit reserves journaled versions as the second guard). The
    // reference's orchestrator runs its state checks every cycle
    // (orchestrator.py:506-573); this is the lakehouse equivalent.
    val (txnFwd, txnBack) = graft.operators.TxnCommit.recover(
      spark, s"$warehouseDir/_txn")
    txnFwd.foreach(id => System.err.println(
      s"[cli] txn recovery: rolled FORWARD crashed transaction $id"))
    txnBack.foreach(id => System.err.println(
      s"[cli] txn recovery: rolled BACK incomplete transaction $id"))
    // skipUnchanged: models whose build plan + committed inputs are
    // byte-identical to their latest committed version are SERVED, not
    // rebuilt (ResultCache plan+input fingerprints — dbt's "skip
    // unchanged model", orchestrator.py:86-141 via mtimes).
    val cat = new Catalog(spark, warehouseDir, skipUnchanged = true)
    val store = new Ingest.StateStore(
      s"$warehouseDir/_state/processed_files.json")
    // Operator-error guard, NOT a source failure — checked before any
    // source runs so it fails fast instead of being isolated below.
    if (mode == "incremental")
      require(cat.exists("raw", "xlsx_customer"),
        "incremental mode needs a seeded raw layer — run --seed first")

    // ---- 1. sources, priority order (config/sources.yml semantics).
    //      A source failure is ISOLATED (status 'failed', overall
    //      partial_failure) and the remaining sources + transform still
    //      run — orchestrator.py:561-566 ("failed, continuing with
    //      remaining sources"). The raw layer stays consistent because
    //      every landed table is an already-committed AtomicTable
    //      version. The unseeded-incremental precondition is NOT
    //      swallowed: that is an operator error, not a source error. ----
    def ifSelected(name: String)(body: => SourceRun): SourceRun =
      if (!sourceFilter.forall(_ == name))
        SourceRun(name, "filtered", Nil, Map.empty)
      else
        try body
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[cli] source $name failed: $e")
            SourceRun(name, "failed", Nil, Map.empty)
        }
    val qb = ifSelected("quickbooks")(
      runQuickbooks(spark, cat, store, mode, dataDir))
    val ts = ifSelected("trade_shows")(
      runTradeShows(spark, cat, store, dataDir))
    val sources = Seq(qb, ts)

    // ---- 2. transform DAG (dbt run_after_sources) ----
    require(cat.exists("raw", "xlsx_customer"),
      s"no raw layer under $warehouseDir — run --seed first")
    val raw = ModelDag.RawInputs(
      customers = cat.load("raw", "xlsx_customer"),
      items = cat.load("raw", "xlsx_item"),
      invoices = cat.load("raw", "xlsx_invoice"),
      salesReceipts = cat.load("raw", "xlsx_sales_receipt"),
      tradeShowLeads =
        if (cat.exists("raw", "trade_show_leads"))
          Some(cat.load("raw", "trade_show_leads"))
        else None,
      enrichmentJsonlPath = Some(s"$dataDir/seed/company_enrichment.jsonl")
        .filter(p => Files.exists(Paths.get(p))),
      individualDomains = domainsConfig(dataDir),
      explicitNameMappings = mappingsConfig(dataDir))
    val out = ModelDag.run(cat, raw)

    // ---- 3. quality checks, non-fatal (orchestrator.py:466-504).
    //      Drift checks compare the two most recent committed versions,
    //      so a seed run passes vacuously and every incremental run gets
    //      a real "did the refresh halve the table" alarm. ----
    val quality = Checks.runAll(qualityBattery(out) ++
      Seq("fct_orders", "fct_companies").flatMap(t => Seq(
        Checks.snapshotDrift(spark, s"${cat.root}/mart/$t", t,
          maxRelDrift = 0.5),
        // column-level contract alarm — row-count drift can't see a
        // dropped/retyped column (metadata-only, no data scan)
        Checks.schemaDrift(spark, s"${cat.root}/mart/$t", t))))
    // ---- 4. cross-table snapshot publication: ONE manifest pinning
    //      every table this run committed or served, so a warehouse
    //      reader spanning several marts resolves all of them at a
    //      single commit point (SnapshotManifest.snapshot) — the
    //      cross-model half of the reference's per-statement MVCC
    //      consistency. A reader opened mid-run stays on the previous
    //      manifest (all-old) until this publish lands (r13 VERDICT #2). ----
    val manifestSeq = graft.operators.SnapshotManifest.publish(spark,
      s"$warehouseDir/_snapshots",
      cat.commits.toSeq.sortBy(_._1).map { case (d, v) =>
        graft.operators.TxnCommit.Staged(d, v) })

    // ---- 5. DAG structure lint over the lineage this run observed —
    //      the slot where the reference runs dbt_project_evaluator
    //      (packages.yml:4-5). Non-fatal here; `main --strict` turns an
    //      unaccepted violation into a non-zero exit (r13 VERDICT #3). ----
    val lint = graft.tools.DagLint.check(cat.lineage)
    lint.unaccepted.foreach(v =>
      System.err.println(s"[cli] daglint violation: $v"))
    lint.stale.foreach { case (k, m) =>
      System.err.println(s"[cli] daglint stale accept: $k $m") }
    lint.staleExposures.foreach(m =>
      System.err.println(s"[cli] daglint stale exposure (now consumed): $m"))

    val overall =
      if (sources.exists(_.status == "failed")) "partial_failure"
      else if (quality.exists(!_.passed)) "quality_issues"
      else "success"
    Report(mode, sources, out.size, quality, overall,
      modelsSkipped = cat.skipped, txnRecovered = txnFwd,
      txnRolledBack = txnBack, manifestSeq = manifestSeq,
      lint = Some(lint))
  }

  /** QuickBooks XLSX source: discover per mode, mtime skip, land each
    * sheet into its raw table — replace on the first seed batch, DLT
    * merge afterwards. */
  private def runQuickbooks(spark: SparkSession, cat: Catalog,
                            store: Ingest.StateStore, mode: String,
                            dataDir: String): SourceRun = {
    val dir = if (mode == "seed") s"$dataDir/seed" else s"$dataDir/input"
    val files = Ingest.discover(dir)
    val jsonl = Seq(s"$dataDir/seed/company_enrichment.jsonl")
      .filter(p => Files.exists(Paths.get(p)))
    if (files.isEmpty)
      return SourceRun("quickbooks", "no_files", Nil, Map.empty)
    val watched = files.map(_.path) ++ (if (mode == "seed") jsonl else Nil)
    if (!store.changed(watched))
      return SourceRun("quickbooks", "skipped", watched, Map.empty)

    val replaced = mutable.Set[String]()
    val counts = mutable.Map[String, Long]()
    files.foreach { f => // chronological (discover sorts by date)
      graft.sources.Xlsx.readAll(spark, f.path).foreach {
        case (sheet, df) =>
          sheetTables.get(sheet).foreach { case (table, renames) =>
            val std = renames.foldLeft(Fns.standardizeColumns(df)) {
              case (d, (from, to)) => d.withColumnRenamed(from, to)
            }
            val stamped = Ingest.withLoadMetadata(std, f.date,
              isSeed = mode == "seed", sourceFile = f.path)
            // First seed batch per table replaces (a re-seed is a full
            // reload); later batches and all incrementals DLT-merge.
            val firstSeedBatch = mode == "seed" && replaced.add(table)
            val landed =
              if (!firstSeedBatch && cat.exists("raw", table))
                MergeUpsert.upsert(cat.load("raw", table), stamped,
                  mergeKeys(table))
              else stamped
            counts(table) = cat.saveTable("raw", table, landed).count()
          }
      }
    }
    store.markProcessed(watched)
    SourceRun("quickbooks", "loaded", watched, counts.toMap)
  }

  /** Trade-show source: each workbook is a cumulative export, so a
    * changed file set replaces the raw table (staging dedups per email;
    * pipelines/trade_shows/pipeline.py). */
  private def runTradeShows(spark: SparkSession, cat: Catalog,
                            store: Ingest.StateStore,
                            dataDir: String): SourceRun = {
    val dir = Paths.get(s"$dataDir/trade_shows")
    val files =
      if (!Files.isDirectory(dir)) Nil
      else {
        import scala.jdk.CollectionConverters._
        Files.list(dir).iterator().asScala
          .map(_.toString).filter(_.endsWith(".xlsx")).toSeq.sorted
      }
    if (files.isEmpty)
      return SourceRun("trade_shows", "no_files", Nil, Map.empty)
    if (!store.changed(files))
      return SourceRun("trade_shows", "skipped", files, Map.empty)
    val frames = files.flatMap(p =>
      graft.sources.Xlsx.readAll(spark, p).get("Leads")
        .map(df => Fns.standardizeColumns(df)))
    val unioned = frames.reduce(_.unionByName(_, allowMissingColumns = true))
    val n = cat.saveTable("raw", "trade_show_leads", unioned).count()
    store.markProcessed(files)
    SourceRun("trade_shows", "loaded", files,
      Map("trade_show_leads" -> n))
  }

  /** `individual_email_domains.txt`: one domain per line, '#' comments
    * (domain_consolidation.py:21-54). Falls back to the RawInputs
    * defaults when absent. */
  private def domainsConfig(dataDir: String): Seq[String] = {
    val p = Paths.get(s"$dataDir/config/individual_email_domains.txt")
    if (!Files.exists(p)) ModelDag.RawInputs(null, null, null, null)
      .individualDomains
    else configLines(p)
  }

  /** `customer_name_mappings.txt`: `original -> normalized` lines
    * (domain_consolidation.py:134-168). */
  private def mappingsConfig(dataDir: String): Map[String, String] = {
    val p = Paths.get(s"$dataDir/config/customer_name_mappings.txt")
    if (!Files.exists(p)) Map.empty
    else configLines(p).flatMap { l =>
      l.split("->") match {
        case Array(a, b) => Some(a.trim -> b.trim)
        case _ => None
      }
    }.toMap
  }

  private def configLines(p: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala.toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  /** The reference's post-run test battery over whatever the DAG
    * produced (mart schema tests, SURVEY §5.1) — non-fatal, violations
    * reported in the [[Report]]. */
  private def qualityBattery(
      out: Map[String, DataFrame]): Seq[Checks.Result] = {
    def on(name: String)(
        checks: DataFrame => Seq[Checks.Result]): Seq[Checks.Result] =
      out.get(name).map(checks).getOrElse(Nil)
    // fct_orders' four tests and fct_companies' two run as ONE
    // aggregate job per table (Checks.singlePass, r21) — names and
    // violation counts identical to the individual checks
    on("mart.fct_orders") { o =>
      Checks.singlePass(o, "fct_orders",
        uniqueCols = Seq("order_number"),
        notNullCols = Seq("order_number"),
        accepted = Seq(
          "sales_channel" -> Seq("Amazon", "Website", "Invoice", "Other"),
          "customer_segment" -> Seq("OEM", "Distributor", "Export",
            "Direct"))).results
    } ++ on("mart.fct_products")(p =>
      Seq(Checks.unique(p, "fct_products", "product_name"))) ++
      on("mart.fct_company_orders")(c =>
        Seq(Checks.uniqueCombination(c, "fct_company_orders",
          Seq("company_domain_key", "order_number")))) ++
      on("mart.fct_companies")(c =>
        Checks.singlePass(c, "fct_companies",
          uniqueCols = Seq("company_domain_key"),
          checkNonEmpty = true).results) ++
      on("mart.dim_company_health")(h =>
        Seq(Checks.unique(h, "dim_company_health",
          "company_domain_key"))) ++
      on("mart.fct_inventory_history")(i =>
        Seq(Checks.uniqueCombination(i, "fct_inventory_history",
          Seq("item_name", "inventory_date")))) ++
      on("mart.fct_trade_show_leads")(l =>
        Seq(Checks.notNull(l, "fct_trade_show_leads", "lead_id")))
  }
}
