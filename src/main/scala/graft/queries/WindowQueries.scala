package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Det._

/** Window operators from SURVEY §2.5 (W1–W9) on the testdata tables.
  *
  * Scale notes: every window here is PARTITIONed on a high-cardinality key
  * (partkey/suppkey/custkey) so the sort is distributed — one shuffle on
  * the partition key, per-partition sort, no global single-partition window
  * except w6 (percent_rank), which is intentionally demonstrated on a
  * pre-aggregated (small) frame, the same mitigation SURVEY flags for
  * 100 TB use.
  */
object WindowQueries {

  /** W1 — dedup top-1 per key: the single most common operator in the
    * reference (int_quickbooks__items_enriched.sql:13-27 et al.). Latest
    * lineitem per part, fully-ordered tie-break. */
  val w1DedupTop1: Q = Q.sql(
    "w1_dedup_top1",
    """SELECT l_partkey, l_orderkey, l_linenumber,
      |       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date
      |FROM (
      |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
      |    ROW_NUMBER() OVER (PARTITION BY l_partkey
      |      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      |  FROM lineitem
      |) WHERE rn = 1
      |ORDER BY l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
        col("l_linenumber").desc)
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").cast("string").as("ship_date"))
      .orderBy("l_partkey")
  }

  /** W2 — representative selection: FIRST_VALUE over a fully-ordered
    * window, several columns at once
    * (int_quickbooks__company_consolidation.sql:26-91). */
  val w2FirstValue: Q = Q.sql(
    "w2_representative_select",
    """SELECT DISTINCT c_nationkey,
      |  FIRST_VALUE(c_name) OVER w AS rep_name,
      |  FIRST_VALUE(c_custkey) OVER w AS rep_custkey,
      |  FIRST_VALUE(c_acctbal) OVER w AS rep_acctbal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal DESC NULLS LAST, c_custkey)
      |ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rep_name", first(col("c_name")).over(w))
      .withColumn("rep_custkey", first(col("c_custkey")).over(w))
      .withColumn("rep_acctbal", first(col("c_acctbal")).over(w))
      .select("c_nationkey", "rep_name", "rep_custkey", "rep_acctbal")
      .distinct()
      .orderBy("c_nationkey")
  }

  /** W3 — LAG-based trend/growth incl. LAG(x,4) YoY
    * (fct_company_orders_time_series.sql:56-81). Quarterly revenue per
    * customer with QoQ and YoY deltas. */
  val w3LagTrend: Q = Q.sql(
    "w3_lag_trend",
    """WITH q AS (
      |  SELECT o_custkey,
      |    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |    CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
      |    CAST(SUM(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1, 2, 3
      |)
      |SELECT o_custkey, yr, qtr, revenue,
      |  LAG(revenue) OVER w AS prev_q_revenue,
      |  LAG(revenue, 4) OVER w AS prev_year_revenue
      |FROM q
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY yr, qtr)
      |ORDER BY o_custkey, yr, qtr""".stripMargin) { (s, d) =>
    val q = Tables.orders(s, d)
      .groupBy(col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("yr"), col("qtr"))
    q.withColumn("prev_q_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("prev_year_revenue", lag(col("revenue"), 4).over(w))
      .orderBy("o_custkey", "yr", "qtr")
  }

  /** W4 — rolling 30-day RANGE frame
    * (fct_product_pricing_history.sql:113-139). Spark range frames need a
    * numeric ordering column → epoch days (SURVEY §7.4 #2). */
  val w4Rolling30d: Q = Q.sql(
    "w4_rolling_range_30d",
    """SELECT l_suppkey, CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date, l_orderkey,
      |  l_linenumber,
      |  COUNT(*) OVER w AS lines_30d,
      |  CAST(SUM(CAST((l_quantity) AS DECIMAL(38,6))) OVER w AS DOUBLE) AS qty_30d
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY CAST(l_shipdate AS DATE)
      |             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val epochDay = datediff(col("l_shipdate").cast("date"),
      to_date(lit("1970-01-01")))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(epochDay)
      .rangeBetween(-30, 0)
    Tables.lineitem(s, d)
      .withColumn("lines_30d", count(lit(1)).over(w))
      .withColumn("qty_30d",
        sum(col("l_quantity").cast("decimal(38,6)")).over(w).cast("double"))
      .select(col("l_suppkey"),
        col("l_shipdate").cast("date").cast("string").as("ship_date"),
        col("l_orderkey"), col("l_linenumber"), col("lines_30d"),
        col("qty_30d"))
      .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber")
  }

  /** W10 — SLIDING COUNT DISTINCT (trailing-30-day active customers
    * per day): the rolling metric a plain window frame CANNOT express
    * (COUNT(DISTINCT) OVER a moving frame is unsupported in Spark and
    * most engines). Scalable rewrite: each DISTINCT (customer, day)
    * pair is exploded to the ≤30 report-days it contributes to —
    * bounded 30× expansion of the DEDUPLICATED pairs, never of raw
    * facts — then one (day)-keyed distinct-count aggregate. The DuckDB
    * twin states the semantics directly as a day×orders range join, so
    * the gate proves the explode rewrite IS sliding count-distinct.
    * Report days restricted to days with ≥1 order (both engines). */
  val w10SlidingDistinct: Q = Q.sql(
    "w10_sliding_distinct",
    """WITH days AS (
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders
      |)
      |SELECT CAST(d.day AS VARCHAR) AS day,
      |  CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
      |    AS active_customers_30d
      |FROM days d JOIN orders o
      |  ON CAST(o.o_orderdate AS DATE) > d.day - 30
      | AND CAST(o.o_orderdate AS DATE) <= d.day
      |GROUP BY d.day
      |ORDER BY d.day""".stripMargin) { (s, d) =>
    val pairs = Tables.orders(s, d)
      .select(col("o_custkey"),
        col("o_orderdate").cast("date").as("order_day"))
      .distinct()
    val days = pairs.select(col("order_day").as("day")).distinct()
    // each (customer, order_day) contributes to report days
    // [order_day, order_day+29]; keep only days that exist
    val contrib = pairs
      .withColumn("day",
        explode(expr("sequence(order_day, date_add(order_day, 29))")))
      .join(days, Seq("day"), "left_semi")
    contrib.groupBy(col("day"))
      .agg(count_distinct(col("o_custkey")).cast("long")
        .as("active_customers_30d"))
      .select(col("day").cast("string").as("day"),
        col("active_customers_30d"))
      .orderBy("day")
  }

  /** W11 — SLIDING DISTINCT via MERGEABLE SKETCH (trailing-7-day
    * active users per day, HLL m=32): the state-bounded rewrite of
    * w10's exact sliding count-distinct. w10 explodes the DISTINCT
    * (key, day) pairs — linear in distinct pairs, which at 100 TB of
    * high-cardinality keys is itself the bottleneck; here each day is
    * first reduced to ≤m=32 integer registers and only REGISTERS are
    * exploded to the ≤7 report days they contribute to (7·m rows per
    * day, independent of cardinality), then per-register MAX re-merges
    * each window — the [[LlmQueries.tHllMerge]] algebra applied across
    * window frames. The exact count rides alongside so the error is
    * visible in the gated output (m=32 is sized so the test SFs sit in
    * the raw-estimator regime, n > 2.5m; production would use 2^14 —
    * measured per-window error here is within ±10% at both SFs,
    * inside the 1.04/√m ≈ 18% 1σ band).
    * Same portable integer register state as t_hll_distinct; the twin
    * states the window as a day range join, proving the
    * explode-registers rewrite IS the sliding sketch. */
  val w11SlidingHll: Q = {
    import graft.llm.{Sketches, TextAnalysis => TA}
    val m = 32
    val bits = Sketches.hllValueBits(m) // 19
    val maxRho = bits + 1
    val numer = Sketches.hllNumerator(m)
    Q.sql(
      "w11_sliding_hll_distinct",
      s"""WITH e AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), days AS (
        |  SELECT DISTINCT day FROM e
        |), h AS (
        |  SELECT day,
        |    ${TA.hex6Expr("md5('wk|' || CAST(user_id AS VARCHAR))")} AS hv
        |  FROM e
        |), regs AS (
        |  SELECT day, hv % $m AS reg,
        |    MAX(${Sketches.rhoSql(s"(hv // $m)", bits)}) AS max_rho
        |  FROM h GROUP BY 1, 2
        |), merged AS (
        |  SELECT d.day, r.reg, MAX(r.max_rho) AS max_rho
        |  FROM days d JOIN regs r
        |    ON r.day > d.day - 7 AND r.day <= d.day
        |  GROUP BY 1, 2
        |), est AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_registers,
        |    CAST(SUM(CAST(1 AS BIGINT) << ($maxRho - max_rho))
        |      AS BIGINT) AS s_present
        |  FROM merged GROUP BY 1
        |), ex AS (
        |  SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
        |    AS n_exact
        |  FROM days d JOIN e ON e.day > d.day - 7 AND e.day <= d.day
        |  GROUP BY 1
        |)
        |SELECT CAST(est.day AS VARCHAR) AS day, ex.n_exact, n_registers,
        |  CAST(s_present + ($m - n_registers) * ${1L << maxRho}
        |    AS BIGINT) AS sum_scaled,
        |  CAST(ROUND($numer /
        |    CAST(s_present + ($m - n_registers) * ${1L << maxRho}
        |      AS DOUBLE)) AS BIGINT) AS estimate
        |FROM est JOIN ex ON ex.day = est.day
        |ORDER BY day""".stripMargin) { (s, d) =>
      val pairs = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("user_id"))
        .distinct()
      val days = pairs.select("day").distinct()
      val regsDay = pairs
        .select(col("day"),
          md5(concat(lit("wk|"), col("user_id").cast("string"))).as("hhex"))
        .select(col("day"), expr(TA.hex6Expr("hhex")).as("hv"))
        .select(col("day"), expr(s"cast(hv % $m as bigint)").as("reg"),
          expr(s"hv div $m").as("wv"))
        .select(col("day"), col("reg"),
          expr(Sketches.rhoSql("wv", bits)).as("rho"))
        .groupBy("day", "reg").agg(max(col("rho")).cast("long").as("max_rho"))
      def toReportDays(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("rday", explode(expr("sequence(day, date_add(day, 6))")))
        .join(days.select(col("day").as("rday")), Seq("rday"), "left_semi")
      val sumScaled = col("s_present") +
        (lit(m.toLong) - col("n_registers")) * lit(1L << maxRho)
      val est = toReportDays(regsDay)
        .groupBy("rday", "reg").agg(max(col("max_rho")).as("max_rho"))
        .select(col("rday"),
          expr(s"shiftleft(1L, $maxRho - cast(max_rho as int))").as("term"))
        .groupBy("rday")
        .agg(count(lit(1)).cast("long").as("n_registers"),
          sum(col("term")).cast("long").as("s_present"))
        .select(col("rday"), col("n_registers"),
          sumScaled.as("sum_scaled"),
          round(lit(numer) / sumScaled.cast("double")).cast("long")
            .as("estimate"))
      val exact = toReportDays(pairs)
        .groupBy("rday")
        .agg(count_distinct(col("user_id")).cast("long").as("n_exact"))
      est.join(exact, Seq("rday"))
        .select(col("rday").cast("string").as("day"), col("n_exact"),
          col("n_registers"), col("sum_scaled"), col("estimate"))
        .orderBy("day")
    }
  }

  /** W5 — running max / unbounded-preceding frames
    * (fct_product_pricing_history.sql:190-196,165-171). */
  val w5RunningMax: Q = Q.sql(
    "w5_running_max",
    """SELECT l_partkey, l_orderkey, l_linenumber,
      |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
      |  MAX(l_extendedprice) OVER w AS running_max_price,
      |  FIRST_VALUE(l_extendedprice) OVER w AS first_price
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_partkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber
      |             ROWS UNBOUNDED PRECEDING)
      |ORDER BY l_partkey, ship_date, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .withColumn("running_max_price", max(col("l_extendedprice")).over(w))
      .withColumn("first_price", first(col("l_extendedprice")).over(w))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").cast("string").as("ship_date"),
        col("running_max_price"), col("first_price"))
      .orderBy("l_partkey", "ship_date", "l_orderkey", "l_linenumber")
  }

  /** W6 — PERCENT_RANK over a pre-aggregated frame
    * (dim_company_health.sql:60). The global window runs on ~#customers
    * rows post-aggregation, not raw rows — the SURVEY-noted 100 TB
    * mitigation. */
  val w6PercentRank: Q = Q.sql(
    "w6_percent_rank",
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o_custkey, total_revenue,
      |  PERCENT_RANK() OVER (ORDER BY total_revenue, o_custkey) AS revenue_percentile
      |FROM rev
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val rev = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_revenue"))
    val w = Window.orderBy(col("total_revenue"), col("o_custkey"))
    rev.withColumn("revenue_percentile", percent_rank().over(w))
      .orderBy("o_custkey")
  }

  /** W7 — partition counts: COUNT(*) OVER (PARTITION BY key)
    * (int_customer_person_mapping_fixed.sql:109). */
  val w7PartitionCount: Q = Q.sql(
    "w7_partition_count",
    """SELECT o_orderkey, o_custkey,
      |  COUNT(*) OVER (PARTITION BY o_custkey) AS customer_order_count
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(w).as("customer_order_count"))
      .orderBy("o_orderkey")
  }

  /** W8 — UNNEST WITH ORDINALITY → posexplode: split document text into
    * words with position (stg_quickbooks__customer_contacts.sql:20-36).
    * Ordinal is 1-based to match PG. */
  val w8Posexplode: Q = Q.sql(
    "w8_explode_ordinality",
    """SELECT doc_id, word, ord FROM (
      |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word,
      |         UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')))) AS ord
      |  FROM documents
      |) WHERE ord <= 5
      |ORDER BY doc_id, ord""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("col").as("word"),
        (col("pos") + 1).as("ord"))
      .filter(col("ord") <= 5)
      .orderBy("doc_id", "ord")
  }

  /** W9 — latest-transaction tag inside aggregation: max_by equivalent
    * (mart_product_company_period_spending.sql:37-41,72-73). */
  val w9LatestTag: Q = Q.sql(
    "w9_latest_transaction_tag",
    """WITH ranked AS (
      |  SELECT l_partkey, l_suppkey, l_extendedprice, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_partkey
      |      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      |  FROM lineitem
      |)
      |SELECT l_partkey,
      |  CAST(SUM(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
      |  MAX(CASE WHEN rn = 1 THEN l_suppkey END) AS latest_suppkey,
      |  MAX(CASE WHEN rn = 1 THEN l_extendedprice END) AS latest_price
      |FROM ranked
      |GROUP BY l_partkey
      |ORDER BY l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
        col("l_linenumber").desc)
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("l_partkey"))
      .agg(
        dsum(col("l_quantity")).as("total_qty"),
        max(when(col("rn") === 1, col("l_suppkey"))).as("latest_suppkey"),
        max(when(col("rn") === 1, col("l_extendedprice"))).as("latest_price"))
      .orderBy("l_partkey")
  }

  val all: Seq[Q] = Seq(w1DedupTop1, w2FirstValue, w3LagTrend, w4Rolling30d,
    w5RunningMax, w6PercentRank, w7PartitionCount, w8Posexplode, w9LatestTag,
    w10SlidingDistinct, w11SlidingHll)
}
