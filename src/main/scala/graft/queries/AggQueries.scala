package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Det._

/** Aggregation operators from SURVEY §2.4, exercised on the testdata star
  * schema. Query names carry the §2 operator id they cover.
  *
  * Scale notes apply to every query here: single groupBy = one shuffle with
  * map-side partial aggregation; no driver-side collection; all expressions
  * codegen'd (`functions._` only). At 100 TB the same plans hold — the agg
  * keys (returnflag/custkey/orderkey) are either low-cardinality (perfect
  * partial-agg reduction) or uniformly distributed (no skew).
  */
object AggQueries {

  /** Flagship: TPC-H-Q1-shaped pricing summary — exercises A1-style
    * grouped rollup with derived measures, deterministic decimal sums. */
  val q1PricingSummary: Q = Q.sql(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST((l_extendedprice) AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A1 — order-level rollup: GROUP BY order with MAX of order attrs,
    * BOOL_OR flags, SUM of line amounts, COUNT(*)
    * (int_quickbooks__orders.sql:14-83). */
  val a1OrderRollup: Q = Q.sql(
    "a1_order_rollup",
    """SELECT l_orderkey,
      |  CAST(MAX(CAST(l_shipdate AS DATE)) AS VARCHAR) AS last_ship_date,
      |  BOOL_OR(l_returnflag = 'R') AS any_returned,
      |  CAST(SUM(CAST((l_extendedprice) AS DECIMAL(38,6))) AS DOUBLE) AS order_amount,
      |  CAST(SUM(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
      |  COUNT(*) AS line_count
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        max(col("l_shipdate").cast("date")).cast("string")
          .as("last_ship_date"),
        bool_or(col("l_returnflag") === "R").as("any_returned"),
        dsum(col("l_extendedprice")).as("order_amount"),
        dsum(col("l_quantity")).as("total_qty"),
        count(lit(1)).as("line_count"))
      .orderBy("l_orderkey")
  }

  /** A2 — customer lifetime revenue: SUM, COUNT DISTINCT, MIN/MAX dates,
    * COUNT DISTINCT date (int_quickbooks__customer_revenue.sql:11-24). */
  val a2CustomerRevenue: Q = Q.sql(
    "a2_customer_revenue",
    """SELECT o_custkey,
      |  CAST(SUM(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
      |  COUNT(DISTINCT o_orderkey) AS order_count,
      |  COUNT(*) AS row_count,
      |  CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_order_date,
      |  CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_order_date,
      |  COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS active_days
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        dsum(col("o_totalprice")).as("total_revenue"),
        countDistinct(col("o_orderkey")).as("order_count"),
        count(lit(1)).as("row_count"),
        min(col("o_orderdate").cast("date")).cast("string")
          .as("first_order_date"),
        max(col("o_orderdate").cast("date")).cast("string")
          .as("last_order_date"),
        countDistinct(col("o_orderdate").cast("date")).as("active_days"))
      .orderBy("o_custkey")
  }

  /** A3 — STRING_AGG(DISTINCT x, sep) with deterministic value ordering:
    * sort_array(collect_set) (int_quickbooks__company_consolidation.sql:95-119). */
  val a3StringAgg: Q = Q.sql(
    "a3_string_agg_distinct",
    """SELECT c_nationkey,
      |  COUNT(*) AS customer_count,
      |  CAST(SUM(CAST((c_acctbal) AS DECIMAL(38,6))) AS DOUBLE) AS total_balance,
      |  STRING_AGG(DISTINCT c_mktsegment, ' | ' ORDER BY c_mktsegment) AS all_segments
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("customer_count"),
        dsum(col("c_acctbal")).as("total_balance"),
        array_join(sort_array(collect_set(col("c_mktsegment"))), " | ")
          .as("all_segments"))
      .orderBy("c_nationkey")
  }

  /** A4 — MODE() WITHIN GROUP with deterministic tie-break (highest count,
    * then lowest value — SURVEY §2.4 A4 note): max_by over a pre-count.
    * Two-level aggregation keeps it fully distributed (no single-partition
    * sort): first shuffle on (nation, segment), second on nation. */
  val a4Mode: Q = Q.sql(
    "a4_mode_deterministic",
    """SELECT c_nationkey, mode_segment FROM (
      |  SELECT c_nationkey, c_mktsegment AS mode_segment,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
      |  FROM customer GROUP BY c_nationkey, c_mktsegment
      |) WHERE rn = 1 ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val counts = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("count").desc, col("c_mktsegment"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_nationkey"), col("c_mktsegment").as("mode_segment"))
      .orderBy("c_nationkey")
  }

  /** A7/J12 — trailing-window conditional aggregation relative to a fixed
    * as-of date (mart_company_period_metrics.sql:34-135; decorrelated
    * J12 rewrite per SURVEY §2.3). One scan, one shuffle — the UNION-ALL-
    * of-subqueries form in the reference would scan 5×. */
  val a7PeriodMetrics: Q = Q.sql(
    "a7_period_conditional_agg",
    """SELECT o_custkey,
      |  CAST(SUM(CAST((CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1998-05-15' THEN o_totalprice ELSE 0 END) AS DECIMAL(38,6))) AS DOUBLE) AS revenue_90d,
      |  CAST(SUM(CAST((CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1997-08-13' THEN o_totalprice ELSE 0 END) AS DECIMAL(38,6))) AS DOUBLE) AS revenue_1y,
      |  CAST(SUM(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE) AS revenue_all_time,
      |  CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1998-05-15' THEN 1 ELSE 0 END) AS BIGINT) AS orders_90d,
      |  COUNT(*) AS orders_all_time
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    // asOfDate injected (SURVEY §7.4 #5): 1998-08-11, TPC-H style.
    val od = col("o_orderdate").cast("date")
    val d90 = to_date(lit("1998-05-15"))
    val d1y = to_date(lit("1997-08-13"))
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        dsum(when(od >= d90, col("o_totalprice")).otherwise(0)).as("revenue_90d"),
        dsum(when(od >= d1y, col("o_totalprice")).otherwise(0)).as("revenue_1y"),
        dsum(col("o_totalprice")).as("revenue_all_time"),
        sum(when(od >= d90, 1).otherwise(0)).as("orders_90d"),
        count(lit(1)).as("orders_all_time"))
      .orderBy("o_custkey")
  }

  /** A12 — multi-grain DATE_TRUNC rollup (mart_product_unit_sales.sql:33-78). */
  val a12MultiGrain: Q = Q.sql(
    "a12_multigrain_rollup",
    """SELECT l_partkey,
      |  CAST(CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS VARCHAR) AS ship_month,
      |  CAST(CAST(DATE_TRUNC('quarter', l_shipdate) AS DATE) AS VARCHAR) AS ship_quarter,
      |  CAST(CAST(DATE_TRUNC('year', l_shipdate) AS DATE) AS VARCHAR) AS ship_year,
      |  CAST(SUM(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE) AS units,
      |  CAST(SUM(CAST((l_extendedprice) AS DECIMAL(38,6))) AS DOUBLE) AS amount,
      |  COUNT(DISTINCT l_orderkey) AS order_count
      |FROM lineitem
      |GROUP BY 1, 2, 3, 4
      |ORDER BY l_partkey, ship_month""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(
        col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").cast("string")
          .as("ship_month"),
        date_trunc("quarter", col("l_shipdate")).cast("date").cast("string")
          .as("ship_quarter"),
        date_trunc("year", col("l_shipdate")).cast("date").cast("string")
          .as("ship_year"))
      .agg(
        dsum(col("l_quantity")).as("units"),
        dsum(col("l_extendedprice")).as("amount"),
        countDistinct(col("l_orderkey")).as("order_count"))
      .orderBy("l_partkey", "ship_month")
  }

  /** A13 — volume-weighted metrics at two grains UNION ALLed with a
    * time_period tag (mart_product_margin_analytics.sql:66-238). */
  val a13MarginGrains: Q = Q.sql(
    "a13_margin_two_grain",
    """WITH daily AS (
      |  SELECT 'daily' AS time_period, l_partkey,
      |    CAST(CAST(DATE_TRUNC('day', l_shipdate) AS DATE) AS VARCHAR) AS period_start,
      |    CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |    CAST(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS discount_amount,
      |    COUNT(*) AS line_count
      |  FROM lineitem GROUP BY 1, 2, 3
      |), monthly AS (
      |  SELECT 'monthly' AS time_period, l_partkey,
      |    CAST(CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS VARCHAR) AS period_start,
      |    CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |    CAST(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS discount_amount,
      |    COUNT(*) AS line_count
      |  FROM lineitem GROUP BY 1, 2, 3
      |)
      |SELECT * FROM daily UNION ALL SELECT * FROM monthly
      |ORDER BY time_period, l_partkey, period_start""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def grain(g: String, tag: String) = li
      .groupBy(
        col("l_partkey"),
        date_trunc(g, col("l_shipdate")).cast("date").cast("string")
          .as("period_start"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        dsum(col("l_extendedprice") * col("l_discount")).as("discount_amount"),
        count(lit(1)).as("line_count"))
      .withColumn("time_period", lit(tag))
    grain("day", "daily").unionByName(grain("month", "monthly"))
      .select("time_period", "l_partkey", "period_start", "revenue",
        "discount_amount", "line_count")
      .orderBy("time_period", "l_partkey", "period_start")
  }

  /** A18 — data-quality aggregates: row count, completeness ratio,
    * duplicate-key detection (pipelines/shared/data_quality.py:17-216). */
  val a18Quality: Q = Q.sql(
    "a18_quality_checks",
    """SELECT 'orders' AS table_name,
      |  COUNT(*) AS row_count,
      |  CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) AS custkey_completeness,
      |  (SELECT COUNT(*) FROM (
      |     SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
      |  )) AS duplicate_key_count,
      |  CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS freshness_max_date
      |FROM orders""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val dupes = o.groupBy("o_orderkey").count()
      .filter(col("count") > 1)
      .agg(count(lit(1)).as("duplicate_key_count"))
    o.agg(
      count(lit(1)).as("row_count"),
      (count(col("o_custkey")).cast("double") / count(lit(1)))
        .as("custkey_completeness"),
      max(col("o_orderdate").cast("date")).cast("string")
        .as("freshness_max_date"))
      .crossJoin(dupes) // 1-row × 1-row
      .select(lit("orders").as("table_name"), col("row_count"),
        col("custkey_completeness"), col("duplicate_key_count"),
        col("freshness_max_date"))
  }

  val all: Seq[Q] = Seq(q1PricingSummary, a1OrderRollup, a2CustomerRevenue,
    a3StringAgg, a4Mode, a7PeriodMetrics, a12MultiGrain, a13MarginGrains,
    a18Quality)
}
