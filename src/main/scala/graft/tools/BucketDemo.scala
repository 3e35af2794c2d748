package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Demonstrates bucketed storage for shuffle-free fact-fact joins —
  * the 100 TB answer for the orders ⋈ lineitem spine (builder guidance:
  * "co-locate joins via bucketing"). Writes both tables bucketed by the
  * join key, joins them, and prints whether the join needed an
  * Exchange. On a cluster the same layout makes every
  * orderkey-equi-join in the pipeline shuffle-free.
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wh = java.nio.file.Files.createTempDirectory("bucket_wh")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Tables.orders(spark, d).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, d).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    println(s"[bucket] joined rows=${joined.count()} " +
      s"exchanges_in_join_plan=$exchanges")

    // Same join over plain parquet for contrast:
    val plain = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
    plain.collect()
    val plainEx = plain.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    println(s"[bucket] plain-parquet join exchanges=$plainEx")
    assert(exchanges < plainEx,
      "bucketed join should need fewer exchanges")
    println("[bucket] OK — bucketed join is shuffle-free on the join key")

    // ---- PARTITION PRUNING under ATOMIC COMMITS: the other half of
    // the 100 TB storage layout. Facts written hive-partitioned by
    // month through the versioned commit protocol; the reader resolves
    // ONE committed snapshot (never the union of version dirs), and a
    // month filter must show up as PartitionFilters (directories
    // skipped at planning time), NOT as a data filter over a full scan.
    val cat = new graft.ref.Catalog(spark, wh.toString)
    val byMonth = Tables.orders(spark, d)
      .withColumn("order_month",
        date_format(col("o_orderdate"), "yyyy-MM"))
    cat.saveTablePartitioned("demo", "orders_by_month", byMonth,
      Seq("order_month"))
    // Second commit = the nightly rebuild. Two version dirs now exist
    // on disk; a naive read of the table ROOT would double-count.
    cat.saveTablePartitioned("demo", "orders_by_month", byMonth,
      Seq("order_month"))
    val expected = byMonth.filter(col("order_month") === "1995-03").count()
    val pruned = cat.load("demo", "orders_by_month")
      .filter(col("order_month") === "1995-03")
    pruned.collect()
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    val pf = prunedPlan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    val pfAt = pf.indexOf("PartitionFilters")
    println(s"[partition] snippet: " +
      (if (pfAt >= 0) pf.substring(pfAt).take(140) else "<absent>"))
    println(s"[partition] rows=${pruned.count()} (expected $expected) " +
      s"partition_filter_present=${pf.contains("order_month")}")
    assert(pruned.count() == expected,
      "catalog read must resolve exactly one committed snapshot")
    assert(pf.contains("order_month"),
      "month filter must prune partitions, not scan-and-filter")
    println("[partition] OK — committed-version read prunes directories " +
      "at plan time")
    spark.stop()
  }
}
