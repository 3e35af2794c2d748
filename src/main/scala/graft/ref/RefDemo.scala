package graft.ref

import graft.Sessions

/** End-to-end drive of the reference pipeline: fixtures → consolidation →
  * staging → intermediate → marts, materialized under a temp warehouse.
  * Prints each mart's row count and the flagship orders-by-channel view.
  */
object RefDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse")
    val cat = new Catalog(spark, wh.toString)
    if (args.contains("--with-shopify")) {
      // Pre-seed the optional Shopify intermediate so the existence
      // guard (fct_orders.sql:24-55) takes the join branch.
      import spark.implicits._
      cat.saveTable("intermediate", "shopify_orders_enriched",
        Seq(("S-2001", "FULFILLED", "1Z999")).toDF(
          "order_number", "fulfillment_status", "tracking_number"))
    }
    val baseInputs = RefFixtures.inputs(spark)
    // --minimal drops the optional sources: exercises the absent-source
    // branches (guarded fct_orders join, no trade-show models).
    val inputs = if (args.contains("--minimal"))
      baseInputs.copy(shopifyOrders = None, shopifyFulfillments = None,
        tradeShowLeads = None, enrichmentJsonlPath = None)
    else baseInputs
    val out = ModelDag.run(cat, inputs)
    out.toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(f"[ref] $name%-45s ${df.count()}%5d rows")
    }
    println("[ref] orders by sales_channel:")
    out("intermediate.orders")
      .groupBy("sales_channel")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("order_amount").as("amount"))
      .orderBy("sales_channel")
      .show(20, truncate = false)
    println(s"[ref] warehouse at $wh")
    spark.stop()
  }
}
