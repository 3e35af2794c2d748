package graft

/** Every registered query must run end-to-end on sf0.001 and return a
  * schema with at least one row-producing plan (rows >= 0; flagship-style
  * queries must be non-empty). The DuckDB hash-match runs driver-side;
  * this spec catches regressions (analysis errors, ANSI failures,
  * missing columns) before they reach the gate.
  */
class QueriesSmokeSpec extends SparkSpec {

  private val mustBeNonEmpty = Set(
    "q1_pricing_summary", "a1_order_rollup", "a2_customer_revenue",
    "w1_dedup_top1", "j1_broadcast_dim_join", "t_text_tokens",
    "dd_exact_dedup", "ann_cosine_topk", "mm_binary_plumbing",
    "mm_decode_features")

  SparkEntry.registry.foreach { q =>
    test(s"query ${q.name} runs on sf0.001") {
      val n = q.build(spark, sf).count()
      assert(n >= 0)
      if (mustBeNonEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("every SQL-checked query has matching column aliases declared") {
    // Oracle exists => name must be in queries too (driver contract).
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
