package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable bridge to Spark's OWN Bloom-filter expressions — the
  * pair Catalyst injects for runtime row-level join filtering
  * (`InjectRuntimeFilter`), exposed here so [[graft.llm.Dedup]] can
  * build the same build-small/probe-big shape EXPLICITLY where the
  * optimizer cannot infer it (the dedup anti-membership join probes a
  * committed index table, not a join the rewrite rule targets).
  *
  * Both are native codegen'd expressions (`BloomFilterMightContain`
  * has `doGenCode`; the aggregate is a `TypedImperativeAggregate` with
  * mergeable partials, so the build is distributed map-side like any
  * other partial aggregate). No UDFs, no driver-side bitset loops; the
  * bitset reaches executors through a scalar subquery — exactly the
  * plan Spark's own runtime filter produces.
  *
  * Not private API abuse: the expressions are stable public classes in
  * the catalyst package, just not registered in the default function
  * registry; registration mirrors [[QuantDot.register]].
  */
object Bloom {

  val aggName = "graft_bloom_agg"
  val containsName = "graft_bloom_contains"

  /** Registers `graft_bloom_agg(xxhash64_value, est_items, num_bits)`
    * and `graft_bloom_contains(bloom_binary, xxhash64_value)` (native
    * `might_contain` argument order) once per session. Values must
    * already be `xxhash64`-hashed longs — the aggregate's native input
    * type, and hashing at the call site keeps both sides of
    * build/probe trivially consistent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      aggName,
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      containsName,
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
