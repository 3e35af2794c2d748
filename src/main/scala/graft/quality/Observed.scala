package graft.quality

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** SCAN-FREE quality metrics via `Dataset.observe`: the job that
  * MATERIALIZES a model also yields its row count and per-column null
  * counts as accumulator-style observation metrics, so the basic
  * quality battery costs ZERO extra scans.
  *
  * Why it matters at 100 TB: `Checks.notNull`/`completeness` each run
  * one more aggregate over the materialized table — cheap at test SF,
  * a full re-read of a multi-TB mart in production. An `observe` node
  * rides INSIDE the write job's plan (a codegen'd stateless collect of
  * per-partition partial aggregates, merged on the driver), so the
  * metrics are a by-product of work already being done. This is the
  * DataFrame analogue of dbt's post-hook counts folded into the model
  * run itself.
  *
  * Contract: observation metrics become available only AFTER an action
  * materializes the observed frame — call [[Pending.results]] after
  * the write, never before (Spark's `Observation.get` would block).
  */
object Observed {

  /** An instrumented frame plus the handle to collect its metrics once
    * an action has run. */
  final case class Pending(df: DataFrame, obs: Observation,
                           table: String, notNullCols: Seq[String]) {
    /** Quality results from the observed metrics — call AFTER the
      * action that materialized [[df]]. */
    def results(): Seq[Checks.Result] = {
      val m = obs.get
      // NULL-safe: on an EMPTY observed frame sum(...) metrics are NULL
      // — the quality path must report non_empty's failure, not NPE
      // inside results() (r11 ADVICE).
      def asLong(k: String): Long = m(k) match {
        case null => 0L
        case l: Long => l
        case i: Int => i.toLong
        case x => x.toString.toLong
      }
      Checks.Result("non_empty_observed", table,
        if (asLong("rows") > 0L) 0L else 1L) +:
        notNullCols.map(c => Checks.Result(s"not_null_observed($c)",
          table, asLong(s"nulls_$c")))
    }
  }

  /** Attach row-count + null-count observations for `notNullCols` to
    * `df`. Returns the frame to materialize and the pending handle. */
  def instrument(df: DataFrame, table: String,
                 notNullCols: Seq[String]): Pending = {
    val obs = Observation(s"q_$table")
    val metrics = count(lit(1)).as("rows") +:
      notNullCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
          .as(s"nulls_$c"))
    Pending(df.observe(obs, metrics.head, metrics.tail: _*), obs,
      table, notNullCols)
  }
}
