package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Date-spine gap filling — the dbt-utils `date_spine` pattern plus
  * forward fill: one row per (key, day) over a calendar window, flow
  * metrics zero-filled, stock metrics carried forward from the most
  * recent observed day (LOCF). The reference's day-grain marts assume a
  * dense calendar the same way (models/marts/fct_product_pricing_history
  * builds daily series, then consumers as-of join against them).
  *
  * Scale shape: the spine is built by exploding ONE `sequence()` per
  * key — spine size = |keys| × days, linear, never a crossJoin of two
  * row-sized frames; the join back to the daily aggregate is a
  * (key, day) equi-join; the fill is one key-partitioned running
  * window, so state per task is a single partition's days. Leading
  * days before a key's first observation keep NULL stock values
  * (nothing to carry yet) — a property the oracle gate pins.
  */
object DateSpine {

  /** Densify `daily` (one row per observed (key, day)) onto the
    * [startDay, endDay] calendar for every key in `keys`.
    * Adds `has_obs`, zero-fills `flowCols` (type-preserving), carries
    * `stockCols` forward, and emits `days_since_obs` (NULL before the
    * first observation). */
  def spineFill(keys: DataFrame, daily: DataFrame, keyCol: String,
                dayCol: String, startDay: String, endDay: String,
                flowCols: Seq[String], stockCols: Seq[String]): DataFrame = {
    val spine = keys.select(col(keyCol))
      .withColumn(dayCol, explode(expr(
        s"sequence(to_date('$startDay'), to_date('$endDay'))")))
    val marked = daily.withColumn("has_obs", lit(true))
    val joined = spine.join(marked, Seq(keyCol, dayCol), "left")
      .withColumn("has_obs", coalesce(col("has_obs"), lit(false)))
    val zeroed = flowCols.foldLeft(joined)((df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0).cast(df.schema(c).dataType))))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stockCols.foldLeft(zeroed)((df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      .withColumn("days_since_obs",
        datediff(col(dayCol),
          last(when(col("has_obs"), col(dayCol)), ignoreNulls = true)
            .over(w)).cast("long"))
  }
}
