package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD TYPE-2 SNAPSHOT APPLY — the reference tool's own
  * history-tracking primitive (dbt `snapshot`, check strategy): given
  * the current snapshot table (closed history rows + one open row per
  * key) and a new batch, emit the next snapshot version where
  *
  *  - closed history rows pass through untouched,
  *  - an open row whose key arrives with an EQUAL payload stays open,
  *  - an open row whose key arrives with a DIFFERENT payload is CLOSED
  *    at the batch's effective date and a new open row begins there,
  *  - a key absent from the batch keeps its open row (snapshots only
  *    update what arrived),
  *  - a brand-new key opens its first row at the effective date.
  *
  * Payload comparison is one null-safe struct equality (`<=>` over the
  * payload struct — codegen'd, null payloads compare stably). Validity
  * bounds are STRING dates supplied by the caller's data, never wall
  * clock, so the operator is deterministic/replayable — the property
  * dbt gets from `updated_at` and the oracle gate requires.
  *
  * Scale shape: two key-keyed left joins (open⋈batch, batch⋈open —
  * same key, exchanges line up) + pass-through unions; output grows by
  * the CHANGE SET per application, and pairs with
  * [[AtomicTable.commit]] for versioned publication exactly like the
  * merge sink. */
object Scd2 {

  def apply(current: DataFrame, batch: DataFrame, keys: Seq[String],
            payload: Seq[String], effectiveDate: String): DataFrame = {
    val outCols = (keys ++ payload ++ Seq("valid_from", "valid_to"))
      .map(col)
    val open = current.filter(col("valid_to").isNull)
    val closed = current.filter(col("valid_to").isNotNull)
    val bRenamed = batch.select(
      (keys.map(col) ++ payload.map(p => col(p).as(s"_b_$p"))): _*)
      .withColumn("_b_present", lit(true))
    val payloadEq =
      struct(payload.map(col): _*) <=>
        struct(payload.map(p => col(s"_b_$p")): _*)

    val j = open.join(bRenamed, keys, "left")
    val toClose = j
      .filter(col("_b_present").isNotNull && !payloadEq)
      .withColumn("valid_to", lit(effectiveDate))
      .select(outCols: _*)
    val stillOpen = j
      .filter(col("_b_present").isNull || payloadEq)
      .select(outCols: _*)

    val oRenamed = open.select(
      (keys.map(col) ++ payload.map(p => col(p).as(s"_o_$p"))): _*)
      .withColumn("_o_present", lit(true))
    val payloadEqO =
      struct(payload.map(col): _*) <=>
        struct(payload.map(p => col(s"_o_$p")): _*)
    val newOpen = batch.join(oRenamed, keys, "left")
      .filter(col("_o_present").isNull || !payloadEqO)
      .withColumn("valid_from", lit(effectiveDate))
      .withColumn("valid_to", lit(null).cast("string"))
      .select(outCols: _*)

    closed.select(outCols: _*)
      .unionByName(toClose)
      .unionByName(stillOpen)
      .unionByName(newOpen)
  }
}
