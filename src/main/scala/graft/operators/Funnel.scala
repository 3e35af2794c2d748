package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MULTI-STAGE CONVERSION FUNNEL over an event stream — the product
  * question "of the users who did A, how many then did B within h, and
  * then C within h of that" (view → click → purchase). Stage 1 is each
  * user's FIRST stage-1 event; stage i+1 is the first stage-i+1 event
  * STRICTLY after the user's stage-i time and within `horizon` of it.
  * Users never reaching stage 1 are not funnel members at all.
  *
  * Scale shape: one filtered min-aggregate per stage (map-side
  * combined — the per-user first event needs no window/sort) plus two
  * user-keyed equi-joins per stage; every shuffle in the chain is keyed
  * on the SAME user column, so the exchanges line up and reuse. Nothing
  * is ever wider than (user, k timestamps). The stage filters reach the
  * scan as pushed `event_type` predicates.
  */
object Funnel {

  /** Returns one row per stage-1 user: (user, t_1 … t_k timestamps —
    * NULL once the funnel broke — and reached_stage ∈ [1, k]). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String],
             horizon: String): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_1"))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      val (prev, cur) = (s"t_$i", s"t_${i + 1}")
      val nxt = events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("_ts"))
      val reached = acc.select(col(userCol), col(prev))
        .join(nxt, Seq(userCol))
        .filter(col("_ts") > col(prev) &&
          col("_ts") <= col(prev) + expr(s"interval $horizon"))
        .groupBy(col(userCol)).agg(min(col("_ts")).as(cur))
      acc = acc.join(reached, Seq(userCol), "left")
    }
    val reachedStage = (stages.size to 2 by -1).foldRight(lit(1)) {
      (i, els) => when(col(s"t_$i").isNotNull, lit(i)).otherwise(els)
    }
    acc.withColumn("reached_stage", reachedStage.cast("long"))
  }
}
