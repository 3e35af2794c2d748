package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by SALTING — the manual counterpart to AQE's skew
  * join (which `Sessions` leaves enabled): when one join/grouping key
  * carries a disproportionate share of the fact rows, a single shuffle
  * partition becomes the straggler. Salting splits the hot key into
  * `salts` synthetic subkeys so its rows spread over `salts` partitions;
  * results are identical to the unsalted plan.
  *
  * Use when AQE can't help: aggregation skew (AQE only splits skewed
  * JOIN partitions), or deterministic pre-planned layouts where runtime
  * re-optimization is unavailable (e.g. streaming state keyed by a hot
  * key). The salt is derived by hashing a row-unique column — fully
  * deterministic, no rand() (which would break retries and the oracle).
  */
object SaltedJoin {

  private val SaltCol = "__graft_salt"

  /** Fact-preserving join types for which salting is row-equivalent to
    * the plain join. Dim-preserving types (right/full outer) are NOT:
    * each unmatched dim row would surface once per replicated salt
    * copy, so they are rejected up front. */
  private val FactPreservingJoinTypes: Set[String] =
    Set("inner", "left", "leftouter", "left_outer",
      "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")

  /** Salted fact ⋈ dim equi-join: the fact side gets a deterministic
    * salt in [0, salts) from `saltBy` (any row-level column — ids work
    * well), the dim side is replicated `salts`× via a literal-array
    * explode, and the join key becomes (key, salt). Same rows out as
    * the plain join; the hot key's probe rows now hash to `salts`
    * different partitions. Dim replication costs |dim|×salts rows —
    * use for genuinely dim-sized build sides.
    *
    * `joinType` must be fact-preserving (inner / left outer / left
    * semi / left anti): under right or full outer joins the replicated
    * dim copies would each emit their own unmatched row, breaking the
    * "identical to the unsalted plan" contract. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int, saltBy: Column,
                     joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(
      FactPreservingJoinTypes.contains(
        joinType.toLowerCase.replace(" ", "")),
      s"saltedEquiJoin supports fact-preserving join types only " +
        s"(inner/left/left_semi/left_anti); got '$joinType' — " +
        "right/full outer would emit unmatched dim rows once per salt copy")
    val saltedFact = fact.withColumn(SaltCol,
      pmod(hash(saltBy), lit(salts)))
    val replicatedDim = dim.withColumn(SaltCol,
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedFact.join(replicatedDim, Seq(key, SaltCol), joinType)
      .drop(SaltCol)
  }

  /** Salted two-phase aggregation: partial aggregate by (key, salt) —
    * the hot key's rows combine in `salts` parallel partitions — then a
    * cheap final aggregate by key over ≤ salts×|keys| partial rows.
    * Equivalent to groupBy(key).agg(sum) because sums re-associate;
    * any commutative monoid (count, min, max, decimal sum) fits the
    * same shape. */
  def saltedSumByKey(df: DataFrame, key: String, value: Column,
                     salts: Int, saltBy: Column,
                     resultName: String = "total"): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn(SaltCol, pmod(hash(saltBy), lit(salts)))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(value).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(resultName))
  }
}
