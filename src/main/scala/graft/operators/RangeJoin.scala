package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed batch RANGE (interval) join — the scalable rewrite of
  * `point BETWEEN start AND end` (the builder brief's canonical
  * "operator Spark lacks": without a rewrite Catalyst plans a pure
  * range predicate as BroadcastNestedLoopJoin, which is O(n·m)
  * compares and single-node memory for one side).
  *
  * Rewrite: pick a bucket width B on the (integer) range domain;
  * each interval explodes to ceil(len/B)+1 bucket rows (BOUNDED —
  * the caller guarantees a max interval length), each point maps to
  * exactly ONE bucket, and the join becomes a plain shuffled
  * EQUI-join on the bucket id followed by the residual
  * `BETWEEN` filter. Every containing pair shares the point's
  * bucket by construction, so recall is exact; work is
  * Σ_bucket points(b)·intervals(b) instead of n·m.
  *
  * 100-TB notes: both sides shuffle ONCE on the bucket key (or zero
  * times if stored bucketed by it); candidate density is tuned by B —
  * B ≈ median interval length keeps interval replication ≤ 2× while
  * bounding per-bucket fan-in. A time-skewed corpus (all intervals
  * over one hot week) concentrates in few buckets: either shrink B or
  * salt the hot buckets with [[SaltedJoin]]. The same shape serves
  * IP-range lookups, genomic overlap joins and event-in-session
  * attribution; the streaming twin is `st_interval_join`.
  *
  * Reference ground: the reference's attribution windows
  * (fct_trade_show_leads.sql:107-170) are this predicate with the
  * interval side small enough to broadcast — this operator is the
  * fact-×-fact version where neither side fits.
  *
  * `points` must carry integer column `pointKey`; `intervals` integer
  * columns `startKey`/`endKey` (inclusive, `start <= end`; for dates
  * use epoch days, for timestamps epoch seconds — keep them
  * non-negative so `div` flooring never matters). Column names of the
  * two frames must be disjoint except for `equiKeys`, which must be
  * present on BOTH sides: when the range predicate has a natural
  * entity key (events in THAT USER's sessions, trades in THAT
  * symbol's halts), passing it narrows the join to
  * (bucket, keys) — candidate pairs per bucket drop from
  * points(b)·intervals(b) to Σ_key points(b,key)·intervals(b,key).
  * This is the difference between α≈2 and α≈1 when both sides grow
  * inside a fixed time window (ScaleBench's range_join_unkeyed /
  * range_join_keyed arms measure exactly this A/B). Returns all
  * point × interval columns for each containing pair.
  */
object RangeJoin {
  private val Bucket = "__range_bucket"
  private val Salt = "__range_salt"

  // `div` (integer division) per the portability rules — `/` on
  // longs is DOUBLE division and loses exactness past 2^53.
  // Guard the documented interval preconditions executor-side:
  // an INVERTED interval (start > end) would make sequence() step
  // BACKWARDS (silently joining a descending bucket list), and an
  // unbounded interval would hit sequence()'s max-array-length with
  // an opaque error — fail with the contract instead.
  private def explodedIntervals(intervals: DataFrame, startKey: String,
                                endKey: String,
                                bucketSize: Long): DataFrame = {
    val checkedStart = expr(
      s"""CASE
         |  WHEN $startKey > $endKey THEN
         |    raise_error(concat('RangeJoin: inverted interval (',
         |      CAST($startKey AS STRING), ' > ', CAST($endKey AS STRING),
         |      ') - intervals must satisfy start <= end'))
         |  WHEN ($endKey div ${bucketSize}L) -
         |       ($startKey div ${bucketSize}L) > 100000 THEN
         |    raise_error(concat('RangeJoin: interval spans more than ',
         |      '100000 buckets (', CAST($startKey AS STRING), '..',
         |      CAST($endKey AS STRING),
         |      ' at bucketSize=${bucketSize}) - intervals must be ',
         |      'bounded; raise bucketSize or pre-split the interval'))
         |  ELSE $startKey div ${bucketSize}L
         |END""".stripMargin)
    intervals.withColumn(Bucket,
      explode(sequence(checkedStart, expr(s"$endKey div ${bucketSize}L"))))
  }

  private def bucketedPoints(points: DataFrame, pointKey: String,
                             bucketSize: Long): DataFrame =
    points.withColumn(Bucket, expr(s"$pointKey div ${bucketSize}L"))

  def bucketedIntervalJoin(points: DataFrame, intervals: DataFrame,
                           pointKey: String, startKey: String,
                           endKey: String, bucketSize: Long,
                           equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val iv = explodedIntervals(intervals, startKey, endKey, bucketSize)
    val pt = bucketedPoints(points, pointKey, bucketSize)
    pt.join(iv, Bucket +: equiKeys)
      .filter(col(pointKey) >= col(startKey) &&
        col(pointKey) <= col(endKey))
      .drop(Bucket)
  }

  /** HOT-BUCKET (time-skew) variant — [[bucketedIntervalJoin]]
    * composed with [[SaltedJoin]]'s discipline, the composition this
    * file's 100-TB notes name: when the workload concentrates points
    * AND intervals in few time buckets (everything happened during one
    * hot week), the bucket equi-join hashes the hot bucket to ONE
    * shuffle partition and that partition is the straggler. The point
    * side gets a deterministic salt in [0, salts) from `saltBy` (any
    * row-level column; never rand() — retries and the oracle), the
    * interval side's bucket rows are replicated `salts`×, and the join
    * key becomes (bucket, salt, equiKeys): the hot bucket's probe rows
    * now spread over `salts` partitions. Rows out are IDENTICAL to the
    * unsalted plan (`j21_salted_range_join` gate-proves it against the
    * naive containment twin); the price is |interval bucket rows|×salts
    * replication — use when intervals are the small side, and prefer
    * plain [[bucketedIntervalJoin]] + AQE skew splitting when the skew
    * is mild or unknown. */
  def saltedBucketedIntervalJoin(points: DataFrame, intervals: DataFrame,
                                 pointKey: String, startKey: String,
                                 endKey: String, bucketSize: Long,
                                 salts: Int,
                                 saltBy: org.apache.spark.sql.Column,
                                 equiKeys: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    val iv = explodedIntervals(intervals, startKey, endKey, bucketSize)
      .withColumn(Salt, explode(array((0 until salts).map(lit(_)): _*)))
    val pt = bucketedPoints(points, pointKey, bucketSize)
      .withColumn(Salt, pmod(hash(saltBy), lit(salts)))
    pt.join(iv, Seq(Bucket, Salt) ++ equiKeys)
      .filter(col(pointKey) >= col(startKey) &&
        col(pointKey) <= col(endKey))
      .drop(Bucket, Salt)
  }
}
