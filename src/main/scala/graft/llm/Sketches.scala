package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-size APPROXIMATE SUMMARIES — Count-Min frequency sketch and
  * HyperLogLog cardinality — built from ENGINE-PORTABLE integer
  * hashing so the DuckDB oracle replays them bit-exactly (the same
  * md5 → hex-digit → integer path as [[TextAnalysis.hex6Expr]]; no
  * engine-specific hash intrinsics).
  *
  * Why these exist in a 100 TB engine: both sketches reduce an
  * unbounded stream/corpus to a FIXED-SIZE state (d×w counters /
  * m registers) via one map-side-combinable aggregate — the only
  * shapes that answer "how often does X occur" / "how many distinct"
  * on data too large to hold, and both merge across partitions by
  * construction (counter add / register max), which is exactly what a
  * distributed partial aggregate does. Spark ships approximate
  * versions (`approx_count_distinct`'s HLL++), but their hash/state is
  * engine-internal and can't be oracle-verified; these are the
  * verifiable twins with the same plan shape.
  *
  * Determinism notes (README rules): all sketch STATE is integer-only.
  * The final HLL estimate needs one double multiply+divide, kept
  * portable by construction: the register sum is carried as the exact
  * integer Σ 2^(maxRho−ρ_j) (every term a power of two — no rounding
  * anywhere), and the closing `alpha·m²·2^maxRho / S` is a correctly-
  * rounded IEEE op on identical inputs in both engines.
  */
object Sketches {

  // ---------------------------------------------------------------- CM

  /** Engine-portable bucket of `tokenCol` for hash row `i`:
    * hex6(md5("cm{i}|" + token)) mod w. Returned as an expression
    * STRING parsing identically in Spark and DuckDB. */
  def cmBucketSql(i: Int, tokenCol: String, w: Int): String =
    s"(${TextAnalysis.hex6Expr(s"md5(concat('cm$i|', $tokenCol))")} % $w)"

  /** COUNT-MIN SKETCH build: d×w integer counters from one pass over
    * the token rows — `posexplode` of the d bucket ids keeps it a
    * single scan + ONE (hash_idx, bucket)-keyed aggregate (map-side
    * combined; the sketch is the aggregate's output, ≤ d·w rows no
    * matter the corpus size). Returns (hash_idx, bucket, cnt). */
  def countMinSketch(tokens: DataFrame, tokenCol: String, d: Int,
                     w: Int): DataFrame = {
    val buckets = array((0 until d).map(i =>
      expr(cmBucketSql(i, tokenCol, w))): _*)
    tokens
      .select(posexplode(buckets).as(Seq("hash_idx", "bucket")))
      .groupBy(col("hash_idx"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Point-estimate the frequency of each `probes` row's token from the
    * sketch: min over the d counters the token hashes to. The classic
    * CM guarantee — estimate ≥ true count always, overshoot bounded by
    * (corpus size / w) per hash row — is what the oracle query checks
    * row by row. Probe side is broadcast (top-k tokens, tiny). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
                       tokenCol: String, d: Int, w: Int): DataFrame = {
    val buckets = array((0 until d).map(i =>
      expr(cmBucketSql(i, tokenCol, w))): _*)
    probes
      .withColumn("_b", buckets)
      .select(col(tokenCol),
        posexplode(col("_b")).as(Seq("hash_idx", "bucket")))
      .join(sketch, Seq("hash_idx", "bucket"))
      .groupBy(col(tokenCol))
      .agg(min(col("cnt")).as("cm_estimate"))
  }

  // --------------------------------------------------------------- HLL

  /** Bits of the hex6 hash left after the register index. */
  def hllValueBits(m: Int): Int = 24 - Integer.numberOfTrailingZeros(m)

  /** Engine-portable ρ ladder: for `wExpr` holding a `bits`-wide value,
    * ρ = leading zeros + 1 (= bits+1 when the value is 0) — emitted as
    * a CASE over power-of-two thresholds, identical text in both
    * engines (no log2/bit-length intrinsics, whose widths differ). */
  def rhoSql(wExpr: String, bits: Int): String =
    (0 until bits).map { k =>
      s"WHEN $wExpr >= ${1L << (bits - 1 - k)} THEN ${k + 1}"
    }.mkString("(CASE ", " ", s" ELSE ${bits + 1} END)")

  /** HYPERLOGLOG registers over the token rows: register index = low
    * bits of the portable hash, ρ = leading-zero rank of the remaining
    * bits; state = per-register MAX ρ — one (register)-keyed aggregate
    * whose output is ≤ m rows (registers an empty corpus never touched
    * are simply absent; the estimator counts them as ρ=0). Duplicate
    * tokens change nothing (max is idempotent) — that is the whole
    * trick. Returns (reg, max_rho). */
  def hllRegisters(tokens: DataFrame, tokenCol: String,
                   m: Int): DataFrame = {
    val bits = hllValueBits(m)
    tokens
      // staged projections: one md5, one hex6, then reg/ρ — keeps the
      // plan text linear (inlining the hash into the 18-branch ρ ladder
      // would repeat the md5 expression ~100×)
      .select(md5(col(tokenCol)).as("hhex"))
      .select(expr(TextAnalysis.hex6Expr("hhex")).as("hv"))
      .select(expr(s"cast(hv % $m as bigint)").as("reg"),
        expr(s"hv div $m").as("wv"))
      .select(col("reg"), expr(rhoSql("wv", bits)).as("rho"))
      .groupBy(col("reg"))
      .agg(max(col("rho")).cast("long").as("max_rho"))
  }

  /** Close the HLL estimate from the registers, integer-exactly up to
    * the final IEEE multiply/divide: S = Σ 2^(maxRho−ρ_j) over all m
    * registers (absent ⇒ ρ=0 ⇒ term 2^maxRho), every term a power of
    * two so S is EXACT; estimate = α_m·m²·2^maxRho / S. Returns one row
    * (m, n_registers, sum_scaled, estimate). Raw-estimator regime only
    * (no small-range linear counting — callers at sketch-worthy
    * cardinalities are far above 2.5·m; the oracle asserts that by
    * gating n_registers = m). */
  /** The estimator's double numerator α_m·m²·2^maxRho, computed once in
    * Scala and embedded as the SAME literal in the Column plan and the
    * oracle SQL (shortest-repr round-trips to the identical double in
    * both parsers). */
  def hllNumerator(m: Int): Double = {
    val maxRho = hllValueBits(m) + 1
    (0.7213 / (1.0 + 1.079 / m)) * m.toDouble * m.toDouble *
      (1L << maxRho).toDouble
  }

  // --------------------------------------------------------------- KMV

  /** Hash domain of the KMV sketch — the 24-bit hex6 space. */
  val KmvDomain: Long = 1L << 24

  /** K-MINIMUM-VALUES (bottom-k / theta) sketch: the k smallest
    * distinct portable hash values of each set. Unlike HLL (which only
    * supports UNION via register max), a KMV sketch is a uniform SAMPLE
    * of the set's hash space below a per-set threshold θ = h_(k), which
    * is what makes INTERSECTION estimable (the theta-sketch algebra of
    * the Apache DataSketches family): clip all sketches to the common
    * θ = min(θ_A, θ_B) and the surviving hashes of each set are iid
    * samples at the same known rate θ/2²⁴.
    *
    * Plan shape / 100 TB audit: the only corpus-sized work is ONE
    * distinct over (set, hv) and ONE per-set top-k window —
    * rank-limit filters compile to WindowGroupLimit, so each map task
    * keeps only its local k smallest before the (set)-keyed shuffle;
    * state per set is k longs regardless of set cardinality. Every
    * downstream operation (union, θ-clip, intersection) consumes ONLY
    * sketch rows (≤ k per set): union's k smallest are each inside
    * their own set's k smallest (h ≤ θ_U ≤ θ_set), and θ-clipped
    * samples satisfy h < min θ ≤ θ_set — so merge/intersect never
    * touch the corpus again. Returns (set_id, hv). */
  def kmvSketch(elems: DataFrame, setCol: String, elemCol: String,
                k: Int, salt: String): DataFrame = {
    val w = Window.partitionBy(col("set_id")).orderBy(col("hv"))
    elems
      .select(col(setCol).as("set_id"),
        md5(concat(lit(salt), col(elemCol))).as("hhex"))
      .select(col("set_id"),
        expr(TextAnalysis.hex6Expr("hhex")).cast("long").as("hv"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("set_id", "hv")
  }

  /** Closing KMV estimator |S| ≈ (k−1)·2²⁴ / h_(k) — integer division
    * on the portable state (numerator < 2³² — no overflow, no float
    * math anywhere in the sketch). Integer-div SPELLING differs per
    * engine (`div` in Spark, `//` in DuckDB), so callers pass theirs;
    * the operands are identical text. */
  def kmvEstimateSql(k: Int, thetaExpr: String, intDiv: String): String =
    s"cast((cast(${(k - 1).toLong * KmvDomain} as bigint) $intDiv " +
      s"$thetaExpr) as bigint)"

  def hllEstimate(registers: DataFrame, m: Int): DataFrame = {
    val maxRho = hllValueBits(m) + 1
    val present = registers
      .select(expr(s"shiftleft(1L, $maxRho - cast(max_rho as int))")
        .as("term"))
      .agg(count(lit(1)).cast("long").as("n_registers"),
        sum(col("term")).cast("long").as("s_present"))
    val sumScaled = col("s_present") +
      (lit(m.toLong) - col("n_registers")) * lit(1L << maxRho)
    present.select(
      lit(m.toLong).as("m"),
      col("n_registers"),
      sumScaled.as("sum_scaled"),
      round(lit(hllNumerator(m)) / sumScaled.cast("double"))
        .cast("long").as("estimate"))
  }
}
