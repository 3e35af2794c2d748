package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CO-OCCURRENCE GRAPH + TRIANGLE COUNTING — the market-basket /
  * community-structure primitives over a (group, item) fact table:
  * build the item graph whose edges are pairs co-occurring in at least
  * `minSupport` groups, then count triangles (the clustering signal).
  *
  * Scale shape:
  *  - PAIR GENERATION is a self-equi-join on the group key with an
  *    `itemA < itemB` ordering predicate — work per group is C(s, 2)
  *    for group size s (orders have a handful of line items; a skewed
  *    giant group would be capped/salted upstream, the SaltedJoin
  *    discipline), and the support aggregate is map-side combined on
  *    the (a, b) pair key.
  *  - TRIANGLES use the DEGREE-ORIENTED join (the standard distributed
  *    trick): orient every edge from its (degree, id)-smaller endpoint
  *    to the larger, so each wedge a→b, a→c is enumerated at its
  *    lowest-degree corner — total wedge work is Σ deg_out², bounded
  *    by O(E^1.5) instead of Σ deg² (a hub of degree d contributes
  *    d·√E, not d²). The closing wedge-edge equi-join is keyed on the
  *    (b, c) pair. Counts are orientation-invariant, so the oracle
  *    replays the identical arithmetic.
  */
object GraphOps {

  /** INTEGER-EXACT PAGERANK over the undirected edge set (each edge
    * walked both ways): ranks carried as BIGINT millionths, damping
    * 0.85 as `(85 · Σ) div 100`, per-neighbor contribution as
    * `pr div deg` — every operation an integer truncating division
    * both engines execute identically, so the iteration chain is
    * hash-gateable end to end (the same quantization discipline as
    * k-means; floating PageRank would drift in the last ulps across
    * summation orders). Unnormalized form: base mass 0.15 per node,
    * no global-N division — rankings identical to the normalized
    * variant.
    *
    * Scale shape: per iteration ONE join of the directed edge list
    * with the (node, pr, deg) state — shuffle keyed on the node id —
    * and one map-side-combined sum; `localCheckpoint` per round keeps
    * the plan flat at any depth (the connectedComponents /
    * bpeTrainApply discipline). Returns (node, deg, pr). */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    // Materialize the (possibly expensive) edge derivation ONCE: the
    // directed list and degrees are re-read by EVERY round's join, and
    // each round is a separately-executed checkpoint job — without
    // this the upstream plan (e.g. the co-occurrence self-join) would
    // re-run iters× (measured: g_pagerank 5.4 → ~2 s at sf0.1). This
    // is the between-plans materialization CLAUDE.md's rule permits.
    val dirs = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(true)
    val outdeg = dirs.groupBy(col("u"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .localCheckpoint(true)
    var pr = outdeg.select(col("u").as("node"), col("deg"),
      lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = dirs
        .join(pr.select(col("node").as("u"), col("deg"), col("pr")),
          Seq("u"))
        .select(col("v").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_sum"))
      pr = outdeg.select(col("u").as("node"), col("deg"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(150000L) +
            expr("85 * coalesce(in_sum, 0L) div 100")).as("pr"))
      pr = Ckpt.truncated(pr) // non-compounding stats (Ckpt scaladoc)
    }
    pr
  }

  /** DuckDB twin of [[pageRank]]: the iteration chain as CTE text.
    * Expects an `edges(src, dst)` CTE; emits `dirs`, `outdeg`, `pr0`,
    * per-round `c{t}`/`pr{t}`. Callers read `pr{iters}` =
    * (node, deg, pr). */
  def pageRankOracleCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s""", dirs AS (
      |  SELECT src AS u, dst AS v FROM edges
      |  UNION ALL SELECT dst, src FROM edges
      |), outdeg AS (
      |  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM dirs GROUP BY 1
      |), pr0 AS (
      |  SELECT u AS node, deg, CAST(1000000 AS BIGINT) AS pr
      |  FROM outdeg
      |)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""", c$t AS (
      |  SELECT d.v AS node, CAST(SUM(r.pr // r.deg) AS BIGINT) AS in_sum
      |  FROM dirs d JOIN pr${t - 1} r ON r.node = d.u
      |  GROUP BY 1
      |), pr$t AS (
      |  SELECT o.u AS node, o.deg,
      |    CAST(150000 + (85 * COALESCE(c.in_sum, 0)) // 100 AS BIGINT)
      |      AS pr
      |  FROM outdeg o LEFT JOIN c$t c ON c.node = o.u
      |)""".stripMargin
    }
    sb.toString
  }

  /** SYNCHRONOUS LABEL PROPAGATION (Raghavan et al. 2007) — community
    * detection between connected components (too coarse: one label per
    * component) and modularity optimization (too expensive at scale):
    * every node starts as its own label; each round it adopts the MOST
    * FREQUENT label among its neighbors, ties to the SMALLER label —
    * the deterministic synchronous variant, so a fixed iteration count
    * is exactly replayable (the async/randomized variant of the paper
    * converges faster but is unordered). Mode-with-min-tie is the
    * k-means argmin discipline: `min(struct(-cnt, label))` partial-
    * aggregates map-side, no sort+window.
    *
    * Scale shape: per round ONE node-keyed join of the directed edge
    * list with the labels and two map-side-combined aggregates;
    * `localCheckpoint(true)` per round keeps the plan flat at any
    * depth ([[pageRank]] discipline). Synchronous LPA can oscillate on
    * bipartite structures — bounded `iters` makes that a deterministic,
    * gateable property rather than a nontermination risk. Returns
    * (node, label). */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame =
    labelPropagationRounds(edges, iters).last

  /** [[labelPropagation]] keeping EVERY round's labels (lp0 … lpIters)
    * — the committed state [[incrementalLabelPropagation]] folds a
    * daily edge batch into. iters×N rows of state instead of N: the
    * price of incremental maintainability, tiny at iters=3. */
  def labelPropagationRounds(edges: DataFrame,
                             iters: Int): Seq[DataFrame] = {
    val dirs = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(true)
    var labels = dirs.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    val rounds = scala.collection.mutable.ArrayBuffer(labels)
    for (_ <- 1 to iters) {
      labels = Ckpt.truncated(lpRound(dirs, labels))
      rounds += labels
    }
    rounds.toSeq
  }

  /** One synchronous LPA round: every `u` adopts the most frequent
    * neighbor label, ties to the smaller label (shared by the full and
    * incremental paths so their per-round arithmetic is identical). */
  private def lpRound(dirs: DataFrame, labels: DataFrame): DataFrame =
    dirs
      .join(labels.select(col("node").as("v"), col("label")), Seq("v"))
      .groupBy(col("u"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("u"))
      .agg(min(struct((-col("cnt")).as("nc"), col("label"))).as("m"))
      .select(col("u").as("node"), col("m.label").as("label"))

  /** INCREMENTAL synchronous LPA — fold a daily batch of new edges into
    * committed per-round labels ([[labelPropagationRounds]]) WITHOUT
    * recomputing over the corpus-scale graph, bit-identical to a full
    * recompute (the oracle gate proves it).
    *
    * Soundness: after k synchronous rounds a node's label is a function
    * of its k-hop neighborhood ONLY — so adding edges E₀ can change
    * round-t labels only inside the radius-t ball around E₀'s
    * endpoints. The recurrence recomputes exactly that ball:
    * affected₀ = endpoints(E₀); affectedₜ = endpoints(E₀) ∪
    * N(affectedₜ₋₁) (a node's next label reads only its NEIGHBORS'
    * labels, so an affected node whose neighbors are all settled drops
    * back out). Each round recomputes [[lpRound]] for the affected set
    * against the committed round-(t-1) labels overlaid with the
    * previous round's recomputed values — one semi-join to restrict,
    * one anti-join to overlay, both keyed by node.
    *
    * Daily work is ∝ |ball(E₀, iters)| — never the corpus graph; the
    * companion of [[graft.llm.Dedup.incrementalComponents]] for the
    * community operator. SHUFFLE bytes are ∝ ball too (r15): the state
    * carried between rounds is the ball-sized label DELTA, never a
    * full overlaid label table — the committed rounds are only ever
    * SCANNED through broadcast semi/anti joins (the ball is
    * daily-batch-sized by the operator's own premise, so broadcasting
    * it is the safe direction; a "batch" comparable to the corpus
    * should run the full recompute instead). The r14 ScaleBench
    * measurement of the previous form showed shuffle-tail α≈1.38 from
    * exactly this: each round rebuilt a corpus-sized label table
    * (committed ⊕ recomputed) and shipped it into the round join.
    *
    * `committedRounds` must come from the same `iters` and the OLD
    * edge set; `oldEdges ∪ newEdges` must be the exact new graph
    * (multiplicities preserved — mode counts see multi-edges the same
    * way the full recompute does). Returns (node, label) for the
    * union graph. */
  def incrementalLabelPropagation(committedRounds: Seq[DataFrame],
                                  oldEdges: DataFrame,
                                  newEdges: DataFrame): DataFrame =
    incrementalLabelPropagation(committedRounds, oldEdges, newEdges,
      BroadcastBallEdges)

  /** Ball bound for [[incrementalLabelPropagation]]'s broadcast POLICY
    * (r19 VERDICT task #5): while the round's ball-edge frame —
    * materialized and counted exactly, the [[graft.llm.Dedup]]
    * `contractedClosure` ≤500k-edge discipline — is under this bound,
    * the round-join's label view (≤ 2·ball-edges + delta rows of two
    * longs each, ≈ 16 MB at the bound) is broadcast BY HINT, so the
    * plan shape is chosen, not drawn from AQE's corpus-sized estimate
    * of the committed table under the semi-join (the r16 100× flip:
    * shuffle stepped 0.7 → 12.5 MB when the estimate crossed the
    * threshold). Past the bound the view is left unhinted and the
    * overlay join legitimately shuffles ∝ ball — the correct asymptotic
    * shape for a mega-batch. */
  val BroadcastBallEdges = 500000L

  private[graft] def incrementalLabelPropagation(
      committedRounds: Seq[DataFrame], oldEdges: DataFrame,
      newEdges: DataFrame, broadcastBallEdges: Long): DataFrame = {
    val iters = committedRounds.size - 1
    val edges = oldEdges.unionByName(newEdges)
    val dirs = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(true)
    // TWO-TIER broadcast policy (r21; VERDICT r20 task #7): every ball
    // is a subset of `dirs`, so when the WHOLE union graph is under the
    // bound the per-round exact ball count can never exceed it either —
    // one count of the already-materialized checkpoint up front replaces
    // `iters` per-round count jobs (the r20 form's disclosed −22 % local
    // cost was exactly this per-round count+policy machinery at toy ball
    // sizes). Past the bound the per-round exact count returns: a
    // mega-batch's ball must be measured, not guessed.
    val wholeGraphSmall = dirs.count() <= broadcastBallEdges
    val e0 = newEdges.select(col("src").as("node"))
      .unionByName(newEdges.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    // round-0 delta: self-labels for NEW nodes (nodes the committed
    // state lacks). All new nodes are E₀ endpoints, so the committed
    // lp0 is probed scan-shaped: semi-join it down to the ball first
    // (left-anti can only broadcast its right side, and committed
    // tables are the corpus-sized side).
    val oldInBall = committedRounds.head.select("node")
      .join(broadcast(e0), Seq("node"), "left_semi")
    var delta = e0.join(broadcast(oldInBall), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var affected = e0
    for (t <- 1 to iters) {
      // the affected ball's edges: ONE scan of dirs, checkpointed —
      // nbrs and the round join both read the ball-sized result (the
      // r19 form re-ran the corpus-edge semi once per consumer), and
      // the materialized count drives the broadcast policy below
      val ballDirs = Ckpt.truncated(dirs.join(
        broadcast(affected.select(col("node").as("u"))),
        Seq("u"), "left_semi"))
      val ballSmall = wholeGraphSmall ||
        ballDirs.count() <= broadcastBallEdges
      // round-(t-1) labels of exactly the ball's neighbor set:
      // committed rows surviving a broadcast semi (scan-shaped, ball
      // output), minus delta-overridden nodes, plus the delta itself
      val nbrs = ballDirs.select(col("v").as("node")).distinct()
      val labelsViewRaw = committedRounds(t - 1)
        .join(broadcast(nbrs), Seq("node"), "left_semi")
        .join(broadcast(delta.select("node")), Seq("node"), "left_anti")
        .unionByName(delta)
      // pin the round join's build side while the ball is under the
      // stated bound (see [[BroadcastBallEdges]]) — chosen, not drawn
      val labelsView =
        if (ballSmall) broadcast(labelsViewRaw) else labelsViewRaw
      delta = Ckpt.truncated(lpRound(ballDirs, labelsView))
      // next ball: E0 endpoints ∪ neighbors of this round's set.
      // `dirs` carries BOTH directions of every edge, so the neighbor
      // set {u : (u,v) ∈ dirs, v ∈ ball} IS `nbrs` = {v : (u,v) ∈
      // dirs, u ∈ ball} — reusing the checkpointed ball edges removes
      // the third corpus-edge scan the r19 form paid per round.
      // NOT checkpointed (r21): `affected`'s lineage is bounded — one
      // distinct over `e0` (checkpointed) ∪ `nbrs` (one level above the
      // checkpointed ballDirs) — and its only consumer is the next
      // round's ballDirs build, which checkpoints immediately; the r20
      // per-round Ckpt here was a pure fixed-cost job (the lineage it
      // truncated never compounds).
      affected = e0.unionByName(nbrs).distinct()
    }
    // ONE corpus-wide overlay at the end — the output table itself;
    // a warehouse would MERGE the delta into the committed table here.
    committedRounds(iters)
      .join(broadcast(delta.select("node")), Seq("node"), "left_anti")
      .unionByName(delta)
  }

  /** DuckDB twin of [[labelPropagation]]: the round chain as CTE text.
    * Expects a `dirs(u, v)` CTE; emits `lp0` … `lp{iters}` =
    * (node, label). */
  def labelPropagationOracleCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """, lp0 AS (
      |  SELECT DISTINCT u AS node, u AS label FROM dirs
      |)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""", lp$t AS (
      |  SELECT u AS node, label FROM (
      |    SELECT d.u, l.label, ROW_NUMBER() OVER (
      |      PARTITION BY d.u ORDER BY COUNT(*) DESC, l.label) AS rn
      |    FROM dirs d JOIN lp${t - 1} l ON l.node = d.v
      |    GROUP BY d.u, l.label) WHERE rn = 1
      |)""".stripMargin
    }
    sb.toString
  }

  /** Bounded multi-source BFS: exact hop distance (≤ maxHops) from a
    * seed set over the undirected edge list — the reachability /
    * blast-radius primitive. Per round: ONE node-keyed join of the
    * current frontier (hops = h-1 only) with the directed edges and one
    * map-side-combined MIN; `localCheckpoint(true)` per round keeps the
    * plan flat at any depth (the [[pageRank]] discipline). State is
    * only the VISITED set — unreached nodes are never materialized, so
    * at 100 TB memory tracks the expanding ball, not the graph.
    * Returns (node, hops), seeds at 0. */
  def bfsHops(edges: DataFrame, seeds: DataFrame,
              maxHops: Int): DataFrame = {
    val dirs = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(true)
    var dist = seeds.select(col("node"), lit(0L).as("hops"))
      .localCheckpoint(true)
    for (h <- 1 to maxHops) {
      val next = dist.filter(col("hops") === (h - 1).toLong)
        .join(dirs, col("node") === col("u"))
        .select(col("v").as("node"), lit(h.toLong).as("hops"))
      dist = Ckpt.truncated(dist.unionByName(next)
        .groupBy("node").agg(min("hops").cast("long").as("hops")))
    }
    dist
  }

  /** Undirected support-filtered co-occurrence edges:
    * (src < dst, support). */
  def coOccurrenceEdges(facts: DataFrame, groupCol: String,
                        itemCol: String, minSupport: Long): DataFrame = {
    val a = facts.select(col(groupCol).as("g"), col(itemCol).as("src"))
      .distinct()
    val b = facts.select(col(groupCol).as("g"), col(itemCol).as("dst"))
      .distinct()
    a.join(b, Seq("g"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("long").as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Degrees over the undirected edge set: (node, degree). */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("degree"))

  /** Triangles of the undirected graph, one row per triangle as the
    * ID-sorted triple (a < b < c) — orientation-independent output from
    * the degree-oriented enumeration described in the object doc. */
  def triangles(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    // orient each edge low→high by (degree, id)
    val oriented = edges
      .join(deg.select(col("node").as("src"),
        col("degree").as("sdeg")), Seq("src"))
      .join(deg.select(col("node").as("dst"),
        col("degree").as("ddeg")), Seq("dst"))
      .select(
        when(struct(col("sdeg"), col("src")) <
          struct(col("ddeg"), col("dst")), col("src")).otherwise(col("dst"))
          .as("lo"),
        when(struct(col("sdeg"), col("src")) <
          struct(col("ddeg"), col("dst")), col("dst")).otherwise(col("src"))
          .as("hi"))
    // wedges at the low-degree corner: lo→x, lo→y with (x, y) ordered
    val w1 = oriented.select(col("lo"), col("hi").as("x"))
    val w2 = oriented.select(col("lo"), col("hi").as("y"))
    val wedges = w1.join(w2, Seq("lo")).filter(col("x") < col("y"))
    // close the wedge with the oriented edge between x and y (its
    // orientation is unknown a priori — check both)
    val closing = oriented.select(col("lo").as("x"), col("hi").as("y"))
      .unionAll(oriented.select(col("hi").as("x"), col("lo").as("y")))
    wedges.join(closing, Seq("x", "y"))
      .select(least(col("lo"), col("x"), col("y")).as("a"),
        // the middle of three distinct ids: total − min − max
        (col("lo") + col("x") + col("y") -
          least(col("lo"), col("x"), col("y")) -
          greatest(col("lo"), col("x"), col("y"))).as("b"),
        greatest(col("lo"), col("x"), col("y")).as("c"))
  }
}
