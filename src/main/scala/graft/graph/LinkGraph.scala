package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Link-graph analysis for corpus curation — the web-crawl half of an
 * LLM-data pipeline that the document-local operators (t02/t11 quality,
 * d11 URL frontier) don't cover: a page's worth depends on who links to
 * it, not only on its own text. The canonical scorer is PageRank
 * (Page et al. 1999, "The PageRank Citation Ranking"), and at crawl
 * scale it is THE standard Spark iterative-join workload.
 *
 * Reference surface: Presto 0.248 (the engine `/root/reference`
 * launches, presto-mgr.py:59-82) has no graph operators — this family
 * is part of the brief's "operations a large-scale training-data
 * pipeline would need", like the dedup/ANN families.
 *
 * ## Exactness contract (what makes this oracle-able)
 *
 * Floating-point PageRank is NOT reproducible across engines: the
 * per-node contribution sum is an unordered reduction, and FP addition
 * is order-sensitive. This implementation therefore runs in **integer
 * fixed-point**: scores are BIGINT multiples of 1/SCALE, per-edge
 * contributions use floor division (`div`), and the damping step is
 * `base + (85 * sum) div 100`. BIGINT sums are exact and
 * order-independent, so ANY engine that evaluates the same recurrence
 * gets bit-identical scores — the DuckDB oracle replays all
 * iterations with `//` and matches hash-for-hash. (The deliberate
 * trade: each floor division drops < 1/SCALE of mass, so scores sum to
 * slightly under SCALE; rank ORDER is what curation consumes.)
 *
 * ## Scale posture (100 TB / 1e11-edge crawl graph)
 *
 * - Per iteration exactly ONE shuffle moves data: the contribution
 *   `groupBy(dst)` (partial map-side sums — BIGINT add is
 *   associative). The edges-side join input is hash-repartitioned by
 *   `src` ONCE and cached; each iteration's score frame arrives
 *   already hash-partitioned on the same key from the previous
 *   `groupBy`, so the join itself is co-partitioned, never
 *   re-shuffling the (dominant) edge set.
 * - State per node is 16 bytes (id, score) — 1e10 nodes is ~160 GB
 *   across the cluster, far under executor memory at 1000 executors.
 * - Iteration count is fixed and small (curation wants a stable
 *   ordering, not convergence to machine epsilon), so lineage stays
 *   bounded without checkpointing; a convergence-driven variant would
 *   add the d06-style conf-switchable checkpoint every k rounds.
 */
object LinkGraph {

  /** Fixed-point damping numerator/denominator: 0.85 as 85/100. */
  private val DampNum = 85L
  private val DampDen = 100L

  /**
   * Integer fixed-point PageRank over `edges` (columns `src`, `dst`;
   * every node must appear in `nodes`' `doc_id`). Returns (doc_id,
   * score) with score a BIGINT multiple of 1/scale.
   *
   * Recurrence (all divisions are floor on non-negatives):
   *   init(v)   = scale div n
   *   base      = (15 * (scale div n)) div 100
   *   score'(v) = base + (85 * Σ_{(u,v) ∈ E} (score(u) div outdeg(u))) div 100
   */
  def pagerank(nodes: DataFrame, edges: DataFrame, n: Long,
               iterations: Int, scale: Long): DataFrame = {
    val init = scale / n
    val base = (DampDen - DampNum) * init / DampDen
    // Degree-annotated edges, hash-partitioned by src. The subtree is
    // IDENTICAL in every iteration, so its shuffle is computed once per
    // action: AQE reuses an exchange stage whose semantic plan it has
    // already run (and pre-AQE, the ReuseExchange rule does the same
    // dedup) — the dominant edge dataset never re-shuffles per
    // iteration, without pinning executor memory the way persist()
    // would. A convergence-driven variant (one action per round) would
    // persist() this frame across actions instead, the d06 discipline.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val contribEdges = edges.join(deg, "src")
      .repartition(col("src"))
    var scores = nodes.select(col("doc_id"), lit(init).as("score"))
    for (_ <- 1 to iterations) {
      val sums = contribEdges
        .join(scores, contribEdges("src") === scores("doc_id"))
        .select(col("dst"), expr("score div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("csum"))
      scores = nodes
        .join(sums, nodes("doc_id") === sums("dst"), "left")
        .select(col("doc_id"),
          (lit(base) + expr(s"($DampNum * coalesce(csum, 0L)) div $DampDen"))
            .as("score"))
    }
    scores
  }

  /**
   * Integer fixed-point HITS (Kleinberg 1999, "Authoritative Sources in
   * a Hyperlinked Environment") — the hubs-and-authorities complement
   * to [[pagerank]]: a page is a good AUTHORITY if good hubs cite it, a
   * good HUB if it cites good authorities. For curation the authority
   * score flags canonical content, the hub score flags link farms /
   * directory pages.
   *
   * Same exactness contract as pagerank: BIGINT scores, and the
   * per-iteration normalization (HITS diverges without it) is L1 in
   * fixed point — `raw * scale div Σraw` — so every step is exact,
   * order-independent, and bit-replayable. Overflow headroom: with
   * scale = 1e9, raw ≤ (max out-degree)·scale and raw·scale ≤ ~3e18 <
   * 2^63. The normalization total is a single-row aggregate broadcast
   * back (the ≤5-row crossJoin pattern) — no driver collect.
   *
   * Returns (doc_id, auth, hub). Scale posture matches pagerank: two
   * key-partitioned shuffles per iteration (one per direction), edge
   * subtrees identical each round so their shuffles are AQE-reused.
   *
   * Unlike pagerank, each half-step references its raw-sum frame TWICE
   * (once joined back, once reduced to the normalization total), so a
   * fully-lazy chain doubles the logical plan per half-step — 2^8
   * subtree copies by iteration 4, an optimizer blow-up that tiny unit
   * graphs hide and sf0.01 exposed. Each normalized score frame is
   * therefore STAGED ([[graft.plans.Checkpoints.stage]], the
   * q115/e13/q126/p05 discipline — conf-switchable to reliable
   * checkpoints): 8 bounded jobs over node-sized frames (never the
   * edge set), each with a constant-size plan.
   */
  def hits(nodes: DataFrame, edges: DataFrame, n: Long,
           iterations: Int, scale: Long): DataFrame = {
    val init = scale / n
    val norm = (raw: DataFrame, key: String) => {
      val tot = raw.agg(sum(col("raw")).as("tot"))
      graft.plans.Checkpoints.stage(
        nodes.join(raw, nodes("doc_id") === raw(key), "left")
          .crossJoin(broadcast(tot))
          .select(col("doc_id"),
            expr(s"coalesce(raw, 0L) * ${scale}L div tot").as("score")))
    }
    var hub = nodes.select(col("doc_id"), lit(init).as("score"))
    var auth = hub
    for (_ <- 1 to iterations) {
      auth = norm(edges.join(hub.withColumnRenamed("score", "h"),
          edges("src") === col("doc_id"))
        .groupBy(col("dst")).agg(sum(col("h")).as("raw")), "dst")
      hub = norm(edges.join(auth.withColumnRenamed("score", "a"),
          edges("dst") === col("doc_id"))
        .groupBy(col("src")).agg(sum(col("a")).as("raw")), "src")
    }
    auth.select(col("doc_id"), col("score").as("auth"))
      .join(hub.select(col("doc_id"), col("score").as("hub")), "doc_id")
  }

  /** The deterministic citation graph both entries share: doc d cites
    * (d²+1) % n, (7d+3) % n, (13d+5) % n — the quadratic map folds
    * (genuine in-degree skew), the affine maps keep the graph mixed. */
  private def derivedEdges(docs: DataFrame, n: Long): DataFrame =
    docs.select(
      col("doc_id").as("src"),
      array(
        (col("doc_id") * col("doc_id") + 1) % n,
        (col("doc_id") * 7 + 3) % n,
        (col("doc_id") * 13 + 5) % n).as("dsts"))
      .select(col("src"), explode(col("dsts")).as("dst"))

  /**
   * g01: PageRank curation scores over the documents link graph.
   * Links are derived deterministically from doc_id (doc_ids are
   * contiguous 0..N−1, schema_dump-pinned): each doc cites
   * (d² + 1) % N, (7·d + 3) % N, (13·d + 5) % N. The quadratic map is
   * non-bijective, so in-degrees genuinely vary (0, 2, 4, ... for the
   * residue structure) and ranks spread — the affine maps keep the
   * graph strongly mixed. Self-links and parallel edges may occur and
   * are kept (PageRank is well-defined on multigraphs; the oracle
   * replays them identically). 5 iterations, scale 1e12; top 100 by
   * (score desc, doc_id) via TakeOrderedAndProject — bounded, never a
   * global sort.
   *
   * The only driver-side value is N — one bounded count (a scalar),
   * needed because the edge derivation and the teleport term are
   * functions of it.
   */
  def g01(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    pagerank(docs, derivedEdges(docs, n), n, iterations = 5,
        scale = 1000000000000L)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(100)
  }

  /**
   * g02: HITS hub/authority scores over the same citation graph as g01
   * (4 iterations, scale 1e9 for renormalization overflow headroom);
   * top 100 by (auth desc, doc_id) with both scores reported. Exact
   * fixed-point ⇒ the oracle replays all 8 half-steps bit-identically.
   */
  def g02(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    hits(docs, derivedEdges(docs, n), n, iterations = 4, scale = 1000000000L)
      .orderBy(col("auth").desc, col("doc_id"))
      .limit(100)
  }

  /**
   * Exact per-node triangle counting + local clustering coefficient over
   * an undirected edge frame (columns `u`, `v`, u < v, distinct). The
   * local coefficient — triangles(v) / (deg(v)·(deg(v)−1)/2) — is the
   * standard link-spam signal beside hub scores (link farms are
   * near-cliques: coefficient ≈ 1 at high degree; organic pages are
   * sparse neighborhoods).
   *
   * Scale design (the node-iterator bound, Schank & Wagner 2005): each
   * edge is ORIENTED from its lower-(deg, id) endpoint to the higher
   * one, so every triangle is generated exactly once from its
   * lowest-rank vertex and — the load-bound that matters at 1e11 edges
   * — each node's forward adjacency is O(√m): a celebrity node of
   * degree 1e7 ranks above almost all its neighbors and receives their
   * edges instead of fanning out its own, so the wedge self-join is
   * skew-bounded by construction (no salting needed). Wedges
   * (b1, b2 | both forward-neighbors of a) close by one hash semi-join
   * against the canonical edge set; everything shuffled is a pair of
   * 8-byte ids.
   */
  def triangles(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    // orient: a = endpoint with smaller (deg, id), b = the other
    val fwd = und
      .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"))
    val wedges = fwd.select(col("a"), col("b").as("b1"))
      .join(fwd.select(col("a"), col("b").as("b2")), "a")
      .filter(col("b1") < col("b2"))
    val tri = wedges
      .join(und.select(col("u").as("b1"), col("v").as("b2")),
        Seq("b1", "b2"), "left_semi")
    val perNode = tri
      .select(explode(array(col("a"), col("b1"), col("b2"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("x"), "left_outer")
      .select(col("x").as("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(
          when(col("deg") >= 2,
            (coalesce(col("n_tri"), lit(0L)) * 2).cast("double") /
              (col("deg") * (col("deg") - 1)).cast("double"))
            .otherwise(lit(0.0)), 6).as("clustering"))
  }

  /**
   * g03: triangle census of the citation graph (undirected view —
   * direction is irrelevant to "are my neighbors interlinked"): the
   * derived multigraph is canonicalized to distinct undirected pairs
   * (self-links dropped), then [[triangles]]. Emits every node
   * (zero-triangle nodes included — the LEFT join is the point, as in
   * q131) ordered by doc_id. Exact integer counts ⇒ the oracle replays
   * the same wedge join; the one double (clustering) is a single
   * correctly-rounded IEEE division both engines compute identically.
   */
  def g03(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    val und = derivedEdges(docs, n)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    triangles(und).orderBy(col("doc_id"))
  }

  /**
   * g04: graph-shape descriptives — edge reciprocity (share of directed
   * citations that are mutual — link-exchange rings score high) and
   * degree assortativity (Pearson correlation of endpoint degrees over
   * undirected edges — link farms are assortative, organic webs
   * disassortative; Newman 2002). Exactness: the SYMMETRIZED form
   * (each edge counted in both orientations) makes Σx = Σy and
   * Σx² = Σy², so r reduces to (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) over
   * exact BIGINT sums of integer degrees — the whole statistic is
   * integer arithmetic plus ONE correctly-rounded double division,
   * bit-replayable with no sqrt and no libm at all. Scale: degree
   * table is node-sized, joins to edges on their own keys; reciprocity
   * is one self-semi-join on the reversed pair; everything shuffled is
   * 16-byte id pairs, and the final reduce is a 1-row aggregate.
   */
  def g04(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    graphStatsOf(derivedEdges(docs, n).filter(col("src") =!= col("dst")).distinct())
  }

  /**
   * Bounded k-core peeling over an undirected edge frame (columns u, v):
   * `rounds` synchronous rounds of "drop every node whose current degree
   * is < k" (dropping a node drops its edges), returning the final
   * degree table. The k-core is the standard link-farm density signal
   * beside g03's clustering coefficient — spam rings are dense cores
   * that survive peeling, organic pages shed. The FIXED round count is
   * the g01 exactness contract: a converge-until-stable peel has
   * data-dependent iteration count (not oracle-replayable as a bounded
   * unroll); `rounds` rounds of the same recurrence are bit-identical in
   * any engine, and the spec pins that the hand-built core stabilizes
   * well inside the budget.
   *
   * Scale: each round is one edge-keyed degree aggregation (map-side
   * combined BIGINT counts) + two semi-joins of the edge frame against
   * the node-sized survivor set — shuffles carry 8/16-byte ids only.
   * Each round's frame is STAGED (the HITS discipline): the edge frame
   * is referenced twice per round (degree + filter), so a lazy chain
   * would double the logical plan per round.
   */
  def kcoreOf(und: DataFrame, k: Int, rounds: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    var alive = und
    for (_ <- 1 to rounds) {
      val keep = degrees(alive).filter(col("deg") >= k).select(col("x"))
      alive = graft.plans.Checkpoints.stage(
        alive.join(keep.withColumnRenamed("x", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("x", "v"), Seq("v"), "left_semi"))
    }
    degrees(alive)
  }

  /**
   * g05: 3-core membership of the citation graph (undirected canonical
   * view, as in g03) after 5 peeling rounds — every node reported with
   * its residual core degree and membership flag (final degree ≥ k; a
   * node all of whose edges peeled away reports 0). Exact integer
   * recurrence ⇒ the oracle replays the 5 rounds as unrolled CTE passes.
   */
  def g05(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    val und = derivedEdges(docs, n)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val fd = kcoreOf(und, k = 3, rounds = 5)
    docs.join(fd, docs("doc_id") === fd("x"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("deg"), lit(0L)).as("core_deg"),
        (coalesce(col("deg"), lit(0L)) >= 3).as("in_core"))
      .orderBy(col("doc_id"))
  }

  /**
   * Synchronous label propagation over an undirected edge frame
   * (columns u, v): every node starts labeled with its own id; each of
   * `rounds` rounds relabels EVERY node simultaneously with the most
   * frequent label among its neighbors, ties broken by the SMALLEST
   * label (Raghavan et al. 2007's LPA made deterministic — the
   * published algorithm breaks ties randomly and updates
   * asynchronously, both of which are non-replayable across engines;
   * synchronous rounds + min-label ties are the exactness contract,
   * the g01/g05 discipline). Isolated nodes keep their label. The
   * FIXED round count bounds lineage and makes the recurrence a pure
   * integer function any engine replays bit-identically.
   *
   * Scale: per round, one neighbor-label join (labels arrive hash-
   * partitioned on node id from the previous round's aggregate; the
   * doubled edge frame partitions once) + one (node, label) count with
   * map-side partials + one argmax — the argmax is `max(struct(count,
   * -label))`, a plain hash aggregate (BIGINT max is exact and
   * order-independent), NOT a per-node window sort. Shuffled rows are
   * 24 bytes; per-node state 16 bytes. Each round's label frame is
   * STAGED (the HITS discipline) so the self-referencing plan stays
   * constant-size.
   */
  def labelPropOf(nodes: DataFrame, und: DataFrame, rounds: Int): DataFrame = {
    val nbr = und.select(col("u").as("x"), col("v").as("y"))
      .union(und.select(col("v").as("x"), col("u").as("y")))
    var labels = nodes.select(col("doc_id").as("x"), col("doc_id").as("lbl"))
    for (_ <- 1 to rounds) {
      val cnt = nbr
        .join(labels.select(col("x").as("y"), col("lbl").as("nlbl")), "y")
        .groupBy(col("x"), col("nlbl")).agg(count(lit(1)).as("c"))
      val pick = cnt.groupBy(col("x"))
        .agg(max(struct(col("c"), (-col("nlbl")).as("neg"))).as("m"))
        .select(col("x"), (-col("m.neg")).as("plbl"))
      labels = graft.plans.Checkpoints.stage(
        labels.join(pick, Seq("x"), "left")
          .select(col("x"), coalesce(col("plbl"), col("lbl")).as("lbl")))
    }
    labels
  }

  /**
   * g06: community detection on the citation graph via deterministic
   * label propagation (4 synchronous min-label rounds over the g05
   * undirected canonical view) — the curation signal beside g01's
   * rank and g05's density: a crawl's template farms and mirror
   * clusters collapse into few large communities while organic pages
   * spread across many small ones, and per-COMMUNITY caps are a
   * standard diversity lever. Reports each node's community and the
   * community's size (one node-sized count join — the corpus-scale
   * frames never re-shuffle). Exact integer recurrence ⇒ the oracle
   * replays the 4 rounds as unrolled CTE passes with a ROW_NUMBER
   * argmin replaying the min-label tie.
   */
  def g06(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    val und = derivedEdges(docs, n)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val labels = labelPropOf(docs, und, rounds = 4)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "lbl")
      .select(col("x").as("doc_id"), col("lbl").as("community"),
        col("n_members"))
      .orderBy(col("doc_id"))
  }

  /** Co-citation and bibliographic coupling over any distinct directed
    * (src, dst) frame — the unit-testable kernel. Co-citation (Small
    * 1973): pairs cited BY the same page, counted per shared citer.
    * Coupling (Kessler 1963): pairs CITING the same page, counted per
    * shared reference. Both are (a < b)-canonicalized self-joins whose
    * fan-out is bounded by degree — out-degree is 3 by construction
    * (≤3 pairs per citer) and the quadratic map's in-degree
    * multiplicity is the bounded residue count, so neither join can
    * expand quadratically the way an unbounded hub would; everything
    * shuffled is 8/16-byte ids. */
  def cocitationOf(dir: DataFrame): DataFrame = {
    val cocite = dir.as("x").join(dir.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("a"), col("y.dst").as("b"))
      .agg(count(lit(1)).as("n_cocited"))
    val couple = dir.as("x").join(dir.as("y"),
        col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("a"), col("y.src").as("b"))
      .agg(count(lit(1)).as("n_coupled"))
    cocite.join(couple, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        coalesce(col("n_cocited"), lit(0L)).as("n_cocited"),
        coalesce(col("n_coupled"), lit(0L)).as("n_coupled"))
  }

  /** g07: co-citation + bibliographic coupling on the citation graph —
    * the two classic link-similarity metrics (pages repeatedly cited
    * together are topically related; pages citing the same sources are
    * mirrors/templates — both are curation levers beside g01's rank
    * and g06's communities). Exact integer counts on the same
    * deterministic edge set every g-entry shares; the oracle replays
    * the two canonicalized self-joins and the full outer merge. */
  def g07(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    // STAGE the distinct edge frame: it feeds FOUR join inputs (both
    // sides of both self-joins) — unstaged, the scan + explode +
    // distinct shuffle re-run per input (the HITS staging discipline).
    val dir = graft.plans.Checkpoints.stage(derivedEdges(docs, n)
      .filter(col("src") =!= col("dst")).distinct())
    cocitationOf(dir).orderBy(col("a"), col("b"))
  }

  /** The g04 kernel over any distinct directed (src, dst) frame — the
    * unit-testable form (the spec pins the closed-form star/path values). */
  def graphStatsOf(dir: DataFrame): DataFrame = {
    val recip = dir.join(
      dir.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    val und = dir.select(least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v")).distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val sums = und
      .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v")
      .agg(count(lit(1)).as("ne"),
        sum(col("du")).as("sx"), sum(col("dv")).as("sy"),
        sum(col("du") * col("dv")).as("sxy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"))
    val nDir = dir.count()
    val nRecip = recip.count()
    // symmetrized: n2 = 2·ne, Σx = sx+sy, Σxy = 2·sxy, Σx² = sxx+syy —
    // numerator and denominator are exact BIGINTs, then one division
    sums.select(
      lit(nDir).as("n_directed"), lit(nRecip).as("n_reciprocal"),
      round(lit(nRecip).cast("double") / lit(nDir).cast("double"), 6)
        .as("reciprocity"),
      col("ne").as("n_undirected"),
      round(
        ((col("ne") * 2) * (col("sxy") * 2) -
          (col("sx") + col("sy")) * (col("sx") + col("sy"))).cast("double") /
        ((col("ne") * 2) * (col("sxx") + col("syy")) -
          (col("sx") + col("sy")) * (col("sx") + col("sy"))).cast("double"), 6)
        .as("assortativity"))
  }
}
