package graft

import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Exactness and posture checks for the fixed-point PageRank operator.
  * The reference implementation here is an independent single-threaded
  * Scala loop over the same integer recurrence — agreement must be
  * EXACT (the whole point of fixed-point is that BIGINT sums are
  * order-independent), not within-epsilon. */
class LinkGraphSpec extends GraftSpec {

  /** Single-threaded reference: same recurrence, plain Maps. */
  private def refPagerank(n: Int, edges: Seq[(Long, Long)],
                          iterations: Int, scale: Long): Map[Long, Long] = {
    val init = scale / n
    val base = 15L * init / 100L
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var score = (0L until n.toLong).map(_ -> init).toMap
    for (_ <- 1 to iterations) {
      val csum = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => csum(d) += score(s) / deg(s) }
      score = (0L until n.toLong).map(v => v -> (base + 85L * csum(v) / 100L)).toMap
    }
    score
  }

  private def g01Edges(n: Long): Seq[(Long, Long)] =
    (0L until n).flatMap(d => Seq(
      d -> (d * d + 1) % n, d -> (7 * d + 3) % n, d -> (13 * d + 5) % n))

  test("pagerank matches the independent fixed-point reference exactly") {
    import spark.implicits._
    val n = 97L // prime: quadratic map folds, affine maps are bijections
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val edges = g01Edges(n).toDF("src", "dst")
    val got = LinkGraph.pagerank(nodes, edges, n, iterations = 5,
        scale = 1000000000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPagerank(n.toInt, g01Edges(n), 5, 1000000000000L)
    assert(got == want, "distributed and single-threaded recurrences must be bit-identical")
    // the quadratic fold must actually spread ranks (not the uniform
    // fixed point a bijective-only edge set would give)
    assert(got.values.toSet.size > 10, s"expected rank spread, got ${got.values.toSet.size} distinct scores")
  }

  test("no-in-link nodes sit at the teleport base; mass is conserved up to floor loss") {
    import spark.implicits._
    // star: everyone cites node 0; nodes 1..9 have no in-links
    val n = 10L
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val edges = (1L until n).map(d => d -> 0L).toDF("src", "dst")
    // node 0 has no OUT-edges (dangling): its mass leaves the system —
    // acceptable for curation ranking and exactly mirrored by the
    // recurrence (and the oracle); assert the documented behavior.
    val scale = 1000000000L
    val got = LinkGraph.pagerank(nodes, edges, n, iterations = 3, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 15L * (scale / n) / 100L
    (1L until n).foreach(v => assert(got(v) == base,
      s"no-in-link node $v must hold exactly the teleport base"))
    assert(got(0L) > got(1L), "the hub must outrank leaves")
    assert(got.values.sum <= scale, "fixed-point floors may only LOSE mass")
  }

  /** Single-threaded HITS reference: same fixed-point recurrence. */
  private def refHits(n: Long, edges: Seq[(Long, Long)],
                      iterations: Int, scale: Long): Map[Long, (Long, Long)] = {
    val init = scale / n
    var hub = (0L until n).map(_ -> init).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iterations) {
      val ar = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => ar(d) += hub(s) }
      val at = ar.values.sum
      auth = (0L until n).map(v => v -> ar(v) * scale / at).toMap
      val hr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => hr(s) += auth(d) }
      val ht = hr.values.sum
      hub = (0L until n).map(v => v -> hr(v) * scale / ht).toMap
    }
    (0L until n).map(v => v -> (auth(v), hub(v))).toMap
  }

  test("hits matches the independent fixed-point reference exactly") {
    import spark.implicits._
    val n = 97L
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val edges = g01Edges(n).toDF("src", "dst")
    val got = graft.graph.LinkGraph.hits(nodes, edges, n,
        iterations = 4, scale = 1000000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = refHits(n, g01Edges(n), 4, 1000000000L)
    assert(got == want)
  }

  test("hits separates hubs from authorities on a directed star") {
    import spark.implicits._
    // 1,2,3 all cite 0: node 0 is the pure authority, 1-3 equal hubs
    val n = 4L
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L).toDF("src", "dst")
    val scale = 1000000L
    val got = graft.graph.LinkGraph.hits(nodes, edges, n, iterations = 2, scale = scale)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L)._1 == scale && got(0L)._2 == 0L,
      "the cited node holds ALL authority and no hubness")
    assert((1L to 3L).forall(v => got(v)._1 == 0L && got(v)._2 == scale / 3),
      "citing nodes hold equal hub mass and no authority")
  }

  test("triangles: exact counts and coefficients on triangle+pendant, and on K4") {
    import spark.implicits._
    // triangle {0,1,2} plus pendant 3 hanging off 2
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)).toDF("u", "v")
    val got = LinkGraph.triangles(und).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) == ((2L, 1L, 1.0)))
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((3L, 1L, 0.333333))) // rounded to 6 dp by the entry
    assert(got(3L) == ((1L, 0L, 0.0)))
    // K4: every node in 3 triangles, coefficient exactly 1
    val k4 = (for (a <- 0 to 3; b <- 0 to 3 if a < b) yield (a.toLong, b.toLong))
      .toDF("u", "v")
    LinkGraph.triangles(k4).collect().foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getDouble(3) == 1.0)
    }
  }

  test("kcore: clique survives peeling, pendants shed, and the peel is stable") {
    import spark.implicits._
    // 4-clique {0,1,2,3} + path 3-4-5: round 1 drops 4 and 5 (degree < 3),
    // which also strips 3's pendant edge; the clique is the 3-core
    val und = ((for (a <- 0 to 3; b <- 0 to 3 if a < b) yield (a.toLong, b.toLong))
      ++ Seq((3L, 4L), (4L, 5L))).toDF("u", "v")
    val got = LinkGraph.kcoreOf(und, k = 3, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"3-core must be exactly the clique at degree 3: $got")
    // the peel stabilized inside the round budget: one more round is a no-op
    val more = LinkGraph.kcoreOf(und, k = 3, rounds = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == got)
    // k above the max degree peels everything
    assert(LinkGraph.kcoreOf(und, k = 5, rounds = 5).collect().isEmpty)
  }

  test("cocitation kernel: closed-form counts on a two-citer fan") {
    import spark.implicits._
    // citers 10 and 11 both cite {1, 2}; 10 also cites 3.
    val dir = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L)).toDF("src", "dst")
    val got = LinkGraph.cocitationOf(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_cocited"), r.getAs[Long]("n_coupled"))).toMap
    // co-citation: (1,2) cited together by both citers; (1,3)/(2,3) by 10 only
    assert(got((1L, 2L))._1 == 2L)
    assert(got((1L, 3L))._1 == 1L && got((2L, 3L))._1 == 1L)
    // coupling: citers 10 and 11 share references 1 and 2
    assert(got((10L, 11L)) == (0L, 2L))
    // no pair is invented: only the four above exist
    assert(got.size == 4)
  }

  test("g07 entry: pair canonicalization, bounded fan-out, consistent totals") {
    val rows = LinkGraph.g07(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be (a < b) canonical")
      val cc = r.getAs[Long]("n_cocited"); val bc = r.getAs[Long]("n_coupled")
      assert(cc >= 0 && bc >= 0 && (cc > 0 || bc > 0))
      // out-degree 3 bounds co-citation multiplicity by the citer count;
      // any single pair's shared-citer count is at most n (sanity) and
      // its shared-reference count at most 3 (a citer has 3 references)
      assert(bc <= 3, s"coupling ${r.getLong(0)},${r.getLong(1)}: $bc > out-degree bound")
    }
    // ordered presentation
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("labelProp: communities converge per component, min-label ties, isolated keeps own") {
    import spark.implicits._
    // two disjoint triangles + isolated node 6: each triangle collapses
    // to its minimum id by round 2 and stays there; 6 never relabels
    val nodes = spark.range(7).select(col("id").as("doc_id"))
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L)).toDF("u", "v")
    val got = LinkGraph.labelPropOf(nodes, und, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 6L), s"got $got")
    // tie-break pin: star center sees labels {1, 2} once each after one
    // round — the SMALLEST label must win
    val star = Seq((0L, 1L), (0L, 2L)).toDF("u", "v")
    val one = LinkGraph.labelPropOf(
      spark.range(3).select(col("id").as("doc_id")), star, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(0L -> 1L, 1L -> 0L, 2L -> 0L), s"got $one")
  }

  test("g06 entry: every doc labeled once, sizes consistent, communities real") {
    val rows = LinkGraph.g06(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted) && ids.distinct.length == ids.length)
    // n_members is the true size of each community on every row
    val sizes = rows.groupBy(_.getLong(1)).map { case (c, g) => c -> g.length }
    rows.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1))))
    // propagation genuinely merged labels (fewer communities than nodes)
    // and at this density at least one community spans many nodes
    assert(sizes.size < rows.length)
    assert(sizes.values.max > 10)
  }

  test("g05 entry: membership flags honor the residual degree, doc_id-ordered") {
    val rows = LinkGraph.g05(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) >= 3))
      // simple undirected graph: degree is bounded by n - 1
      assert(r.getLong(1) < rows.length)
    }
    // the citation graph genuinely has both fates at this density
    assert(rows.exists(_.getBoolean(2)))
  }

  test("g03 entry: emits every edge-touched node, doc_id-ordered, counts consistent") {
    val rows = LinkGraph.g03(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
    // handshake: every triangle contributes exactly 3 per-node increments
    val triSum = rows.map(_.getLong(2)).sum
    assert(triSum % 3 == 0, s"per-node triangle counts must sum to 3·T, got $triSum")
    rows.foreach { r =>
      val (deg, tri, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(tri <= deg * (deg - 1) / 2, "triangles at a node are bounded by its wedge count")
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("g04 kernel: star graph is perfectly disassortative; reciprocity counts mutual pairs") {
    import spark.implicits._
    // directed star: 1,2,3 all cite 0, and 0 cites 1 back (one mutual pair)
    val dir = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val r = LinkGraph.graphStatsOf(dir).collect().head
    assert(r.getAs[Long]("n_directed") == 4 && r.getAs[Long]("n_reciprocal") == 2)
    assert(r.getAs[Double]("reciprocity") == 0.5)
    assert(r.getAs[Long]("n_undirected") == 3)
    // undirected star: every edge joins the deg-3 hub to a deg-1 leaf — r = −1
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("g04 entry: bounds hold on the citation graph") {
    val r = LinkGraph.g04(spark, sf).collect().head
    assert(r.getAs[Long]("n_reciprocal") <= r.getAs[Long]("n_directed"))
    val rec = r.getAs[Double]("reciprocity")
    assert(rec >= 0.0 && rec <= 1.0)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"assortativity $a out of [-1,1]")
  }

  test("g01 pagerank: the per-iteration edge shuffle is REUSED, not recomputed") {
    // The 100 TB posture of g01 rests on one claim (LinkGraph.pagerank's
    // contribEdges comment): the degree-annotated edge subtree is
    // IDENTICAL in every iteration, so its shuffle materializes once and
    // every later iteration reads the reused stage — the dominant edge
    // dataset never re-shuffles per iteration. AQE realizes a reused
    // stage as a QueryStageExec wrapping ReusedExchangeExec, which exists
    // only in the final runtime plan — execute first, then count.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val df = LinkGraph.g01(spark, sf)
    df.collect()
    def countReuse(p: SparkPlan): Int = {
      val self = if (p.isInstanceOf[ReusedExchangeExec]) 1 else 0
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(countReuse).sum + p.subqueries.map(countReuse).sum
    }
    val reuses = countReuse(df.queryExecution.executedPlan)
    // 5 iterations consume the edge stage 5 times: 1 materialization +
    // ≥ 4 reuses (other subtree reuses can only add)
    assert(reuses >= 4,
      s"expected >= 4 reused exchange stages across 5 pagerank iterations, " +
        s"got $reuses:\n${df.queryExecution.executedPlan}")
  }

  test("g01 entry: top-k is a bounded TakeOrderedAndProject, never a global sort") {
    val plan = LinkGraph.g01(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 must be per-partition heaps + merge:\n$plan")
    val rows = LinkGraph.g01(spark, sf).collect()
    assert(rows.length == 100)
    // presentation order: score desc, doc_id asc tiebreak
    val pairs = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy { case (s, d) => (-s, d) }))
  }
}
