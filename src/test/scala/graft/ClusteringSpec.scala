package graft

import graft.dedup.Clustering

class ClusteringSpec extends GraftSpec {
  import spark.implicits._

  test("connected components labels chains, merges, and singletons correctly") {
    val ids = (1L to 7L).toDF("doc_id")
    // chain 1-2-3, pair 5-6, singleton 4 and 7; edge 6-7 merges late
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val got = Clustering.connectedComponents(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("pointer jumping converges a long chain in O(log diameter) rounds") {
    val n = 200L
    val ids = (1L to n).toDF("doc_id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // plain propagation would need ~200 rounds; doubling needs ~log2(200)=8
    val got = Clustering.connectedComponents(ids, chain, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("non-convergence fails loudly instead of returning under-merged labels") {
    val ids = (1L to 40L).toDF("doc_id")
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException](
      Clustering.connectedComponents(ids, chain, maxIter = 2).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  test("no edges → every doc is its own cluster") {
    val ids = (1L to 5L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Clustering.connectedComponents(ids, none)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(i => i -> i).toMap)
  }

  test("curation keeps only above-threshold, deduplicated docs") {
    val out = graft.pipeline.Curation.curate(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Double]("score") >= 0.5))
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("c03: verdict matches its own thresholds; composite in [0,1]; one row per doc") {
    val out = graft.pipeline.Curation.fullCuration(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(out.length == nDocs, "every doc gets a decision row")
    out.foreach { r =>
      val (q, b, f) = (r.getAs[Double]("quality"), r.getAs[Double]("bp_frac"),
        r.getAs[Double]("fluency"))
      assert(r.getAs[Boolean]("keep") == (q >= 0.5 && b < 0.2 && f >= -4.0))
      val c = r.getAs[Double]("composite")
      assert(c >= 0.0 && c <= 1.0 + 1e-9, s"composite $c out of band")
    }
  }
}
