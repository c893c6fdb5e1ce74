package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over candidate-pair edges: turns near-dup PAIRS
 * (from LSH) into dedup CLUSTERS (keep one doc per component).
 *
 * Iterative min-label propagation — the standard large-scale approach
 * (GraphX/Pregel-style, O(diameter) rounds; near-dup components are
 * shallow, so a few rounds converge). Each round is one join + one
 * aggregation; `localCheckpoint` truncates lineage so plans don't grow
 * exponentially across iterations.
 *
 * Scale design: only vertices that appear in at least one edge can ever
 * change label — every other doc is its own singleton cluster. The
 * iteration therefore runs on the (tiny) edge-touched vertex set and the
 * full corpus is labeled with one final left join. At 100 TB the candidate
 * edge set is orders of magnitude smaller than the corpus, so the loop's
 * joins never touch the fact-table-sized frame.
 */
object Clustering {

  /**
   * @param ids   one row per vertex: column `doc_id`
   * @param pairs undirected edges: columns `id_a`, `id_b`
   * @return (doc_id, cluster) where cluster = min doc_id of the component
   */
  def connectedComponents(ids: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = true) // reused every round — materialize once

    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .localCheckpoint(eager = true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("ncluster"))
      val propagated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(labels("doc_id"), col("cluster").as("prev"),
          least(col("cluster"), coalesce(col("ncluster"), col("cluster"))).as("mid"))
      // Pointer jump (doubling): follow the tentative label one more hop
      // through the current labels, so label chains halve every round and
      // convergence is O(log diameter) — maxIter=20 covers diameter ~10^6,
      // vs O(diameter) rounds for propagation alone.
      val lookup = labels.select(col("doc_id").as("l_id"), col("cluster").as("l_cluster"))
      // Carry the previous label through the checkpoint so the convergence
      // check is a scan of the materialized frame, not another join job.
      val updated = propagated
        .join(lookup, propagated("mid") === col("l_id"), "left")
        .select(propagated("doc_id"), col("prev"),
          least(col("mid"), coalesce(col("l_cluster"), col("mid"))).as("cluster"))
        .localCheckpoint(eager = true)
      val changed = updated.filter(col("cluster") =!= col("prev")).limit(1).count()
      labels = updated.select(col("doc_id"), col("cluster"))
      converged = changed == 0
      iter += 1
    }
    // A silent non-converged exit would hand back under-merged clusters and
    // downstream dedup would quietly keep duplicates — fail the job instead
    // (with doubling this needs component diameter > 2^maxIter).
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge after $maxIter rounds — " +
        "labels would be under-merged; raise maxIter")

    ids.select(col("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "edge_id"),
        col("doc_id") === col("edge_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
  }
}
