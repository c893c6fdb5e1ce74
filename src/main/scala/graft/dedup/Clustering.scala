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
      // Carry the previous label through the checkpoint so the convergence
      // check is a scan of the materialized frame, not another join job.
      val updated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(labels("doc_id"), col("cluster").as("prev"),
          least(col("cluster"), coalesce(col("ncluster"), col("cluster"))).as("cluster"))
        .localCheckpoint(eager = true)
      val changed = updated.filter(col("cluster") =!= col("prev")).limit(1).count()
      labels = updated.select(col("doc_id"), col("cluster"))
      converged = changed == 0
      iter += 1
    }
    // A silent non-converged exit would hand back under-merged clusters;
    // make the failure mode loud so callers can raise maxIter.
    if (!converged) System.err.println(
      s"[graft] connectedComponents did NOT converge after $maxIter rounds — " +
        "labels may be under-merged; increase maxIter (diameter exceeded)")

    ids.select(col("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "edge_id"),
        col("doc_id") === col("edge_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
  }
}
