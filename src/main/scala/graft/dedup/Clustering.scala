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
 */
object Clustering {

  /**
   * @param ids   one row per vertex: column `doc_id`
   * @param pairs undirected edges: columns `id_a`, `id_b`
   * @return (doc_id, cluster) where cluster = min doc_id of the component
   */
  def connectedComponents(ids: DataFrame, pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = false)

    var labels = ids.select(col("doc_id"), col("doc_id").as("cluster"))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("ncluster"))
      val updated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(labels("doc_id"),
          least(col("cluster"), coalesce(col("ncluster"), col("cluster"))).as("cluster"))
        .localCheckpoint(eager = true)
      val changed = updated.as("u")
        .join(labels.as("l"), "doc_id")
        .filter(col("u.cluster") =!= col("l.cluster"))
        .limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
