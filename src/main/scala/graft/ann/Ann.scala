package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/**
 * Similarity search over embedding columns (array<float>).
 *
 * a01 is the exact baseline: broadcast the (small) probe set against the
 * full corpus — one scan, no shuffle of the corpus, cosine via the native
 * codegen expression; ranking is a per-probe top-k window.
 *
 * a02 is the scale path: IVF-style cell pruning. Vectors are assigned to
 * their nearest centroid once (broadcast centroids); probes only scan the
 * top-2 nearest cells, cutting the scan ~5x here and ~nlist/nprobe at
 * 100 TB. Centroids here are a deterministic sample (every 50th vector);
 * swapping in k-means centroids changes recall, not the topology.
 */
object Ann {

  private val K = 10

  /** a01: brute-force exact cosine top-k for probe vectors (vec_id < 5). */
  def bruteForce(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    emb.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        round(GraftFunctions.cosineSim(col("probe_emb"), col("embedding")), 4).as("cos_sim"))
      .select(col("probe_id"), col("cand_id"), col("cos_sim"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= K)
      .orderBy(col("probe_id"), col("rn"))
  }

  /**
   * a03: all-pairs KNN join — every vector's top-3 neighbors among its
   * LSH bucket mates (16 random-hyperplane sign bits). The scale topology
   * for "nearest neighbor per corpus row": bucket shuffle + bounded
   * in-bucket ranking, never an n² cross join; recall grows with multiple
   * hash tables (one here).
   */
  def knnJoin(s: SparkSession, d: String): DataFrame = {
    val dim = 64
    val nPlanes = 16
    val rnd = new java.util.Random(7)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val bit: Int => Column = p => {
      val planeSql = planes(p).map(v => s"${v}D").mkString("array(", ", ", ")")
      when(expr(s"aggregate(zip_with(embedding, $planeSql, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") > 0,
        lit(1L << p)).otherwise(lit(0L))
    }
    val bucketed = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      (0 until nPlanes).map(bit).reduce(_ + _).as("bucket"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("nbr_id"))
    bucketed
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("recs"))
      .filter(size(col("recs")) > 1)
      .select(explode(expr(
        """flatten(transform(recs, r ->
          |  transform(filter(recs, o -> o.vec_id != r.vec_id),
          |            o -> struct(r.vec_id AS vec_id, o.vec_id AS nbr_id,
          |                        r.embedding AS ea, o.embedding AS eb))))""".stripMargin))
        .as("p"))
      .select(col("p.vec_id").as("vec_id"), col("p.nbr_id").as("nbr_id"),
        round(GraftFunctions.cosineSim(col("p.ea"), col("p.eb")), 4).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("vec_id"), col("rn"))
  }

  /**
   * a02: IVF-style ANN — nearest-centroid cell assignment, probe top-2
   * cells. The centroid set is the IVF index's `nlist` (bounded, fits any
   * driver — here a deterministic sample; k-means would change recall,
   * not topology), so assignment is a *narrow projection* against literal
   * centroid vectors: per-cell similarity array → array_max argmax. No
   * crossJoin, no shuffle — at 100 TB the corpus is scanned exactly once
   * to tag cells.
   */
  def ivf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val centroids: Array[(Long, Seq[Float])] = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))

    // (sim, cent_id) structs compare lexicographically → array_max = argmax.
    def simStructs(v: Column): Column = array(centroids.map { case (id, ce) =>
      struct(
        GraftFunctions.cosineSim(v, typedLit(ce)).as("sim"),
        lit(id).as("cent_id"))
    }: _*)

    val assigned = emb.select(col("vec_id"), col("embedding"),
      array_max(simStructs(col("embedding"))).getField("cent_id").as("cell"))

    // Probes keep their 2 best cells: sort the same struct array descending.
    val probeCells = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        simStructs(col("embedding")).as("cells"))
      .select(col("probe_id"), col("probe_emb"),
        explode(expr("slice(transform(reverse(array_sort(cells)), c -> c.cent_id), 1, 2)")).as("cell"))

    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    assigned.join(broadcast(probeCells), Seq("cell"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        round(GraftFunctions.cosineSim(col("probe_emb"), col("embedding")), 4).as("cos_sim"))
      .select(col("probe_id"), col("cand_id"), col("cos_sim"),
        row_number().over(wTop).as("rn"))
      .filter(col("rn") <= K)
      .orderBy(col("probe_id"), col("rn"))
  }
}
