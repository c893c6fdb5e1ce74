package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}

/**
 * Small-file compaction — the table-maintenance pass every long-lived
 * 100 TB parquet dataset needs: streaming/batch ingestion leaves
 * thousands of KB-sized files per partition, and scan throughput dies on
 * per-file open/footer costs long before raw bytes matter.
 *
 * Compaction here is range-repartition + sort-within-partition on a
 * chosen column: output files are (a) sized by count, (b) value-ordered,
 * so parquet row-group min/max statistics give downstream range scans
 * real file-level pruning.
 */
object Compaction {

  /** Files needed to land `path` at ~targetFileBytes per file (driver-side
    * metadata listing only — no data read). */
  def targetFilesFor(s: SparkSession, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
  }

  /** Rewrite `inPath` as `nFiles` range-sorted parquet files on `sortCol`.
    * repartitionByRange samples the key distribution, so output files are
    * balanced even under value skew. */
  def compact(s: SparkSession, inPath: String, outPath: String,
              sortCol: String, nFiles: Int): Unit =
    s.read.parquet(inPath)
      .repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(outPath)

  /**
   * Z-order (Morton-interleaved) compaction — the multi-column layout a
   * single-column sort can't give: `compact` makes file min/max stats
   * tight on ONE column and useless on every other, while interleaving
   * the bit-codes of k columns shrinks EVERY clustered column's per-file
   * span to ~range/files^(1/k), so selective predicates on any of them
   * prune files (the layout behind Delta/Iceberg OPTIMIZE ZORDER).
   *
   * Each column is quantile-bucketed to 2^bits levels — rank, not
   * (min,max) scaling, so skew can't collapse the code space — via
   * approxQuantile boundaries (bounded driver state: k·2^bits doubles,
   * one sketch pass). The bucket fold runs ONCE per row per column (a
   * one-element `transform` lambda binds it; a bare multi-referenced
   * expression would be re-inlined per bit by CollapseProject — the t01
   * lesson), then bits interleave into one long that drives
   * range-repartition + in-partition sort. Everything after the sketch
   * pass is one narrow projection + one range exchange.
   */
  def zOrder(s: SparkSession, inPath: String, outPath: String,
             zCols: Seq[String], nFiles: Int, bits: Int = 6): Unit = {
    val k = zCols.size
    require(k >= 1 && k * bits <= 62, "morton code must fit in a long")
    val df = s.read.parquet(inPath)
    val levels = 1 << bits
    val probs = (1 until levels).map(_.toDouble / levels).toArray
    val morton = zCols.zipWithIndex.map { case (c, i) =>
      val thresholds = df.stat.approxQuantile(c, probs, 0.001)
      val arr = thresholds.map(v => s"${v}D").mkString("array(", ", ", ")")
      // bucket = #boundaries <= x, spread = bucket's bit b → morton bit b*k+i
      expr(s"""element_at(transform(
        array(aggregate($arr, 0, (acc, t) -> acc + IF(CAST($c AS DOUBLE) >= t, 1, 0))),
        bkt -> aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT),
          (acc, b) -> acc + shiftleft(CAST(shiftright(bkt, b) & 1 AS BIGINT),
                                      b * $k + $i))), 1)""")
    }.reduce(_ + _)
    df.withColumn("__z", morton)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
  }
}
