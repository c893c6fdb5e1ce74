package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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
}
