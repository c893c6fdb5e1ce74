package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Bucketed-table helpers: pre-shuffling fact tables once at write time so
 * repeated equi-joins/aggregations on the bucket key run with NO exchange.
 * At 100 TB this converts every recurring join on the key from a full
 * shuffle into a local zip of co-located buckets — the single biggest
 * lever for recurring-pipeline cost (the same trick as Presto/Hive
 * bucketed tables; spec-pinned by BucketingSpec's no-Exchange assertion).
 */
object Bucketing {

  /** Write `df` as a managed bucketed table (sorted within buckets so
    * sort-merge joins skip the sort too). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String,
                    moreKeys: String*): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
}
