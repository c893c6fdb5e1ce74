package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import java.sql.Timestamp

import graft.text.TextAnalysis

/** One incoming document as consumed by the streaming ingestion pipeline. */
case class DocEvent(doc_id: Long, ts: Timestamp, text: String, source: String)

/**
 * Streaming corpus ingestion — the batch curation pipeline
 * ([[graft.pipeline.Curation]]) as a continuous topology: score quality on
 * arrival, gate, dedup by content hash within a watermark horizon, land to
 * parquet per micro-batch. Swap the MemoryStream/file source for Kafka and
 * the same code ingests a production crawl feed; the watermark bounds
 * dedup state so an unbounded stream cannot grow executor state
 * unboundedly (content seen farther apart than the horizon is left to the
 * periodic batch dedup sweep — the standard lambda split).
 */
object CorpusIngest {

  /** Quality gate + watermarked content-hash dedup. Score and hash are the
    * SAME kernels as the batch pipeline (one scoring discipline, two
    * execution modes). */
  def ingest(docs: DataFrame, minScore: Double = 0.3): DataFrame =
    docs
      .withColumn("score", round(TextAnalysis.qualityScore(col("text")), 6))
      .filter(col("score") >= minScore)
      .withColumn("h", md5(lower(trim(col("text")))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")

  /** Land curated docs to parquet per micro-batch (the production landing
    * path; foreachBatch so each batch is one atomic parquet append). */
  def startToParquet(docs: DataFrame, outDir: String,
                     checkpointDir: String): StreamingQuery =
    ingest(docs).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(col("doc_id"), col("ts"), col("source"),
            col("score"), col("h"))
          .write.mode("append").parquet(outDir)
      }
      .start()
}
