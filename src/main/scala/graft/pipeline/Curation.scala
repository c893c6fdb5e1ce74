package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextAnalysis

/**
 * End-to-end corpus curation: the composition a training-data pipeline
 * actually runs — quality gate → exact dedup (keep lowest doc_id) →
 * curated corpus with scores. Every stage is the already-verified
 * operator; this wires them into one declarative plan (Catalyst fuses the
 * stages — the text is scanned once for scoring + hashing).
 */
object Curation {

  /** c01: curated corpus (doc_id, lang, score) after quality + dedup. */
  def curate(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("score_raw"))
      .filter(col("score_raw") >= 0.5)
    val keepers = scored
      .groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    scored.join(keepers, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("doc_id"))
  }
}
