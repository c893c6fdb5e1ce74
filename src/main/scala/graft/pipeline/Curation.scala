package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
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

  /** c02: corpus reporting — per (source, lang) doc counts, mean quality,
    * token totals. The rollup a pipeline publishes after each curation run. */
  def corpusStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val nTokens = size(split(trim(col("text")), "\\s+"))
    Tables.documents(s, d)
      .select(col("source"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("score"), nTokens.as("n_tok"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("score").cast(DecimalType(18, 8))).cast("double") / count(lit(1)))
          .as("avg_score"),
        sum(col("n_tok").cast("long")).as("total_tokens"))
      .orderBy(col("source"), col("lang"))
  }

  /** c01: curated corpus (doc_id, lang, score) after quality + dedup.
    *
    * One scan: score + content-hash in the same projection, then the text
    * column is dropped BEFORE the dedup shuffle — only (doc_id, lang,
    * score, h) move, never the document bodies. The keeper filter is a
    * min-over-hash window on that slim frame (vs the groupBy+semi-join
    * formulation, which scanned and scored the corpus twice). */
  def curate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NFC-normalize before content-hashing: composed vs decomposed forms
    // of the same text (café typed two ways) must dedup together in a
    // real crawl corpus. Codegen-native expression with an
    // allocation-free already-normalized fast path, so the common ASCII
    // document pays one isNormalized scan; oracle replays it with
    // DuckDB's nfc_normalize.
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("score_raw"),
        md5(lower(trim(GraftFunctions.normalizeUnicode(col("text"))))).as("h"))
      .filter(col("score_raw") >= 0.5)
    scored
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("lang"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("doc_id"))
  }
}
