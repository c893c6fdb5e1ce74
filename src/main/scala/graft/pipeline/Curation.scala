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

  /**
   * c03: multi-signal curation decision table — the composition a modern
   * corpus pipeline actually ships (FineWeb/RefinedWeb shape): document-
   * local quality (t02 kernel) × cross-document boilerplate coverage
   * (d14) × corpus-LM fluency (t19), joined per doc into one verdict +
   * a weighted composite score for threshold tuning.
   *
   * Determinism: the composite is computed from the ALREADY-ROUNDED
   * per-signal outputs (4/6 dp) with a fixed left-to-right expression
   * tree, so both engines evaluate the identical IEEE chain. Scale: all
   * three signal frames are doc-keyed reductions of the same corpus;
   * the joins are co-keyed hash joins on doc_id — no signal ever
   * re-shuffles document text (each sub-operator's own posture applies).
   * Docs too short to produce bigrams survive via the left join with a
   * -10.0 fluency floor.
   */
  def fullCuration(s: SparkSession, d: String): DataFrame = {
    val q = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
    val bp = graft.dedup.Dedup.boilerplate(s, d)
      .select(col("doc_id"), col("bp_frac"))
    val lm = TextAnalysis.bigramLm(s, d)
      .select(col("doc_id"), col("avg_logp"))
    q.join(bp, Seq("doc_id")).join(lm, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"), col("quality"), col("bp_frac"),
        coalesce(col("avg_logp"), lit(-10.0)).as("fluency"))
      // composite in EXACT DECIMAL arithmetic over the already-rounded
      // signals (SQL decimal literals like 0.5 parse as DECIMAL in both
      // engines; decimal × decimal and + are exact, fluency/10 becomes
      // ×0.1 to stay in decimals) — a double chain here lands on
      // rounding midpoints (e.g. 0.8615795) where engines fork
      .selectExpr("doc_id", "lang", "quality", "bp_frac", "fluency",
        """CAST(round(
             CAST(quality AS DECIMAL(18,6)) * 0.5
             + (1.0 - CAST(bp_frac AS DECIMAL(18,4))) * 0.3
             + (1.0 + CAST(GREATEST(CAST(-1.0 AS DECIMAL(18,5)),
                 LEAST(CAST(0.0 AS DECIMAL(18,5)),
                   CAST(fluency AS DECIMAL(18,4)) * 0.1)) AS DECIMAL(18,5))) * 0.2,
           6) AS DOUBLE) AS composite""",
        "quality >= 0.5 AND bp_frac < 0.2 AND fluency >= -4.0 AS keep")
      .orderBy(col("doc_id"))
  }
}
