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

  /**
   * c04: data-quality audit — the dbt-test / Great-Expectations class of
   * checks a production pipeline gates every load on, as ONE declarative
   * report: referential integrity (FK orphans), key uniqueness, null
   * scans, domain ranges, cross-table temporal consistency (lines
   * shipped before their order — the check that actually trips on this
   * synthetic data, since ship and order dates are independent), content
   * duplication, and freshness windows. Output one row per check:
   * (tbl, chk, n_checked, n_violations, pass).
   *
   * Scale shape: every check is ONE aggregate over a pruned scan
   * (map-side combined to a single row); the FK checks reduce the dim
   * side to a distinct-key frame first (an index probe, never a
   * corpus-× join — and broadcast when small); the temporal check rides
   * the orderkey join lineitem⋈orders both already need. The union is
   * nine 1-row frames — plan cost is the scans, not the report.
   */
  def dataQuality(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val ev = Tables.events(s, d)
    val docs = Tables.documents(s, d)

    def report(tbl: String, chk: String, df: DataFrame,
               violation: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("n_checked"),
        sum(when(violation, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(tbl).as("tbl"), lit(chk).as("chk"),
          col("n_checked"), col("n_violations"))

    // ONE lineitem pass serves both row-level lineitem checks (r15
    // staging audit): the left join against the DISTINCT orderkey dim
    // preserves lineitem's row count exactly (at most one match per
    // row), so fk-orphan and discount-range aggregate over the same
    // frame with identical n_checked = |lineitem| — one corpus scan
    // instead of two, and the two report rows explode from the single
    // aggregate row (no second action, no exchange-reuse dependence).
    // The temporal check below keeps its OWN join against RAW orders:
    // its n_checked counts (line, order) MATCHES — a different
    // cardinality under duplicate orderkeys that a shared frame would
    // silently change (the c04 counter-example to further fusion; a
    // data-quality check may not assume the key it audits is unique).
    val liRowChecks = li.select(col("l_orderkey"), col("l_discount"))
      .join(ord.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_fk"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("v_range"))
      .select(explode(array(
        struct(lit("lineitem").as("tbl"), lit("fk_orderkey_orphan").as("chk"),
          col("n").as("n_checked"), col("v_fk").as("n_violations")),
        struct(lit("lineitem").as("tbl"), lit("range_discount").as("chk"),
          col("n").as("n_checked"), col("v_range").as("n_violations")))).as("r"))
      .select(col("r.tbl"), col("r.chk"), col("r.n_checked"), col("r.n_violations"))
    val fkOrdCust = report("orders", "fk_custkey_orphan",
      ord.select(col("o_custkey"))
        .join(cust.select(col("c_custkey")).distinct(),
          col("o_custkey") === col("c_custkey"), "left_outer"),
      col("c_custkey").isNull)
    val pkOrders = report("orders", "pk_orderkey_duplicate",
      ord.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n")),
      col("n") > 1)
    val nullName = report("customer", "null_name",
      cust.select(col("c_name")), col("c_name").isNull)
    // same fusion for the two events checks: both are row-level over the
    // full table (identical n_checked), so one scan + one aggregate
    // serves both report rows
    val evRowChecks = ev.select(col("value"), col("ts"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("v_range"),
        sum(when(col("ts") < lit("2024-01-01").cast("timestamp") ||
          col("ts") >= lit("2024-02-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("v_fresh"))
      .select(explode(array(
        struct(lit("events").as("tbl"), lit("range_value_negative").as("chk"),
          col("n").as("n_checked"), col("v_range").as("n_violations")),
        struct(lit("events").as("tbl"), lit("ts_outside_window").as("chk"),
          col("n").as("n_checked"), col("v_fresh").as("n_violations")))).as("r"))
      .select(col("r.tbl"), col("r.chk"), col("r.n_checked"), col("r.n_violations"))
    val dupText = report("documents", "duplicate_text",
      docs.groupBy(md5(col("text"))).agg(count(lit(1)).as("n")),
      col("n") > 1)
    val shipBefore = report("lineitem", "shipped_before_order",
      li.select(col("l_orderkey"), col("l_shipdate"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey")),
      col("l_shipdate") < col("o_orderdate"))
    Seq(fkOrdCust, pkOrders, nullName, evRowChecks, dupText, shipBefore)
      .foldLeft(liRowChecks)(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("tbl"), col("chk"))
  }
}
