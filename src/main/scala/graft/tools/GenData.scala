package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic-data generator for SCALE testing beyond the driver-provided
 * testdata (sf ≤ 0.1): reproduces the driver tables' schemas, key
 * relationships, cardinality ratios, and distribution shapes (measured
 * from /root/testdata — see SURVEY §6 round-12 notes) at any scale
 * factor, so the heavy kernels can be measured across a decade of data
 * size with DuckDB still able to oracle the results ON THE GENERATED
 * DATA itself.
 *
 * Determinism discipline: every random draw is a pure function of
 * (table salt, row id[, position]) through xxhash64 — generation is
 * distributed, partition-count independent, and byte-reproducible; no
 * java.util.Random, no rand(). The tables scale like the driver's:
 * rows(sf) = 10 × rows(sf/10) for every table except nation/region
 * (fixed 25/5).
 *
 * Usage: runMain graft.tools.GenData <sf> <outDir> [open]
 *   (e.g. 1.0 /tmp/graft_sf1; trailing "open" switches the documents
 *   table to the open-vocabulary Zipf arm — see [[documentsOpenVocab]])
 */
object GenData {

  /** U(0,1) from (salt, id, pos): xxhash64 → 30 mantissa bits. */
  private def u(salt: Long, id: Column, pos: Int = 0): Column =
    (pmod(xxhash64(lit(salt), id, lit(pos)), lit(1073741824L)).cast("double")
      + lit(0.5)) / lit(1073741824.0)

  /** Integer uniform in [0, n). */
  private def ui(salt: Long, id: Column, n: Int, pos: Int = 0): Column =
    pmod(xxhash64(lit(salt), id, lit(pos)), lit(n.toLong)).cast("int")

  /** Standard Gaussian via Box–Muller from two hash uniforms. */
  private def gauss(salt: Long, id: Column, pos: Int): Column =
    sqrt(lit(-2.0) * log(u(salt, id, 2 * pos))) *
      cos(lit(2.0 * math.Pi) * u(salt, id, 2 * pos + 1))

  private def pick(salt: Long, id: Column, vals: Seq[String], pos: Int = 0): Column =
    element_at(array(vals.map(lit): _*), ui(salt, id, vals.length, pos) + 1)

  /** Uniform timestamp in [start, start + spanDays). */
  private def ts(salt: Long, id: Column, start: String, spanDays: Int,
                 pos: Int = 0): Column =
    timestamp_micros((lit(java.sql.Timestamp.valueOf(start + " 00:00:00").getTime)
      * 1000L + (u(salt, id, pos) * lit(spanDays * 86400e6))).cast("long"))

  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val Vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window")
  private val Langs = Seq("en", "en", "en", "de", "fr", "es", "zh") // en-weighted
  private val Adjs = Seq("large", "hot", "blue", "old", "cold", "red", "new", "dark")
  private val Nouns = Seq("ring", "bolt", "plate", "gear", "pin", "cap", "rod", "disk")
  private val Types = Seq("ECONOMY", "MEDIUM", "LARGE", "STANDARD", "PROMO", "SMALL")

  def customer(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      ui(11, col("id"), 25).as("c_nationkey"),
      round(u(12, col("id")) * 11000.0 - 1000.0, 2).as("c_acctbal"),
      pick(13, col("id"), Segments).as("c_mktsegment"))

  def supplier(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      ui(21, col("id"), 25).as("s_nationkey"),
      round(u(22, col("id")) * 11000.0 - 1000.0, 2).as("s_acctbal"))

  def part(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("p_partkey"),
      concat(pick(31, col("id"), Adjs), lit(" "),
        pick(32, col("id"), Nouns)).as("p_name"),
      concat(lit("Brand#"), ui(33, col("id"), 25).cast("string")).as("p_brand"),
      pick(34, col("id"), Types).as("p_type"),
      (ui(35, col("id"), 50) + 1).as("p_size"),
      // deterministic price ladder, as measured in the driver data
      round(lit(900.0) + (col("id") % 1000).cast("double") * 0.1, 1)
        .as("p_retailprice"))

  def orders(s: SparkSession, n: Long, nCust: Long): DataFrame =
    s.range(n).select(col("id").as("o_orderkey"),
      pmod(xxhash64(lit(41L), col("id")), lit(nCust)).as("o_custkey"),
      pick(42, col("id"), Seq("O", "F", "P")).as("o_orderstatus"),
      round(u(43, col("id")) * 499000.0 + 1000.0, 2).as("o_totalprice"),
      ts(44, col("id"), "1995-01-01", 2404).as("o_orderdate"),
      pick(45, col("id"), Priorities).as("o_orderpriority"))

  def lineitem(s: SparkSession, n: Long, nOrders: Long, nParts: Long,
               nSupp: Long): DataFrame =
    s.range(n).select(
      // uniform orderkey → per-order line counts are Binomial(n, 1/nOrders)
      // ≈ Poisson(4), the driver's measured shape (including 0-line orders)
      pmod(xxhash64(lit(51L), col("id")), lit(nOrders)).as("l_orderkey"),
      pmod(xxhash64(lit(52L), col("id")), lit(nParts)).as("l_partkey"),
      pmod(xxhash64(lit(53L), col("id")), lit(nSupp)).as("l_suppkey"),
      (ui(54, col("id"), 7) + 1).as("l_linenumber"),
      (ui(55, col("id"), 50) + 1).cast("double").as("l_quantity"),
      round(u(56, col("id")) * 104100.0 + 900.0, 2).as("l_extendedprice"),
      (ui(57, col("id"), 11).cast("double") / 100.0).as("l_discount"),
      (ui(58, col("id"), 9).cast("double") / 100.0).as("l_tax"),
      pick(59, col("id"), Seq("A", "N", "R")).as("l_returnflag"),
      pick(60, col("id"), Seq("O", "F")).as("l_linestatus"),
      ts(61, col("id"), "1995-01-02", 2497).as("l_shipdate"))

  def events(s: SparkSession, n: Long, nUsers: Long): DataFrame =
    s.range(n).select(col("id").as("event_id"),
      pmod(xxhash64(lit(71L), col("id")), lit(nUsers)).as("user_id"),
      ts(72, col("id"), "2024-01-01", 30).as("ts"),
      pick(73, col("id"), Seq("view", "click", "purchase", "signup", "error"))
        .as("event_type"),
      // Exp(mean 50), the driver's measured value shape
      round(lit(-50.0) * log(lit(1.0) - u(74, col("id"))), 2).as("value"),
      format_string("{\"k\": %d}", ui(75, col("id"), 100)).as("props"))

  /** Text is a pure function of a SOURCE id, so exact duplicates (~0.16%
    * of docs copy an earlier doc, as measured) need no self-join: a dup
    * doc just renders text(g(id)) for an earlier g(id). Rare 'dup'
    * marker word ≈ 0.1% of positions, like the driver corpus. */
  def documents(s: SparkSession, n: Long): DataFrame =
    documentsWith(s, n, word = (srcId, i) =>
      element_at(array(Vocab.map(lit): _*),
        pmod(xxhash64(lit(85L), srcId, i), lit(Vocab.length.toLong))
          .cast("int") + 1))

  /** OPEN-VOCABULARY documents arm (r16 verdict task 1): the default
    * corpus's fixed 30-word vocabulary saturates at scale — every
    * distinct 3-shingle occurs ~1000× at sf10, the adversarial case for
    * content-bucketed dedup, so its decade ratios measure corpus
    * degeneracy as much as algorithm growth. This arm draws each word
    * from a Zipf(1) distribution over a vocabulary that grows with the
    * corpus (Heaps-law-style V ≈ tokens^0.7, so sf1 ≈ 32k distinct
    * words, sf10 ≈ 163k), separating the two effects while keeping
    * every other document property (dup structure, length law, lang,
    * source) and the pure-xxhash64 determinism discipline identical.
    *
    * Zipf draw via inverse CDF: for exponent 1 the CDF is ≈
    * ln(r+1)/ln(V+1), so r = floor(exp(u·ln(V+1))) clamped to [1,V]
    * gives P(r) ∝ ln(1+1/r) ≈ 1/r — head words stay as common as
    * English function words while the tail keeps growing with V. */
  def documentsOpenVocab(s: SparkSession, n: Long): DataFrame = {
    val vocabSize = math.max(1000L, math.round(math.pow(55.0 * n, 0.7)))
    val lnV1 = math.log(vocabSize + 1.0)
    documentsWith(s, n, word = (srcId, i) => {
      val rank = least(greatest(
        floor(exp((pmod(xxhash64(lit(85L), srcId, i), lit(1073741824L))
          .cast("double") + lit(0.5)) / lit(1073741824.0) * lit(lnV1)))
          .cast("long"), lit(1L)), lit(vocabSize))
      concat(lit("w"), rank.cast("string"))
    })
  }

  /** Shared document frame: dup structure (~0.16% copy an earlier doc),
    * rare 'dup' marker ≈ 0.1% of positions, U{10..100} length — only the
    * per-position word draw differs between the vocabulary arms. */
  private def documentsWith(s: SparkSession, n: Long,
      word: (Column, Column) => Column): DataFrame = {
    val isDup = pmod(xxhash64(lit(81L), col("id")), lit(625L)) === 0 && col("id") >= 8
    val srcId = when(isDup,
      col("id") - 1 - pmod(xxhash64(lit(82L), col("id")), lit(7L)))
      .otherwise(col("id"))
    val nWords = ui(83, srcId, 91) + lit(10) // U{10..100}
    val text = array_join(transform(sequence(lit(1), nWords), i =>
      when(pmod(xxhash64(lit(84L), srcId, i), lit(1000L)) === 0, lit("dup"))
        .otherwise(word(srcId, i))), " ")
    s.range(n).select(col("id").as("doc_id"), text.as("text"),
      pick(86, col("id"), Langs).as("lang"),
      concat(lit("src"), ui(87, col("id"), 20).cast("string")).as("source"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  /** Unit-normalized 64-dim float vectors with weak label structure
    * (within-label cosine ≈ 0.07, the driver's measured separation):
    * v = normalize(N(0, I) + 0.57 · center_label). */
  def embeddings(s: SparkSession, n: Long): DataFrame = {
    val dim = 64
    val label = ui(91, col("id"), 10)
    val raw = transform(sequence(lit(0), lit(dim - 1)), i =>
      gauss(92, col("id") * 64 + i, 0) +
        lit(0.57) * gauss(93, label.cast("long") * 64 + i, 0))
    s.range(n)
      .select(col("id").as("vec_id"), label.as("label"), raw.as("r"))
      .select(col("vec_id"), col("label"), col("r"),
        sqrt(aggregate(col("r"), lit(0.0), (a, x) => a + x * x)).as("nrm"))
      .select(col("vec_id"),
        transform(col("r"), x => (x / col("nrm")).cast("float")).as("embedding"),
        col("label"))
  }

  def nation(s: SparkSession): DataFrame =
    s.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id").cast("string")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))

  def region(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
  }

  def main(args: Array[String]): Unit = {
    val sf = args(0).toDouble
    val out = args(1)
    // optional 3rd arg "open": open-vocabulary documents arm (all other
    // tables identical — the two arms differ ONLY in the word draw)
    val openVocab = args.length > 2 && args(2) == "open"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.get(s"local[$cpus]", cpus.toInt)
    def w(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
    val nC = (150000 * sf).toLong
    val nS = (10000 * sf).toLong
    val nP = (200000 * sf).toLong
    val nO = (1500000 * sf).toLong
    val nL = (6000000 * sf).toLong
    val bigParts = math.max(4, (32 * sf).toInt)
    w(customer(spark, nC), "customer", math.max(2, bigParts / 4))
    w(supplier(spark, nS), "supplier", 1)
    w(part(spark, nP), "part", math.max(2, bigParts / 4))
    w(orders(spark, nO, nC), "orders", bigParts)
    w(lineitem(spark, nL, nO, nP, nS), "lineitem", bigParts)
    w(events(spark, (1000000 * sf).toLong, (15000 * sf).toLong), "events",
      math.max(2, bigParts / 2))
    val docs = if (openVocab) documentsOpenVocab(spark, (50000 * sf).toLong)
               else documents(spark, (50000 * sf).toLong)
    w(docs, "documents", math.max(2, bigParts / 2))
    w(embeddings(spark, (20000 * sf).toLong), "embeddings", math.max(2, bigParts / 2))
    w(nation(spark), "nation", 1)
    w(region(spark), "region", 1)
    println(s"[gendata] sf=$sf${if (openVocab) " (open-vocab)" else ""} done -> $out")
    spark.stop()
  }
}
