package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Cast, DateFormatClass, DatePart, DayOfYear, Divide, EqualTo, Expression, ExpressionInfo, Floor, GetJsonObject, If, LastDay, Literal, Multiply, ParseUrl, RLike, RegExpExtract, Signum, StringLocate, TypeOf, UnixMicros, WeekDay, WeekOfYear}
import org.apache.spark.sql.catalyst.expressions.aggregate.{First, HyperLogLogPlusPlus}
import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType, LongType, StringType, TimestampType}
import org.apache.spark.sql.GraftBridge

/**
 * Typed Column facade over the graft native expressions — usable directly
 * from the DataFrame API without any registration, mirroring
 * `org.apache.spark.sql.functions`.
 */
object GraftFunctions {
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  /** Cosine similarity of two array<float> embedding columns. */
  def cosineSim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  /** Exact sequential-fold dot product of two array<double> columns —
    * bit-identical to aggregate(zip_with(a, b, _*_), 0D, _+_) without
    * the CodegenFallback HOF cost. */
  def dotD(a: Column, b: Column): Column = c(DotProductD(e(a), e(b)))

  /** Float-corpus dot against a double array (the hyperplane kernel):
    * exact per-element float->double widening, then the same fold. */
  def dotFD(a: Column, b: Column): Column = c(FloatDotProductD(e(a), e(b)))

  /** Equal-position count of two array<bigint> signatures — the
    * zip_with/IF/aggregate agreement fold as one codegen call. */
  def zipEqCount(a: Column, b: Column): Column = c(ZipEqCount(e(a), e(b)))

  /** k-permutation MinHash signature (array<bigint>) of an array<string>. */
  def minhashSig(shingles: Column, k: Int): Column = c(MinHashSignature(e(shingles), k))

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))

  /** Winnowing fingerprint set: distinct w-window minima of per-shingle
    * hash64 values (MOSS), one JVM pass per row. */
  def winnowFps(shingles: Column, w: Int): Column = c(WinnowFingerprints(e(shingles), w))

  /** Per-position k-word shingle hash64s (array<bigint>) of a word-array
    * column — hash64(concat_ws(' ', slice)) without the string build. */
  def shingleHash64(words: Column, k: Int): Column = c(ShingleHash64(e(words), k))

  /** Normalized rolling-hash fingerprint (bigint) of a string column. */
  def fingerprint64(text: Column): Column = c(RollingFingerprint(e(text)))

  /** Raw FNV-1a64+splitmix64 hash of a string column (no normalization).
    * Compose with bit_xor for Presto's order-independent checksum(). */
  def hash64(text: Column, seed: Long = 0L): Column = c(Hash64(e(text), seed))

  /** Fused hashed-ngram feature buckets (array<bigint>) of a token-array
    * column: "u "-marked unigrams + "b "-marked bigrams through hash64
    * into 2^bits buckets, one JVM pass per row (the t25 DSIR
    * featurizer). */
  def hashedNgramBuckets(words: Column, seed: Long, bits: Int): Column =
    c(HashedNgramBuckets(e(words), seed, bits))

  /** Fused hashed-linear classifier score
    * (struct<n_feat, score_sum>) of a token-array column — the t23
    * fastText/CCNet-shaped quality filter's per-row kernel. */
  def hashedNgramScore(words: Column, seed: Long): Column =
    c(HashedNgramScore(e(words), seed))

  /** Hamming distance between two bigint bit-vectors. */
  def hamming64(a: Column, b: Column): Column = c(Hamming64(e(a), e(b)))

  /** Geometric mean aggregate over positive values (Presto
    * geometric_mean; Spark lacks it). Algebraic buffer — partial
    * aggregation and codegen for free. */
  def geometricMean(x: Column): Column =
    c(GeometricMean(e(x)).toAggregateExpression())

  /** Great-circle distance in km between two (lat, lon) points
    * (Presto great_circle_distance). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    c(HaversineKm(e(lat1.cast("double")), e(lon1.cast("double")),
      e(lat2.cast("double")), e(lon2.cast("double"))))

  /** Ray-casting point-in-closed-ring test (Presto ST_Contains,
    * point-in-ring case); xs/ys are the ring's vertex coordinate
    * arrays with the first vertex repeated last. */
  def pointInPolygon(px: Column, py: Column, xs: Column, ys: Column): Column =
    c(PointInPolygon(e(px.cast("double")), e(py.cast("double")), e(xs), e(ys)))

  /** Bing-maps quadkey of the tile containing (lat, lon) at zoom 1..23
    * (Presto bing_tile_at + bing_tile_quadkey): the geo join/rollup key
    * whose prefix IS the parent tile at any coarser zoom. */
  def bingTileQuadkey(lat: Column, lon: Column, zoom: Int): Column =
    c(BingTileQuadkey(e(lat.cast("double")), e(lon.cast("double")), zoom))

  /** Bloom-filter aggregate: a string column reduced to a constant
    * `numBits/8`-byte membership sketch (map-side-combined byte-OR
    * merge). Pair with [[bloomMightContain]] as a prefilter, then
    * exact-confirm — false positives never reach a confirmed result. */
  def bloomBuild(x: Column, numBits: Int, numHashes: Int): Column =
    c(BloomFilterBuild(e(x), numBits, numHashes).toAggregateExpression())

  /** Probe a [[bloomBuild]] filter: false = definitely absent. */
  def bloomMightContain(bloom: Column, x: Column, numHashes: Int): Column =
    c(BloomMightContain(e(bloom), e(x), numHashes))

  /** Unicode normalization (Presto normalize(string, form)); form is one
    * of NFC | NFD | NFKC | NFKD, default NFC like Presto's one-arg form.
    * Codegen-native with an allocation-free already-normalized fast
    * path — cheap enough to run as the first cleaning step of a corpus
    * pipeline. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    c(NormalizeUnicode(e(text), form))

  /** Histogram-sketch aggregate over 1-based bin indices (Presto
    * qdigest_agg parity for the graft deterministic sketch): a dense
    * array<bigint> of bin counts, constant-sized per group. */
  def quantileSketchAgg(bin: Column): Column =
    c(QuantileSketchAgg(e(bin)).toAggregateExpression())

  /** Merge already-reduced sketches by elementwise addition (Presto
    * merge(qdigest) parity) — the rollup level of a two-level percentile
    * topology, never re-touching the corpus. */
  def quantileSketchMerge(sketch: Column): Column =
    c(QuantileSketchMerge(e(sketch)).toAggregateExpression())

  /** The sketch's CDF read: smallest 1-based bin whose cumulative count
    * reaches ceil(total * p); `element_at(edges, ...)` turns it into the
    * quantile VALUE against the shared edge table. */
  def sketchQuantileBin(sketch: Column, p: Column): Column =
    c(SketchQuantileBin(e(sketch), e(p.cast("double"))))

  /** Histogram bin of x against a sorted snapped edge table: count of
    * edges <= x (clamped >= 1), by codegen binary search — the exact
    * definitional bin decision the quantile-sketch topologies share
    * with their oracles. */
  def edgeBin(edges: Column, x: Column): Column =
    c(EdgeBin(e(edges), e(x.cast("double"))))

  /** Closed-segment intersection (Presto ST_Intersects, segment-segment
    * core): true on proper crossings, endpoint touches, and collinear
    * overlap. Pair with a bounding-box prefilter; at scale the pruning
    * form is a tile join key ([[bingTileQuadkey]]). */
  def stIntersects(x1: Column, y1: Column, x2: Column, y2: Column,
                   x3: Column, y3: Column, x4: Column, y4: Column): Column =
    c(SegmentsIntersect(IndexedSeq(x1, y1, x2, y2, x3, y3, x4, y4)
      .map(col => e(col.cast("double")))))

  /** Distance from a point to a closed segment (Presto ST_Distance,
    * point-to-segment core). */
  def stDistance(px: Column, py: Column, x1: Column, y1: Column,
                 x2: Column, y2: Column): Column =
    c(PointSegmentDist(IndexedSeq(px, py, x1, y1, x2, y2)
      .map(col => e(col.cast("double")))))

  /** Shoelace area of a closed ring (Presto ST_Area, polygon-shell
    * case); xs/ys are the ring's vertex coordinate arrays with the
    * first vertex repeated last, as in [[pointInPolygon]]. */
  def stArea(xs: Column, ys: Column): Column = c(RingArea(e(xs), e(ys)))

  /** Perimeter of a closed ring (Presto ST_Length/ST_Perimeter core). */
  def stLength(xs: Column, ys: Column): Column = c(RingLength(e(xs), e(ys)))

  /** X coordinate of the area-weighted polygon centroid (Presto
    * ST_X(ST_Centroid(g))); degenerate rings degrade to the vertex
    * mean, the JTS line/point fallback. */
  def stCentroidX(xs: Column, ys: Column): Column = c(RingCentroid(e(xs), e(ys), 0))

  /** Y coordinate of the area-weighted polygon centroid. */
  def stCentroidY(xs: Column, ys: Column): Column = c(RingCentroid(e(xs), e(ys), 1))

  /** Parse WKT text (Presto ST_GeometryFromText; POINT / LINESTRING /
    * single-ring POLYGON subset) into struct(gtype, xs, ys) — the
    * coordinate-array form every ST_* kernel here consumes. Null on
    * malformed input (total-function contract; see
    * [[graft.functions.Kernels.wktParse]]). */
  def stGeometryFromText(wkt: Column): Column = c(WktParse(e(wkt)))

  /** Format (gtype, xs, ys) back to WKT (Presto ST_AsText) — the exact
    * inverse of [[stGeometryFromText]]. */
  def stAsText(gtype: Column, xs: Column, ys: Column): Column =
    c(WktText(e(gtype), e(xs), e(ys)))

  /** One greedy BPE merge pass over a space-joined symbol string (the
    * t21 trainer's per-iteration kernel). */
  def bpeMerge(syms: Column, a: Column, b: Column): Column =
    c(BpeMerge(e(syms), e(a), e(b)))

  /** Shoelace area of a WKT POLYGON, holes subtracted (Presto ST_Area
    * over a multi-ring polygon); null on malformed text. */
  def stAreaWkt(text: Column): Column = c(StAreaWkt(e(text)))

  /** Point containment in a WKT POLYGON honoring holes (Presto
    * ST_Contains, polygon-with-interior-rings case); null on malformed
    * text. */
  def stContainsWkt(text: Column, x: Column, y: Column): Column =
    c(StContainsWkt(e(text), e(x.cast("double")), e(y.cast("double"))))

  /** Hole count of a WKT POLYGON (Presto ST_NumInteriorRing; null for
    * MULTIPOLYGON — Presto defines it on polygons only). */
  def stNumInteriorRings(text: Column): Column =
    c(StNumInteriorRings(e(text)))

  /** Part count of a WKT POLYGON / MULTIPOLYGON (Presto
    * ST_NumGeometries). */
  def stNumGeometries(text: Column): Column = c(StNumGeometries(e(text)))

  /** Extract a foldable integral argument from a SQL call site. A plain SQL
    * integer literal parses as Literal(_, IntegerType) (java.lang.Integer),
    * so a blind asInstanceOf[Long] would ClassCastException on the natural
    * call form `hash64(c, 42)`; accept both widths and fail non-literals
    * with a clear message naming the function. */
  private[functions] def literalLong(fn: String, arg: Expression): Long = arg match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType)   => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an integer literal, got ${other.sql}")
  }

  private[functions] def literalInt(fn: String, arg: Expression): Int =
    literalLong(fn, arg).toInt

  private[functions] def literalDouble(fn: String, arg: Expression): Double = arg match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be a numeric literal, got ${other.sql}")
  }

  /** Extract a foldable string argument (e.g. a normalization form). */
  private[functions] def literalString(fn: String, arg: Expression): String = arg match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be a string literal, got ${other.sql}")
  }

  /** The one SQL surface, consumed by BOTH [[install]] and
    * [[GraftExtensions]] — a single table so the two registration paths
    * can never drift (an extensions-configured session and an
    * install()-based one expose identical function sets by
    * construction). */
  private val coreBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (args => CosineSimilarity(args(0), args(1))),
    "minhash_sig" -> (args => MinHashSignature(args(0),
      literalInt("minhash_sig", args(1)))),
    "simhash64" -> (args => SimHash64(args.head)),
    "winnow_fps" -> (args => WinnowFingerprints(args(0),
      literalInt("winnow_fps", args(1)))),
    "shingle_hash64" -> (args => ShingleHash64(args(0),
      literalInt("shingle_hash64", args(1)))),
    "fingerprint64" -> (args => RollingFingerprint(args.head)),
    "hamming64" -> (args => Hamming64(args(0), args(1))),
    "hash64" -> (args => Hash64(args.head,
      if (args.length > 1) literalLong("hash64", args(1)) else 0L)),
    "hashed_ngram_buckets" -> (args => HashedNgramBuckets(args(0),
      literalLong("hashed_ngram_buckets", args(1)),
      literalInt("hashed_ngram_buckets", args(2)))),
    "hashed_ngram_score" -> (args => HashedNgramScore(args(0),
      literalLong("hashed_ngram_score", args(1)))),
    "st_area_wkt" -> (args => StAreaWkt(args.head)),
    // SQL literals like 1.5 parse as DECIMAL(2,1) — coerce coordinates
    // to double so the SQL surface matches the typed-column surface
    "st_contains_wkt" -> (args => StContainsWkt(args(0),
      Cast(args(1), DoubleType), Cast(args(2), DoubleType))),
    "st_num_interior_rings" -> (args => StNumInteriorRings(args.head)),
    "st_num_geometries" -> (args => StNumGeometries(args.head)),
    "geometric_mean" -> (args => GeometricMean(args.head).toAggregateExpression()),
    "haversine_km" -> (args => HaversineKm(args(0), args(1), args(2), args(3))),
    "point_in_polygon" -> (args => PointInPolygon(args(0), args(1), args(2), args(3))),
    "bing_tile_quadkey" -> (args => BingTileQuadkey(args(0), args(1),
      literalInt("bing_tile_quadkey", args(2)))),
    "bloom_build" -> (args => BloomFilterBuild(args(0),
      literalInt("bloom_build", args(1)),
      literalInt("bloom_build", args(2))).toAggregateExpression()),
    "bloom_might_contain" -> (args => BloomMightContain(args(0), args(1),
      literalInt("bloom_might_contain", args(2)))),
    "normalize_unicode" -> (args => NormalizeUnicode(args.head,
      if (args.length > 1) literalString("normalize_unicode", args(1)) else "NFC")),
    "quantile_sketch_agg" -> (args => QuantileSketchAgg(args.head).toAggregateExpression()),
    "quantile_sketch_merge" -> (args => QuantileSketchMerge(args.head).toAggregateExpression()),
    "sketch_quantile_bin" -> (args => SketchQuantileBin(args(0), args(1))),
    "edge_bin" -> (args => EdgeBin(args(0), args(1))),
    "st_intersects" -> (args => SegmentsIntersect(args.toIndexedSeq)),
    "st_distance" -> (args => PointSegmentDist(args.toIndexedSeq)),
    "st_area" -> (args => RingArea(args(0), args(1))),
    "st_length" -> (args => RingLength(args(0), args(1))),
    "st_centroid_x" -> (args => RingCentroid(args(0), args(1), 0)),
    "st_centroid_y" -> (args => RingCentroid(args(0), args(1), 1)),
    "st_geometry_from_text" -> (args => WktParse(args.head)),
    "st_as_text" -> (args => WktText(args(0), args(1), args(2))),
    "bpe_merge" -> (args => BpeMerge(args(0), args(1), args(2))),
    // Presto text/digest stragglers (r15): word_stem (Porter), the
    // user-facing ngrams(), and the keyed digest. crc32/xxhash64 are
    // Spark builtins already on the SQL surface — no registration needed.
    // word_stem accepts Presto's 2-arg form; only the default 'en'
    // stemmer (Porter) is served, any other language is refused loudly
    "word_stem" -> (args => {
      if (args.length > 1) {
        val lang = literalString("word_stem", args(1))
        require(lang == "en", s"word_stem: only 'en' is supported, got '$lang'")
      }
      WordStem(args.head)
    }),
    "ngrams" -> (args => NGrams(args(0), literalInt("ngrams", args(1)))),
    "hmac_md5" -> (args => HmacDigest(args(0), args(1), "HmacMD5")),
    "hmac_sha1" -> (args => HmacDigest(args(0), args(1), "HmacSHA1")),
    "hmac_sha256" -> (args => HmacDigest(args(0), args(1), "HmacSHA256")),
    "hmac_sha512" -> (args => HmacDigest(args(0), args(1), "HmacSHA512")))

  /** Presto-dialect spellings (r16 verdict task 2): the reference UX is a
    * Presto prompt (reference presto-mgr.py:205 hands the user a Presto
    * CLI), and literal Presto SQL names whose SEMANTICS all exist here
    * should not fail on spelling. Every alias is a thin composition of
    * Spark catalyst expressions — no new kernels, codegen end-to-end.
    * Spark-builtin collisions (log2, from_unixtime, position, strpos's
    * absence…) are NOT overridden: install()/GraftExtensions skip names
    * the registry already serves, so Spark semantics win where the two
    * dialects share a name (from_unixtime returns Spark's STRING, not
    * Presto's timestamp — CAST(... AS TIMESTAMP) recovers it; pinned in
    * CliSpec). */
  private[functions] val prestoDialect: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // approx_distinct(x[, e]) — Presto's HLL cardinality (default max
    // standard error 0.023) over Spark's HLL++ aggregate. Exact in
    // sparse mode (small cardinalities), approximate at scale, like
    // Presto's.
    "approx_distinct" -> (args => HyperLogLogPlusPlus(args.head,
      if (args.length > 1) literalDouble("approx_distinct", args(1)) else 0.023)
      .toAggregateExpression()),
    // json_extract_scalar returns NULL for non-scalar matches (objects/
    // arrays) where Spark's get_json_object would return their JSON
    // text. Native expression: classification by PARSED node type, so a
    // string scalar whose value merely looks like JSON ({"a":"[x]"})
    // stays a string (r17 ADVICE — the old text-shape RLike misread it)
    "json_extract_scalar" -> (args => JsonExtractScalar(args(0), args(1))),
    "url_extract_host" -> (args => ParseUrl(Seq(args.head, Literal("HOST")))),
    "url_extract_path" -> (args => ParseUrl(Seq(args.head, Literal("PATH")))),
    "url_extract_protocol" -> (args => ParseUrl(Seq(args.head, Literal("PROTOCOL")))),
    "url_extract_query" -> (args => ParseUrl(Seq(args.head, Literal("QUERY")))),
    "url_extract_fragment" -> (args => ParseUrl(Seq(args.head, Literal("REF")))),
    // Spark's parse_url has no PORT key — take the :port suffix of the
    // authority (never confused with a path/query colon), BIGINT like
    // Presto, NULL when absent
    "url_extract_port" -> (args => {
      val port = RegExpExtract(ParseUrl(Seq(args.head, Literal("AUTHORITY"))),
        Literal(":([0-9]+)$"), Literal(1))
      If(EqualTo(port, Literal("")), Literal(null, LongType), Cast(port, LongType))
    }),
    "url_extract_parameter" -> (args =>
      ParseUrl(Seq(args(0), Literal("QUERY"), args(1)))),
    // to_unixtime returns DOUBLE seconds with the fractional part
    // (Spark's unix_timestamp truncates to whole seconds)
    "to_unixtime" -> (args => Divide(
      Cast(UnixMicros(Cast(args.head, TimestampType)), DoubleType),
      Literal(1e6))),
    // strpos/index: 1-based position, 0 if absent, BIGINT like Presto
    // (note swapped argument order vs Spark's locate(substr, str))
    "strpos" -> (args => Cast(StringLocate(args(1), args(0), Literal(1)), LongType)),
    "index" -> (args => Cast(StringLocate(args(1), args(0), Literal(1)), LongType)),
    // arbitrary: any non-null value of the group
    "arbitrary" -> (args => First(args.head, ignoreNulls = true)
      .toAggregateExpression()),
    // truncate(x[, n]): round toward zero (at scale n) — sign·floor(|x|·10ⁿ)/10ⁿ
    "truncate" -> (args => {
      val n = if (args.length > 1) literalInt("truncate", args(1)) else 0
      val pow = Literal(math.pow(10.0, n))
      val x = Cast(args.head, DoubleType)
      Multiply(Signum(x),
        Divide(Cast(Floor(Multiply(Abs(x), pow)), DoubleType), pow))
    }),
    // to_iso8601: Presto's 'T'-separated rendering with milliseconds for
    // timestamps, and the bare 'yyyy-MM-dd' for DATE inputs (Presto's
    // to_iso8601(date) — r17 ADVICE: the always-through-timestamp cast
    // rendered dates as midnight timestamps). The branch is on TypeOf,
    // which is foldable once resolved, so the optimizer constant-folds
    // the If away — no per-row dispatch survives into the plan.
    "to_iso8601" -> (args => If(
      EqualTo(TypeOf(args.head), Literal("date")),
      DateFormatClass(Cast(args.head, TimestampType), Literal("yyyy-MM-dd")),
      DateFormatClass(Cast(args.head, TimestampType),
        Literal("yyyy-MM-dd'T'HH:mm:ss.SSS")))),
    "from_iso8601_timestamp" -> (args => Cast(args.head, TimestampType)),
    "from_iso8601_date" -> (args => Cast(args.head, DateType)))

  /** Presto datetime spellings. The ISO field extracts return BIGINT
    * like Presto: day_of_week/dow 1=Monday per ISO (Spark's weekday+1),
    * week/week_of_year the ISO week, year_of_week/yow the ISO
    * week-based year, day_of_year/doy, and last_day_of_month.
    * (date_diff/date_add live in GraftCli's dialect REWRITE — see the
    * note on the Seq below.) */
  private[functions] val prestoDatetime: Seq[(String, Seq[Expression] => Expression)] = {
    def dayOfWeek(args: Seq[Expression]): Expression =
      Cast(Add(WeekDay(Cast(args.head, DateType)), Literal(1)), LongType)
    def dayOfYear(args: Seq[Expression]): Expression =
      Cast(DayOfYear(Cast(args.head, DateType)), LongType)
    def week(args: Seq[Expression]): Expression =
      Cast(WeekOfYear(Cast(args.head, DateType)), LongType)
    def yearOfWeek(args: Seq[Expression]): Expression =
      Cast(DatePart.parseExtractField("YEAROFWEEK", Cast(args.head, DateType)), LongType)
    // date_diff/date_add are NOT here: Spark handles them in the GRAMMAR
    // (AstBuilder.visitTimestampdiff/-add — a registry builder never
    // sees the call), so Presto's quoted-unit spelling is served by
    // GraftCli's dialect rewrite at the SQL front door instead, landing
    // on Spark's own ChronoUnit full-elapsed-unit semantics — the same
    // periods Presto's Joda implementation counts.
    Seq(
      "day_of_week" -> (dayOfWeek _), "dow" -> (dayOfWeek _),
      "day_of_year" -> (dayOfYear _), "doy" -> (dayOfYear _),
      "week" -> (week _), "week_of_year" -> (week _),
      "year_of_week" -> (yearOfWeek _), "yow" -> (yearOfWeek _),
      "last_day_of_month" -> (args => LastDay(Cast(args.head, DateType))))
  }

  /** The one SQL surface (core kernels + Presto-dialect aliases),
    * consumed by BOTH [[install]] and [[GraftExtensions]]. */
  private[functions] val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] =
    coreBuilders ++ prestoDialect ++ prestoDatetime

  /** The surface's names (the CLI's SHOW FUNCTIONS source tag). */
  private[graft] def sqlNames: Seq[String] = sqlBuilders.map(_._1)

  /** SQL registration (same names) for `spark.sql` users; idempotent —
    * an already-registered name is SKIPPED, not replaced (the builders
    * come from the one sqlBuilders table, so a re-register could only
    * install the identical function; skipping also silences the
    * per-function "replaced a previously registered function" WARN that
    * a repeated open()/install() otherwise prints — noise that competes
    * with the Bench metrics line inside the driver's bounded stdout
    * tail window). */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(id, new ExpressionInfo("graft.functions", name), builder)
      }
    }
  }
}

/**
 * SparkSessionExtensions entry point:
 * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes the
 * graft function family available in every session of a deployment.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.SelfHammingRule)
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.FastDecimalCastRule)
    // same builder table as install(): the two registration paths expose
    // one identical SQL surface by construction
    GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
  }
}
