package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hot paths the built-in function
 * library can't express efficiently: vector cosine, one-pass MinHash
 * signatures, SimHash, and rolling fingerprints.
 *
 * All of them generate code that calls the static kernels in [[Kernels]]
 * (single JIT-friendly call per row, no boxing, no UDF serialization) and
 * stay inside whole-stage codegen spans.
 */

/** Shared per-row kernels. Static so generated code can call them. */
object Kernels {
  /** 64-bit avalanche mix (splitmix64 finalizer) — stable across JVMs. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Equal-position count over two long arrays — [[graft.ZipEqCount]]'s
    * scalar core: common-prefix positions where both sides are non-null
    * and equal (the HOF form's padded/null positions contribute 0). */
  def zipEqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** [[Kernels.dotD]]'s float-left variant: float widens exactly to
    * double per element (zip_with's implicit cast), then the same fold. */
  def dotFD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Sequential left-fold dot product over two double arrays — the
    * bit-exact scalar core of [[graft.DotProductD]]; null (boxed) when
    * the HOF form would be NULL. */
  def dotD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** FNV-1a 64 over UTF8 bytes, then mixed — deterministic string hash. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Cosine similarity over two float vectors, accumulated in double. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /**
   * One-pass k-permutation MinHash via double hashing:
   * sig_j = min over shingles of (h1 + j*h2) (Kirsch-Mitzenmacher).
   * O(|shingles| * 2 hashes + |shingles| * k adds) per row.
   */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h1 = hash64(s, 0x9e3779b97f4a7c15L)
        val h2 = hash64(s, 0x2545f4914f6cdd1dL) | 1L
        var j = 0
        var h = h1
        while (j < k) {
          if (h < sig(j)) sig(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Winnowing fingerprints (MOSS): hash64 (seed 0) each shingle, slide
    * a w-length window over the hash sequence, keep each window's
    * minimum, emit the distinct minima in first-occurrence order — one
    * JVM pass per row (the per-element-lambda form pays interpreted HOF
    * eval per shingle and per window; this is the d10 hot path). */
  def winnow(shingles: ArrayData, w: Int): ArrayData = {
    val n = shingles.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = if (shingles.isNullAt(i)) 0L
        else hash64(shingles.getUTF8String(i), 0L)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= n - w) {
      var m = hs(j)
      var k = j + 1
      while (k < j + w) { if (hs(k) < m) m = hs(k); k += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Per-position k-word shingle hashes: out[p] = hash64 of
    * words[p..p+k-1] joined by ' ' — BYTE-IDENTICAL to
    * hash64(concat_ws(' ', slice(words, p+1, k)), 0) (the FNV fold walks
    * each word's UTF-8 bytes with a 0x20 byte between words, then
    * mix64), but with no per-position string allocation and no
    * interpreted array lambda: the d10/q115 lesson applied to shingle
    * construction itself. Empty output when fewer than k words. */
  def shingleHash64(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // null elements stay null here and are SKIPPED below — separator
    // included — exactly concat_ws's null handling, so the byte-identity
    // contract holds on arrays with nulls too (an empty STRING is not
    // null: it contributes nothing but keeps its separators, also like
    // concat_ws)
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (words.isNullAt(i)) null
        else words.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p <= n - k) {
      var h = 0xcbf29ce484222325L
      var emitted = false
      var j = p
      while (j < p + k) {
        val b = bytes(j)
        if (b != null) {
          if (emitted) h = (h ^ 0x20L) * 0x100000001b3L
          var t = 0
          while (t < b.length) {
            h = (h ^ (b(t) & 0xffL)) * 0x100000001b3L
            t += 1
          }
          emitted = true
        }
        j += 1
      }
      out(p) = mix64(h)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over token strings (weighted by occurrence). */
  def simhash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i), 0x6a09e667f3bcc908L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Rolling polynomial (Rabin-Karp style) 64-bit fingerprint of a string,
    * case/whitespace-normalized. */
  def fingerprint(s: UTF8String): Long = {
    val t = s.toString.toLowerCase.replaceAll("\\s+", " ").trim
    var h = 1125899906842597L
    var i = 0
    while (i < t.length) {
      h = 31L * h + t.charAt(i)
      i += 1
    }
    mix64(h)
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Haversine great-circle distance in km — Presto 0.248's
    * great_circle_distance (presto-main MathFunctions, mean earth
    * radius 6371.01 km). asin argument clamped to 1.0 so antipodal
    * rounding noise can't produce NaN.
    *
    * Residual cross-engine libm risk (documented, accepted): sin/cos/
    * asin are ~1-ulp per engine and not bit-identical, and the result
    * feeds a 6-dp round plus a distance threshold downstream (q122).
    * An input whose true distance lies within ~1e-10 of a rounding
    * midpoint or of the threshold can flip cross-engine. Unlike the
    * quantile-sketch bins there is no shared discrete table to correct
    * against — the output IS the transcendental — so the honest options
    * are this documented risk or degrading the function's precision;
    * the synthetic corpus sits nowhere near the boundaries. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lon2 - lon1) / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon) * math.sin(dLon)
    2.0 * 6371.01 * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Set `s`'s k Bloom bits in `bits` (Kirsch-Mitzenmacher double
    * hashing over the same FNV-1a64+mix kernel as minhash — two string
    * hashes per element, k derived probes). Positions are unsigned
    * mod the bit length, so any power-of-two-free size works too. */
  def bloomSet(bits: Array[Byte], s: UTF8String, k: Int): Unit = {
    val m = bits.length.toLong << 3
    val h1 = hash64(s, 0x71ee5851a2c5e1a6L)
    val h2 = hash64(s, 0x435ea1ac14f8bcadL) | 1L
    var j = 0
    var h = h1
    while (j < k) {
      val pos = java.lang.Long.remainderUnsigned(h, m)
      val idx = (pos >>> 3).toInt
      bits(idx) = (bits(idx) | (1 << (pos & 7L).toInt)).toByte
      h += h2
      j += 1
    }
  }

  /** Membership probe against a [[bloomSet]]-built filter: false means
    * definitely absent; true means present-or-false-positive. */
  def bloomTest(bits: Array[Byte], s: UTF8String, k: Int): Boolean = {
    val m = bits.length.toLong << 3
    val h1 = hash64(s, 0x71ee5851a2c5e1a6L)
    val h2 = hash64(s, 0x435ea1ac14f8bcadL) | 1L
    var j = 0
    var h = h1
    while (j < k) {
      val pos = java.lang.Long.remainderUnsigned(h, m)
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      h += h2
      j += 1
    }
    true
  }

  /** Web-Mercator latitude clamp — Bing tiles are undefined beyond this
    * (Presto's bing_tile_at rejects out-of-range latitudes; clamping is
    * the pipeline-friendly choice for crawl-derived coordinates). */
  private val MaxBingLat = 85.05112878

  /** Bing-maps quadkey of the tile containing (lat, lon) at `zoom` —
    * Presto 0.248's bing_tile_at + bing_tile_quadkey composed (the
    * Bing-tile family's idiomatic join key: tiles at any zoom share the
    * quadkey PREFIX of their children, so zoom-out aggregation is a
    * substring groupBy). Standard Web-Mercator math; x/y clamped into
    * [0, 2^zoom).
    *
    * Residual cross-engine libm risk (documented, accepted): the tile y
    * floors over a sin/log Mercator projection whose ~1-ulp engine
    * variance can flip the floor for latitudes within ~1e-11 of a tile
    * boundary — a different quadkey digit cross-engine. Tile boundaries
    * are a measure-zero set and the synthetic corpus avoids them; a
    * boundary-exact contract would need a shared quantized y (both
    * engines rounding the projected y to a fixed grid before the
    * floor), which trades public-formula fidelity for it. */
  def bingTileQuadkey(lat0: Double, lon: Double, zoom: Int): UTF8String = {
    val n = 1L << zoom
    val lat = math.max(-MaxBingLat, math.min(MaxBingLat, lat0))
    val x = math.min(n - 1, math.max(0L,
      math.floor((lon + 180.0) / 360.0 * n).toLong))
    val sinLat = math.sin(lat / 180.0 * math.Pi)
    val y = math.min(n - 1, math.max(0L,
      math.floor((0.5 - math.log((1.0 + sinLat) / (1.0 - sinLat))
        / (4.0 * math.Pi)) * n).toLong))
    val sb = new java.lang.StringBuilder(zoom)
    var i = zoom - 1
    while (i >= 0) {
      sb.append(('0' + (((x >> i) & 1L) + 2L * ((y >> i) & 1L)).toInt).toChar)
      i -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Ray-casting point-in-polygon (the core of Presto's ST_Contains for
    * the point-in-ring case). The ring is CLOSED (last vertex repeats
    * the first); edges use strict comparisons, so boundary points fall
    * on the engine-deterministic side. Pure comparisons and exact-
    * rounded IEEE multiply/divide — no libm — so it replays bit-exact
    * in any engine that evaluates the same per-edge formula. */
  def pointInPolygon(px: Double, py: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    val n = math.min(xs.numElements(), ys.numElements())
    var inside = false
    var i = 0
    while (i < n - 1) {
      val x1 = xs.getDouble(i); val y1 = ys.getDouble(i)
      val x2 = xs.getDouble(i + 1); val y2 = ys.getDouble(i + 1)
      if ((y1 > py) != (y2 > py) &&
          px < (x2 - x1) * (py - y1) / (y2 - y1) + x1) inside = !inside
      i += 1
    }
    inside
  }

  /** Unicode normalization (UAX #15) over a UTF8String. `isNormalized`
    * is the fast path: ASCII and already-composed text — the vast
    * majority of a real corpus — returns the input UTF8String without
    * decoding or allocating. The tables come from the JDK's
    * java.text.Normalizer (ICU4J-derived, same UAX #15 forms DuckDB's
    * utf8proc-based nfc_normalize implements, which is what makes NFC
    * oracle-replayable cross-engine). */
  def normalizeUtf8(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  /** Orientation of the triple (ax,ay)->(bx,by)->(cx,cy): the cross
    * product (b-a) x (c-a). Pure IEEE multiply/subtract in a fixed
    * association order, so a SQL oracle replaying the same expression
    * text gets the same sign bit-for-bit. */
  @inline def orient(ax: Double, ay: Double, bx: Double, by: Double,
                     cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Closed-segment intersection test (Presto ST_Intersects, the
    * segment-segment core): proper crossings via the four orientation
    * signs, plus the collinear/touching cases via on-segment bounding
    * checks. Touching at an endpoint and collinear overlap both count
    * as intersecting (closed-set semantics, as in Presto/JTS). */
  def segmentsIntersect(x1: Double, y1: Double, x2: Double, y2: Double,
                        x3: Double, y3: Double, x4: Double, y4: Double): Boolean = {
    val d1 = orient(x3, y3, x4, y4, x1, y1)
    val d2 = orient(x3, y3, x4, y4, x2, y2)
    val d3 = orient(x1, y1, x2, y2, x3, y3)
    val d4 = orient(x1, y1, x2, y2, x4, y4)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else if (d1 == 0 && onSegment(x3, y3, x4, y4, x1, y1)) true
    else if (d2 == 0 && onSegment(x3, y3, x4, y4, x2, y2)) true
    else if (d3 == 0 && onSegment(x1, y1, x2, y2, x3, y3)) true
    else d4 == 0 && onSegment(x1, y1, x2, y2, x4, y4)
  }

  /** Is (px,py) — already known collinear with a->b — inside a->b's
    * bounding box? */
  @inline private def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
                                px: Double, py: Double): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  /** Euclidean distance from (px,py) to the closed segment
    * (x1,y1)-(x2,y2) (Presto ST_Distance, the point-to-segment core):
    * project onto the segment, clamp the parameter to [0,1], distance
    * to the clamped foot. A degenerate (zero-length) segment degrades
    * to point distance. Fixed association order + correctly-rounded
    * sqrt make the value oracle-replayable bit-for-bit. */
  def pointSegmentDist(px: Double, py: Double, x1: Double, y1: Double,
                       x2: Double, y2: Double): Double = {
    val bx = x2 - x1
    val by = y2 - y1
    val len2 = bx * bx + by * by
    val t0 = if (len2 == 0) 0.0 else ((px - x1) * bx + (py - y1) * by) / len2
    val t = math.min(math.max(t0, 0.0), 1.0)
    val dx = px - (x1 + t * bx)
    val dy = py - (y1 + t * by)
    math.sqrt(dx * dx + dy * dy)
  }

  /** Histogram-sketch bin decision: COUNT of edges <= x over the sorted
    * snapped edge table, clamped to >= 1 — the exact definitional form,
    * via binary search (O(log bins) pure IEEE comparisons per row, no
    * lambda interpretation, no allocation). This subsumes the r10
    * closed-form-candidate-±1 scheme: that correction could land on a
    * bin whose 6-dp-rounded edge still exceeds x when rounding collapses
    * adjacent edges into a plateau (the backward scan needed there is
    * plateau-length, not 1) — binary search against the rounded table
    * has no such residual, and stays engine-agnostic: any engine that
    * counts edges <= x agrees bit-for-bit. */
  def edgeBin(edges: ArrayData, x: Double): Int = {
    var lo = 0                       // edges[0..lo-1] <= x (1-based count)
    var hi = edges.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (edges.getDouble(mid) <= x) lo = mid + 1 else hi = mid
    }
    if (lo < 1) 1 else lo
  }

  /** Shoelace area of a CLOSED ring (last vertex repeats the first;
    * Presto ST_Area on a polygon shell): 0.5 * |Σ (x_i·y_{i+1} −
    * x_{i+1}·y_i)|, accumulated strictly left-to-right so a SQL oracle
    * replaying the literal expanded sum reproduces the value
    * bit-for-bit (the q123/q127 discipline: fixed-association IEEE
    * multiply/subtract/add only, no libm). */
  def ringArea(xs: ArrayData, ys: ArrayData): Double =
    0.5 * math.abs(ringCross(xs, ys))

  /** The signed shoelace sum itself (twice the signed area). */
  @inline private def ringCross(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      acc += xs.getDouble(i) * ys.getDouble(i + 1) -
        xs.getDouble(i + 1) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  /** Perimeter of a CLOSED ring (Presto ST_Length / ST_Perimeter core):
    * Σ sqrt(dx² + dy²) over consecutive vertices, left-to-right. One
    * correctly-rounded sqrt per edge — oracle-replayable bit-for-bit. */
  def ringLength(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      val dx = xs.getDouble(i + 1) - xs.getDouble(i)
      val dy = ys.getDouble(i + 1) - ys.getDouble(i)
      acc += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    acc
  }

  /** One coordinate of the area-weighted polygon centroid (Presto
    * ST_X(ST_Centroid(g)) for axis 0, ST_Y for axis 1): Σ (c_i +
    * c_{i+1})·cross_i / (3·Σ cross_i), all sums left-to-right. A
    * degenerate ring (signed area exactly 0 — collinear or repeated
    * vertices) degrades to the plain vertex mean over the n−1 distinct
    * vertices, the JTS line/point-centroid fallback. */
  def ringCentroid(xs: ArrayData, ys: ArrayData, axis: Int): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    val cs = if (axis == 0) xs else ys
    var a = 0.0
    var num = 0.0
    var i = 0
    while (i < n - 1) {
      val cross = xs.getDouble(i) * ys.getDouble(i + 1) -
        xs.getDouble(i + 1) * ys.getDouble(i)
      a += cross
      num += (cs.getDouble(i) + cs.getDouble(i + 1)) * cross
      i += 1
    }
    val res =
      if (a == 0.0) {
        var s = 0.0
        i = 0
        while (i < n - 1) { s += cs.getDouble(i); i += 1 }
        if (n > 1) s / (n - 1) else Double.NaN
      } else num / (3.0 * a)
    // canonicalize -0.0 (a 0/(3a<0) row would otherwise carry a
    // meaningless sign that breaks value-representation hashing)
    res + 0.0
  }

  /** CDF read of a bin-count sketch array: smallest 1-based bin whose
    * cumulative count reaches ceil(total * p) — the q115 kernel's pick,
    * `min(bin where cum >= ceil(total * p))`, as one O(bins) scan over
    * an already-aggregated sketch row. An all-zero (or empty) sketch
    * reads bin 1, matching the kernel's behavior on a 0-count group
    * (cum >= 0 at the first bin). */
  def sketchQuantileBin(sketch: ArrayData, p: Double): Int = {
    val n = sketch.numElements()
    var total = 0L
    var i = 0
    while (i < n) { total += sketch.getLong(i); i += 1 }
    val target = math.ceil(total * p).toLong
    var cum = 0L
    i = 0
    while (i < n) {
      cum += sketch.getLong(i)
      if (cum >= target) return i + 1
      i += 1
    }
    1
  }

  /**
   * One BPE merge pass over a space-joined symbol string: greedy
   * left-to-right scan replacing each adjacent (a, b) symbol pair with
   * the concatenated symbol, consuming both (so an overlapping
   * occurrence — "a a a" under merge (a,a) — yields "aa a", the
   * standard BPE semantics). Equivalent to the left-fold formulation
   * the DuckDB oracle replays via list_reduce (merge into the
   * accumulator's last token when it equals `a` exactly and the current
   * symbol equals `b`): the fold can only diverge from the scan if the
   * merged token re-matched as a left symbol, which needs a+b == a —
   * impossible for non-empty b. Symbols never contain spaces, so the
   * split is unambiguous.
   */
  def bpeMerge(syms: UTF8String, a: UTF8String, b: UTF8String): UTF8String = {
    val toks = syms.toString.split(" ", -1)
    val as = a.toString
    val bs = b.toString
    val sb = new java.lang.StringBuilder(syms.numBytes + 1)
    var i = 0
    while (i < toks.length) {
      if (sb.length > 0) sb.append(' ')
      if (i + 1 < toks.length && toks(i) == as && toks(i + 1) == bs) {
        sb.append(as).append(bs); i += 2
      } else { sb.append(toks(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /**
   * Parse a WKT literal (Presto `ST_GeometryFromText`, the POINT /
   * LINESTRING / POLYGON-single-ring subset — the front door of the
   * 0.248 geospatial family, which is WKT-first on real data lakes)
   * into the (gtype, xs, ys) coordinate-array representation every
   * ring/segment kernel above already consumes.
   *
   * Returns null on ANY malformed input — the total, try_-style
   * contract (Presto throws; a 100 TB ingest wants the bad row
   * quarantined by a null filter, not the job killed). Accepted
   * grammar (case-insensitive tag, whitespace-tolerant, exponent
   * doubles):
   *   POINT (x y)                    | POINT EMPTY
   *   LINESTRING (x y, x y [, ...])  | LINESTRING EMPTY   -- >= 2 pts
   *   POLYGON ((x y, ..., x y))      | POLYGON EMPTY      -- one
   *     CLOSED ring, >= 4 points, first == last
   * Multi-ring polygons (holes), MULTI*, GEOMETRYCOLLECTION, Z/M
   * coordinates, unclosed rings, and trailing garbage are all rejected
   * (null) — out of the subset, never silently truncated.
   */
  def wktParse(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    var i = 0
    var bad = false
    def skipWs(): Unit = { while (i < n && Character.isWhitespace(str.charAt(i))) i += 1 }
    def eat(c: Char): Boolean = {
      skipWs()
      if (i < n && str.charAt(i) == c) { i += 1; true } else { bad = true; false }
    }
    def peekIs(c: Char): Boolean = { skipWs(); i < n && str.charAt(i) == c }
    def readNum(): Double = {
      skipWs()
      val st = i
      while (i < n && (str.charAt(i) match {
        case '+' | '-' | '.' | 'e' | 'E' => true
        case ch => ch >= '0' && ch <= '9'
      })) i += 1
      if (i == st) { bad = true; 0.0 }
      else try java.lang.Double.parseDouble(str.substring(st, i))
      catch { case _: NumberFormatException => bad = true; 0.0 }
    }
    skipWs()
    val tagStart = i
    while (i < n && Character.isLetter(str.charAt(i))) i += 1
    val tag = str.substring(tagStart, i).toUpperCase(java.util.Locale.ROOT)
    val xs = new scala.collection.mutable.ArrayBuffer[Double]()
    val ys = new scala.collection.mutable.ArrayBuffer[Double]()
    // one x-y coordinate list between parens, comma-separated
    def readCoords(): Unit = {
      if (eat('(')) {
        var more = true
        while (more && !bad) {
          xs += readNum(); ys += readNum()
          skipWs()
          if (i < n && str.charAt(i) == ',') { i += 1 }
          else { more = false; eat(')') }
        }
      }
    }
    skipWs()
    val empty = i + 5 <= n && str.regionMatches(true, i, "EMPTY", 0, 5)
    if (empty) i += 5
    tag match {
      case "POINT" =>
        if (!empty) { if (eat('(')) { xs += readNum(); ys += readNum(); eat(')') } }
      case "LINESTRING" =>
        if (!empty) { readCoords(); if (xs.length < 2) bad = true }
      case "POLYGON" =>
        if (!empty) {
          if (eat('(')) {
            readCoords()
            // a ',' here would start a hole ring — outside the subset
            if (!bad && peekIs(',')) bad = true
            eat(')')
          }
          if (xs.length < 4 ||
            xs.head != xs.last || ys.head != ys.last) bad = true
        }
      case _ => bad = true
    }
    skipWs()
    if (bad || i != n) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(tag),
      new GenericArrayData(xs.toArray),
      new GenericArrayData(ys.toArray)))
  }

  /** Format (gtype, xs, ys) back to WKT text (Presto `ST_AsText`) using
    * Java's shortest-round-trip double representation — the exact
    * inverse of [[wktParse]] (spec-pinned: parse(text(g)) == g, and
    * text(parse(w)) == w for canonically-spaced w). Unknown tags,
    * length-mismatched arrays, and subset violations (POINT with != 1
    * point, LINESTRING < 2, POLYGON unclosed or < 4) return null. */
  def wktText(gtype: UTF8String, xs: ArrayData, ys: ArrayData): UTF8String = {
    val tag = gtype.toString.toUpperCase(java.util.Locale.ROOT)
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val ok = tag match {
      case "POINT" => n <= 1
      case "LINESTRING" => n == 0 || n >= 2
      case "POLYGON" => n == 0 || (n >= 4 &&
        xs.getDouble(0) == xs.getDouble(n - 1) &&
        ys.getDouble(0) == ys.getDouble(n - 1))
      case _ => false
    }
    if (!ok) return null
    if (n == 0) return UTF8String.fromString(tag + " EMPTY")
    val sb = new java.lang.StringBuilder(tag)
    sb.append(if (tag == "POLYGON") " ((" else " (")
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(", ")
      sb.append(java.lang.Double.toString(xs.getDouble(i))).append(' ')
        .append(java.lang.Double.toString(ys.getDouble(i)))
      i += 1
    }
    sb.append(if (tag == "POLYGON") "))" else ")")
    UTF8String.fromString(sb.toString)
  }

  /**
   * Parse a WKT POLYGON or MULTIPOLYGON into per-polygon ring lists —
   * the multi-ring / multi-part step past [[wktParse]]'s single-ring
   * subset (Presto's geometry model: polygon = shell + interior rings;
   * multipolygon = list of polygons). Null on ANY malformed input (same
   * total-function contract): wrong tag, unclosed ring, ring with < 4
   * points, Z/M coordinates, missing parens, trailing garbage.
   * `POLYGON EMPTY` / `MULTIPOLYGON EMPTY` parse to zero polygons.
   * Output: polygons → rings → interleaved [x0,y0,x1,y1,…]; each
   * polygon's ring 0 is its shell, the rest are holes (WKT order).
   * Kept internal: the public kernels below compute area / containment /
   * ring count in the SAME pass so no nested-array geometry is ever
   * materialized in a row (at 100 TB the per-row geometry object is
   * allocation churn; the scalar answer is what queries consume).
   */
  private def parseWktPolygons(s: UTF8String): Array[Array[Array[Double]]] = {
    val str = s.toString
    val n = str.length
    var i = 0
    var bad = false
    def skipWs(): Unit = { while (i < n && Character.isWhitespace(str.charAt(i))) i += 1 }
    def eat(c: Char): Boolean = {
      skipWs()
      if (i < n && str.charAt(i) == c) { i += 1; true } else { bad = true; false }
    }
    def readNum(): Double = {
      skipWs()
      val st = i
      while (i < n && (str.charAt(i) match {
        case '+' | '-' | '.' | 'e' | 'E' => true
        case ch => ch >= '0' && ch <= '9'
      })) i += 1
      if (i == st) { bad = true; 0.0 }
      else try java.lang.Double.parseDouble(str.substring(st, i))
      catch { case _: NumberFormatException => bad = true; 0.0 }
    }
    // one '('-wrapped ring list: (x y, ...), (x y, ...) — shared by the
    // POLYGON body and each MULTIPOLYGON element
    def readPolygon(): Array[Array[Double]] = {
      val rings = new scala.collection.mutable.ArrayBuffer[Array[Double]]()
      if (eat('(')) {
        var moreRings = true
        while (moreRings && !bad) {
          val coords = new scala.collection.mutable.ArrayBuffer[Double]()
          if (eat('(')) {
            var more = true
            while (more && !bad) {
              coords += readNum(); coords += readNum()
              skipWs()
              if (i < n && str.charAt(i) == ',') i += 1
              else { more = false; eat(')') }
            }
          }
          val m = coords.length / 2
          if (!bad && (m < 4 ||
              coords(0) != coords(coords.length - 2) ||
              coords(1) != coords(coords.length - 1))) bad = true
          if (!bad) rings += coords.toArray
          skipWs()
          if (i < n && str.charAt(i) == ',') i += 1
          else { moreRings = false; eat(')') }
        }
      }
      if (bad || rings.isEmpty) null else rings.toArray
    }
    skipWs()
    val tagStart = i
    while (i < n && Character.isLetter(str.charAt(i))) i += 1
    val tag = str.substring(tagStart, i).toUpperCase(java.util.Locale.ROOT)
    if (tag != "POLYGON" && tag != "MULTIPOLYGON") return null
    skipWs()
    if (i + 5 <= n && str.regionMatches(true, i, "EMPTY", 0, 5)) {
      i += 5
      skipWs()
      return if (i == n) Array.empty else null
    }
    val polys = new scala.collection.mutable.ArrayBuffer[Array[Array[Double]]]()
    if (tag == "POLYGON") {
      val p = readPolygon()
      if (p != null) polys += p
    } else if (eat('(')) {
      var morePolys = true
      while (morePolys && !bad) {
        val p = readPolygon()
        if (p == null) bad = true else polys += p
        skipWs()
        if (i < n && str.charAt(i) == ',') i += 1
        else { morePolys = false; eat(')') }
      }
    }
    skipWs()
    if (bad || i != n || polys.isEmpty) null else polys.toArray
  }

  /** True when the WKT tag is POLYGON (not MULTIPOLYGON) — for the
    * accessors Presto defines on polygons only. */
  @inline private def wktTagIsPolygon(s: UTF8String): Boolean = {
    val str = s.toString
    var i = 0
    val n = str.length
    while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
    val st = i
    while (i < n && Character.isLetter(str.charAt(i))) i += 1
    str.substring(st, i).equalsIgnoreCase("POLYGON")
  }

  /** Shoelace area of one interleaved closed ring. */
  @inline private def interleavedRingArea(r: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < r.length - 2) {
      acc += r(i) * r(i + 3) - r(i + 2) * r(i + 1)
      i += 2
    }
    0.5 * math.abs(acc)
  }

  /** Ray-cast point-in-ring over one interleaved closed ring — the same
    * strict-comparison formula as [[pointInPolygon]]. */
  @inline private def interleavedPointInRing(px: Double, py: Double,
      r: Array[Double]): Boolean = {
    var inside = false
    var i = 0
    while (i < r.length - 2) {
      val x1 = r(i); val y1 = r(i + 1); val x2 = r(i + 2); val y2 = r(i + 3)
      if ((y1 > py) != (y2 > py) &&
          px < (x2 - x1) * (py - y1) / (y2 - y1) + x1) inside = !inside
      i += 2
    }
    inside
  }

  /** st_area over WKT POLYGON / MULTIPOLYGON text, holes subtracted
    * (Presto ST_Area: per polygon, shoelace of the shell minus shoelace
    * of each interior ring; summed across a multipolygon's parts) —
    * parse + area in ONE pass, null on malformed, 0.0 for EMPTY. */
  def stAreaWkt(s: UTF8String): java.lang.Double = {
    val polys = parseWktPolygons(s)
    if (polys == null) return null
    var a = 0.0
    var p = 0
    while (p < polys.length) {
      val rings = polys(p)
      a += interleavedRingArea(rings(0))
      var i = 1
      while (i < rings.length) { a -= interleavedRingArea(rings(i)); i += 1 }
      p += 1
    }
    java.lang.Double.valueOf(a)
  }

  /** ST_Contains(WKT polygon/multipolygon, point): inside any part's
    * shell and not inside that part's holes (point-in-ring XOR per
    * polygon, OR across parts — correct for the standard disjoint
    * model). Null on malformed text, false for EMPTY. */
  def stContainsWkt(s: UTF8String, px: Double, py: Double): java.lang.Boolean = {
    val polys = parseWktPolygons(s)
    if (polys == null) return null
    var any = false
    var p = 0
    while (p < polys.length && !any) {
      val rings = polys(p)
      var inside = false
      var i = 0
      while (i < rings.length) {
        if (interleavedPointInRing(px, py, rings(i))) inside = !inside
        i += 1
      }
      any = inside
      p += 1
    }
    java.lang.Boolean.valueOf(any)
  }

  /** Presto ST_NumInteriorRing: hole count of a WKT POLYGON (0 for
    * EMPTY). Null on malformed text AND on MULTIPOLYGON — Presto
    * defines the accessor for polygons only. */
  def stNumInteriorRings(s: UTF8String): java.lang.Integer = {
    if (!wktTagIsPolygon(s)) return null
    val polys = parseWktPolygons(s)
    if (polys == null) null
    else if (polys.isEmpty) java.lang.Integer.valueOf(0)
    else java.lang.Integer.valueOf(polys(0).length - 1)
  }

  /** Presto ST_NumGeometries over the polygon family: 1 for POLYGON,
    * part count for MULTIPOLYGON, 0 for EMPTY; null on malformed. */
  def stNumGeometries(s: UTF8String): java.lang.Integer = {
    val polys = parseWktPolygons(s)
    if (polys == null) null else java.lang.Integer.valueOf(polys.length)
  }

  /** FNV-1a64 fold of one byte array into a running hash (no finalizer). */
  @inline private def fnvFold(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /**
   * Hashed n-gram feature buckets over a token array — the fused form of
   * the t23/t25 featurizer (the hashing-trick features of fastText /
   * CCNet classifier filtering and DSIR importance resampling): for every
   * token t emit bucket(hash64("u " + t, seed)), and for every adjacent
   * pair (a, b) emit bucket(hash64("b " + a + " " + b, seed)), where
   * bucket = low `bits` bits (for 2^bits buckets, pmod of a power of two
   * ≡ the unsigned mask). Output order is all unigrams then all bigrams —
   * exactly `concat(transform(u…), transform(b…))`.
   *
   * BYTE-IDENTICAL to the array-lambda form
   * `transform(w, t -> pmod(hash64(concat('u ', t), seed), 2^bits))` ++
   * the bigram transform: the FNV fold walks the marker bytes, the token
   * bytes, and the joining 0x20 byte in concat order, then applies the
   * same splitmix finalizer — but in ONE JIT-compiled pass per row with
   * zero per-feature string allocation. Spark evaluates lambda HOFs
   * interpreted per element, so on the corpus-scan hot path (every token
   * of every document — the highest-volume scoring pass a curation
   * pipeline has) the lambda form pays non-codegen eval + concat
   * allocation per feature; this kernel is the d10 WinnowFingerprints
   * lesson applied to the model-based-selection featurizer.
   *
   * Null tokens are skipped (split() never produces them; the lambda
   * form would null the whole feature entry).
   */
  def hashedNgramBuckets(words: ArrayData, seed: Long, bits: Int): ArrayData = {
    val n = words.numElements()
    val bs = new Array[Array[Byte]](n)
    var nuni = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        bs(i) = words.getUTF8String(i).getBytes
        nuni += 1
      }
      i += 1
    }
    var nbig = 0
    i = 0
    while (i < n - 1) {
      if (bs(i) != null && bs(i + 1) != null) nbig += 1
      i += 1
    }
    val mask = (1L << bits) - 1L
    val basis = 0xcbf29ce484222325L ^ seed
    // fold the 2-byte markers once: "u " / "b " prefixes are constant
    val uBase = (((basis ^ 0x75L) * 0x100000001b3L) ^ 0x20L) * 0x100000001b3L
    val bBase = (((basis ^ 0x62L) * 0x100000001b3L) ^ 0x20L) * 0x100000001b3L
    val out = new Array[Long](nuni + nbig)
    var o = 0
    i = 0
    while (i < n) {
      if (bs(i) != null) {
        out(o) = mix64(fnvFold(uBase, bs(i))) & mask
        o += 1
      }
      i += 1
    }
    i = 0
    while (i < n - 1) {
      if (bs(i) != null && bs(i + 1) != null) {
        val h = fnvFold((fnvFold(bBase, bs(i)) ^ 0x20L) * 0x100000001b3L, bs(i + 1))
        out(o) = mix64(h) & mask
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Fused hashed-linear classifier score (t23): [[hashedNgramBuckets]]
   * with 2^16 buckets, each bucket mapped through the procedural weight
   * table (Knuth multiplicative mix into [-1000, 1000]) and summed —
   * (n_feat, score_sum) in one pass per row. Replays exactly
   * `pmod(pmod(b * 2654435761, 2^32), 2001) - 1000` per feature: both
   * intermediates are non-negative, so % ≡ pmod.
   */
  def hashedNgramScore(words: ArrayData, seed: Long): InternalRow = {
    val buckets = hashedNgramBuckets(words, seed, 16)
    val n = buckets.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += ((buckets.getLong(i) * 2654435761L) & 0xffffffffL) % 2001L - 1000L
      i += 1
    }
    new GenericInternalRow(Array[Any](n, sum))
  }

  // ---- Porter stemmer (Porter 1980, "An algorithm for suffix
  // stripping", Program 14(3) — the public-domain algorithm Presto's
  // word_stem serves). Implemented from the paper's rule tables; operates
  // on lowercase ASCII letters, returns non-letter-bearing or short
  // inputs unchanged (Presto stems only all-letter words > 2 chars).

  private def isVowelAt(w: Array[Char], i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** Porter's measure m of w[0..end]: the number of VC sequences. */
  private def measure(w: Array[Char], end: Int): Int = {
    var m = 0
    var i = 0
    var prevV = false
    while (i <= end) {
      val v = isVowelAt(w, i)
      if (prevV && !v) m += 1
      prevV = v
      i += 1
    }
    m
  }

  private def hasVowel(w: Array[Char], end: Int): Boolean = {
    var i = 0
    while (i <= end) { if (isVowelAt(w, i)) return true; i += 1 }
    false
  }

  /** *d — ends with a double consonant. */
  private def doubleC(w: Array[Char], end: Int): Boolean =
    end >= 1 && w(end) == w(end - 1) && !isVowelAt(w, end)

  /** *o — ends cvc where the final c is not w, x or y. */
  private def cvc(w: Array[Char], end: Int): Boolean =
    end >= 2 && !isVowelAt(w, end) && isVowelAt(w, end - 1) &&
      !isVowelAt(w, end - 2) &&
      w(end) != 'w' && w(end) != 'x' && w(end) != 'y'

  def porterStem(in: UTF8String): UTF8String = {
    val s = in.toString
    if (s.length < 3 || !s.forall(c => c >= 'a' && c <= 'z')) return in
    val w = s.toCharArray
    var end = w.length - 1 // index of last char of the current stem

    def ends(suf: String): Boolean = {
      val n = suf.length
      if (n > end + 1) return false
      var i = 0
      while (i < n) {
        if (w(end - n + 1 + i) != suf.charAt(i)) return false
        i += 1
      }
      true
    }
    /** m() of the stem that remains after removing `suf`. */
    def mAfter(suf: String): Int = measure(w, end - suf.length)
    def setTo(suf: String, to: String): Unit = {
      val base = end - suf.length + 1
      var i = 0
      while (i < to.length) { w(base + i) = to.charAt(i); i += 1 }
      end = base + to.length - 1
    }

    // Step 1a
    if (ends("sses")) setTo("sses", "ss")
    else if (ends("ies")) setTo("ies", "i")
    else if (!ends("ss") && ends("s")) setTo("s", "")
    // Step 1b
    var rule23 = false
    if (ends("eed")) { if (mAfter("eed") > 0) setTo("eed", "ee") }
    else if (ends("ed") && hasVowel(w, end - 2)) { setTo("ed", ""); rule23 = true }
    else if (ends("ing") && end >= 3 && hasVowel(w, end - 3)) {
      setTo("ing", ""); rule23 = true
    }
    if (rule23) {
      if (ends("at")) setTo("at", "ate")
      else if (ends("bl")) setTo("bl", "ble")
      else if (ends("iz")) setTo("iz", "ize")
      else if (doubleC(w, end) &&
        w(end) != 'l' && w(end) != 's' && w(end) != 'z') end -= 1
      else if (measure(w, end) == 1 && cvc(w, end)) setTo("", "e")
    }
    // Step 1c
    if (ends("y") && hasVowel(w, end - 1)) w(end) = 'i'
    // Step 2 (each rule conditional on m > 0 for the remaining stem)
    val step2 = Array(
      ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
      ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
      ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
      ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
      ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
      ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"))
    var i2 = 0
    var done2 = false
    while (i2 < step2.length && !done2) {
      val (suf, to) = step2(i2)
      if (ends(suf)) { if (mAfter(suf) > 0) setTo(suf, to); done2 = true }
      i2 += 1
    }
    // Step 3
    val step3 = Array(
      ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
      ("ical", "ic"), ("ful", ""), ("ness", ""))
    var i3 = 0
    var done3 = false
    while (i3 < step3.length && !done3) {
      val (suf, to) = step3(i3)
      if (ends(suf)) { if (mAfter(suf) > 0) setTo(suf, to); done3 = true }
      i3 += 1
    }
    // Step 4 (m > 1); ION additionally needs the stem to end s or t
    val step4 = Array(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    var i4 = 0
    var done4 = false
    while (i4 < step4.length && !done4) {
      val suf = step4(i4)
      if (ends(suf)) {
        val base = end - suf.length
        val ok = measure(w, base) > 1 &&
          (suf != "ion" || (base >= 0 && (w(base) == 's' || w(base) == 't')))
        if (ok) setTo(suf, "")
        done4 = true
      }
      i4 += 1
    }
    // Step 5a
    if (w(end) == 'e') {
      val m = measure(w, end - 1)
      if (m > 1 || (m == 1 && !cvc(w, end - 1))) end -= 1
    }
    // Step 5b
    if (measure(w, end) > 1 && doubleC(w, end) && w(end) == 'l') end -= 1

    UTF8String.fromString(new String(w, 0, end + 1))
  }

  /** Presto ngrams(array<varchar>, n): every length-n sliding window; a
    * shorter array yields one n-gram holding the whole array (Presto's
    * convention for n >= length). */
  def ngrams(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    // null elements copy through as nulls (the expression declares inner
    // containsNull from its input) — an unchecked getUTF8String on an
    // UnsafeArrayData null slot would read garbage bytes instead
    def elem(i: Int): Any =
      if (words.isNullAt(i)) null else words.getUTF8String(i)
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    if (n >= len) {
      val whole = new Array[Any](len)
      var i = 0
      while (i < len) { whole(i) = elem(i); i += 1 }
      return new GenericArrayData(Array[Any](new GenericArrayData(whole)))
    }
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < out.length) {
      val g = new Array[Any](n)
      var j = 0
      while (j < n) { g(j) = elem(i + j); j += 1 }
      out(i) = new GenericArrayData(g)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** RFC 2104 HMAC under a JCA algorithm name — Presto's hmac_md5 /
    * hmac_sha1 / hmac_sha256 / hmac_sha512 family shares this kernel. */
  def hmac(data: Array[Byte], key: Array[Byte], algo: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance(algo)
    mac.init(new javax.crypto.spec.SecretKeySpec(key, algo))
    mac.doFinal(data)
  }

  /** HMAC-SHA256 (RFC 2104 with SHA-256) — Presto's hmac_sha256. */
  def hmacSha256(data: Array[Byte], key: Array[Byte]): Array[Byte] =
    hmac(data, key, "HmacSHA256")

  // ------------------------------------------------ json_extract_scalar

  /** Jackson mapper (Spark ships jackson-databind); thread-safe for
    * reads. */
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Per-thread memo of the last parsed path: the path argument is
    * almost always a literal, so each task parses it once. Steps are
    * either a String (object key) or java.lang.Integer (array index). */
  private val lastPath = new ThreadLocal[(String, Array[AnyRef])]

  /** Parse the JsonPath subset Presto's json_extract_scalar serves in
    * practice: `$`, `.key`, `['key']` / `["key"]`, `[index]`. Anything
    * else (wildcards, recursive descent, filters) is refused loudly —
    * never silently misread. */
  def parseJsonPath(p: String): Array[AnyRef] = {
    val memo = lastPath.get()
    if (memo != null && memo._1 == p) return memo._2
    require(p.nonEmpty && p.charAt(0) == '$',
      s"json_extract_scalar: path must start with '$$': $p")
    val steps = Array.newBuilder[AnyRef]
    var i = 1
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          i += 1
          val start = i
          while (i < p.length && p.charAt(i) != '.' && p.charAt(i) != '[') i += 1
          require(i > start, s"json_extract_scalar: empty key in path: $p")
          steps += p.substring(start, i)
        case '[' =>
          i += 1
          require(i < p.length, s"json_extract_scalar: unterminated '[' in path: $p")
          val q = p.charAt(i)
          if (q == '\'' || q == '"') {
            i += 1
            val start = i
            while (i < p.length && p.charAt(i) != q) i += 1
            require(i < p.length && i + 1 < p.length && p.charAt(i + 1) == ']',
              s"json_extract_scalar: unterminated quoted key in path: $p")
            steps += p.substring(start, i)
            i += 2
          } else {
            val start = i
            while (i < p.length && p.charAt(i) != ']') i += 1
            require(i < p.length, s"json_extract_scalar: unterminated '[' in path: $p")
            val idx = p.substring(start, i)
            require(idx.nonEmpty && idx.forall(Character.isDigit),
              s"json_extract_scalar: unsupported path step [$idx] in $p " +
                "(keys as ['key'], indexes as [0]; wildcards/filters are not served)")
            steps += java.lang.Integer.valueOf(idx)
            i += 1
          }
        case other => throw new IllegalArgumentException(
          s"json_extract_scalar: unsupported path syntax '$other' in $p")
      }
    }
    val out = steps.result()
    lastPath.set((p, out))
    out
  }

  /** Presto json_extract_scalar: walk the path in the PARSED document and
    * return the node's text only when it is a true JSON scalar (string /
    * number / boolean). Objects, arrays, JSON null, path misses, and
    * malformed documents return SQL NULL. Classifying by parsed node type
    * (not by the extracted text's shape) keeps a legitimate string scalar
    * whose value starts with '[' or '{' — e.g. {"a":"[x]"} — a string,
    * where a get_json_object+regex reimplementation misreads it. */
  def jsonExtractScalar(json: UTF8String, path: UTF8String): UTF8String = {
    val steps = parseJsonPath(path.toString)
    var node: com.fasterxml.jackson.databind.JsonNode =
      try jsonMapper.readTree(json.toString)
      catch { case _: Exception => return null }
    var i = 0
    while (i < steps.length && node != null) {
      steps(i) match {
        case key: String => node = if (node.isObject) node.get(key) else null
        case idx: java.lang.Integer =>
          node = if (node.isArray) node.get(idx.intValue) else null
      }
      i += 1
    }
    if (node == null || node.isNull || node.isContainerNode) null
    else UTF8String.fromString(node.asText())
  }
}

/** cosine_sim(array<float>, array<float>) -> double */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosineF($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** dot_product_d(array<double>, array<double>) -> double — the exact
  * sequential left fold `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, e) -> acc + e)` as ONE codegen call: same IEEE addition order,
  * same null semantics (null input, length mismatch, or a null element
  * all yield NULL — zip_with pads the shorter side with nulls and the
  * fold absorbs them), none of the higher-order-function machinery.
  * HOFs are CodegenFallback: each row pays interpreted lambda eval plus
  * an intermediate products array — the a11/a13/a18 ADC/PQ hot path
  * measured 2-3x slower than this kernel on the same arithmetic. */
case class DotProductD(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.Kernels.dotD($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductD =
    copy(left = l, right = r)
}

/** zip_eq_count(array<bigint>, array<bigint>) -> int — the exact value
  * of `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v)
  * -> acc + v)`: equal positions count 1; a null element, or a position
  * only one side has (zip_with pads the shorter side with nulls), makes
  * `x = y` NULL and IF(NULL,...) takes the 0 branch — so the count runs
  * over the common prefix and the result is never null for non-null
  * inputs. The d09 signature-agreement hot path (128 positions per
  * candidate pair through interpreted HOF eval before this). */
case class ZipEqCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.zipEqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.zipEqCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZipEqCount =
    copy(left = l, right = r)
}

/** dot_product_fd(array<float>, array<double>) -> double — the float-
  * corpus variant of [[DotProductD]]: each float widens exactly to
  * double before the multiply, replicating `zip_with(f, d, (x, y) ->
  * x * y)`'s implicit cast, same fold order and null semantics. The
  * a03/a08 hyperplane-signature hot path (16-64 planes per row). */
case class FloatDotProductD(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.Kernels.dotFD($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDotProductD =
    copy(left = l, right = r)
}

/** json_extract_scalar(json, path) -> string — Presto semantics: text of
  * a true JSON SCALAR at the path, NULL for objects/arrays/JSON-null/
  * misses/malformed input. Type-classified on the parsed node (see
  * Kernels.jsonExtractScalar), unlike get_json_object whose text output
  * can't distinguish a string scalar that LOOKS like JSON. */
case class JsonExtractScalar(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(json: Any, path: Any): Any =
    Kernels.jsonExtractScalar(json.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) => s"""
      ${ev.value} = graft.functions.Kernels.jsonExtractScalar($j, $p);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonExtractScalar =
    copy(left = l, right = r)
}

/** minhash_sig(array<string>, k) -> array<bigint> */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(in: Any): Any =
    Kernels.minhash(in.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhash($c, $k)")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** winnow_fps(array<string>, w) -> array<bigint> — distinct w-window
  * minima of per-shingle hash64 values (the MOSS fingerprint set). */
case class WinnowFingerprints(child: Expression, w: Int)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(in: Any): Any =
    Kernels.winnow(in.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnow($c, $w)")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** shingle_hash64(array<string> words, k) -> array<bigint> — per-position
  * k-word shingle hash64s (see [[Kernels.shingleHash64]]). */
case class ShingleHash64(child: Expression, k: Int)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(in: Any): Any =
    Kernels.shingleHash64(in.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleHash64($c, $k)")

  override protected def withNewChildInternal(c: Expression): ShingleHash64 =
    copy(child = c)
}

/** simhash64(array<string>) -> bigint */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.simhash(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** hash64(string, seed) -> bigint — FNV-1a64 + splitmix64 finalizer.
  * The building block of graft's order-independent checksum aggregate
  * (Presto's checksum(): bit_xor of per-row hash64). */
case class Hash64(child: Expression, seed: Long)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.hash64(in.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.hash64($c, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Hash64 =
    copy(child = c)
}

/** hashed_ngram_buckets(array<string> words, seed, bits) -> array<bigint>
  * — fused "u "-marked unigram + "b "-marked bigram feature buckets
  * (hashing trick, 2^bits buckets); see [[Kernels.hashedNgramBuckets]].
  * The t25 DSIR featurizer's hot path. */
case class HashedNgramBuckets(child: Expression, seed: Long, bits: Int)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(in: Any): Any =
    Kernels.hashedNgramBuckets(in.asInstanceOf[ArrayData], seed, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.hashedNgramBuckets($c, ${seed}L, $bits)")

  override protected def withNewChildInternal(c: Expression): HashedNgramBuckets =
    copy(child = c)
}

/** hashed_ngram_score(array<string> words, seed) ->
  * struct<n_feat: int, score_sum: bigint> — fused hashed-linear
  * classifier score (t23); see [[Kernels.hashedNgramScore]]. */
case class HashedNgramScore(child: Expression, seed: Long)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_feat", IntegerType, nullable = false),
    StructField("score_sum", LongType, nullable = false)))

  override protected def nullSafeEval(in: Any): Any =
    Kernels.hashedNgramScore(in.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.hashedNgramScore($c, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): HashedNgramScore =
    copy(child = c)
}

/** fingerprint64(string) -> bigint (normalized rolling hash) */
case class RollingFingerprint(child: Expression)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.fingerprint(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.fingerprint($c)")

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

/** hamming64(bigint, bigint) -> int */
case class Hamming64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hamming64($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
    copy(left = l, right = r)
}

/** bing_tile_quadkey(lat, lon, zoom) -> string — Presto's
  * bing_tile_at + bing_tile_quadkey composed; zoom bounded to Presto's
  * 1..23 (quadkey length = zoom). */
case class BingTileQuadkey(left: Expression, right: Expression, zoom: Int)
  extends BinaryExpression {

  require(zoom >= 1 && zoom <= 23,
    s"bing_tile_quadkey: zoom must be in [1, 23], got $zoom")

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.bingTileQuadkey(a.asInstanceOf[Double], b.asInstanceOf[Double], zoom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Kernels.bingTileQuadkey($a, $b, $zoom)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BingTileQuadkey =
    copy(left = l, right = r)
}

/** normalize_unicode(string, NFC|NFD|NFKC|NFKD) -> string — Presto
  * 0.248's normalize(string, form) (presto-docs string functions; default
  * form NFC). Codegen-native: one static call per row, the common
  * already-normalized case returns the input without allocating, and the
  * expression stays inside the scan stage's whole-stage-codegen span —
  * the property that matters when this runs as the first cleaning step
  * over 100 TB of crawl text. */
case class NormalizeUnicode(child: Expression, form: String)
  extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"normalize_unicode: form must be NFC|NFD|NFKC|NFKD, got $form")

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(in: Any): Any =
    Kernels.normalizeUtf8(in.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Kernels.normalizeUtf8($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(c: Expression): NormalizeUnicode =
    copy(child = c)
}

/** haversine_km(lat1, lon1, lat2, lon2) -> double — great-circle
  * distance in km (Presto great_circle_distance). */
case class HaversineKm(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Kernels.haversineKm(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.Kernels.haversineKm($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): HaversineKm =
    copy(first = f, second = s, third = t, fourth = q)
}

/** point_in_polygon(px, py, xs array<double>, ys array<double>) ->
  * boolean — ray casting against a closed ring (Presto ST_Contains,
  * point-in-ring case). */
case class PointInPolygon(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Kernels.pointInPolygon(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.Kernels.pointInPolygon($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PointInPolygon =
    copy(first = f, second = s, third = t, fourth = q)
}

/**
 * geometric_mean(double) -> double — Presto's geometric_mean aggregate,
 * which Spark's function library lacks, as a native DeclarativeAggregate:
 * the buffer is (sum of logs, count), so partial (map-side) aggregation
 * and codegen come for free from the algebraic form — exactly how a
 * custom aggregate should scale (merge is two additions, state is 16
 * bytes regardless of group size). Presto computes exp(avg(ln(x))) over
 * IEEE doubles, so out-of-domain inputs PROPAGATE rather than being
 * filtered: a negative or NaN input poisons the group to NaN
 * (ln off-domain), a zero drives it to 0 (exp(-inf)). This aggregate
 * reproduces that propagation exactly. Nulls are skipped, as in every
 * SQL aggregate; an all-null group evaluates to null.
 */
case class GeometricMean(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private lazy val sumLog = AttributeReference("sumLog", DoubleType, nullable = false)()
  private lazy val n = AttributeReference("n", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sumLog, n)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0L))

  private def x: Expression = Cast(child, DoubleType)

  // Presto's ln over doubles: ln(x>0) real, ln(0) = -Infinity, ln(x<0)
  // and ln(NaN) = NaN. Spark's Log returns NULL off-domain and the
  // buffer is non-nullable, so the two poison branches are spelled out.
  // (NaN ranks above 0 under Spark's ordering, so a NaN input takes the
  // Log branch — whose NaN <= 0 guard is a primitive comparison that
  // NaN fails, yielding Math.log(NaN) = NaN. Both routes poison.)
  private def lnPresto: Expression =
    If(GreaterThan(x, Literal(0.0)), Log(x),
      If(EqualTo(x, Literal(0.0)), Literal(Double.NegativeInfinity),
        Literal(Double.NaN)))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNotNull(child), Add(sumLog, lnPresto), sumLog),
    If(IsNotNull(child), Add(n, Literal(1L)), n))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumLog.left, sumLog.right),
    Add(n.left, n.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(n, Literal(0L)), Literal(null, DoubleType),
      Exp(Divide(sumLog, Cast(n, DoubleType))))

  override protected def withNewChildInternal(c: Expression): GeometricMean =
    copy(child = c)
}

/**
 * bloom_build(string) -> binary — aggregate a string column into a
 * fixed-size Bloom filter (the Presto-side analog is the engine's
 * runtime dynamic filtering; here it is a first-class aggregate so a
 * pipeline can materialize a membership sketch and ship it).
 *
 * Scale shape: the buffer is a CONSTANT `numBits/8` bytes regardless of
 * input cardinality, partials merge by bytewise OR (commutative,
 * associative), so the plan is a map-side-combined tree-reduce to one
 * 64 KiB-ish blob — the driver never holds more than the filter itself.
 * Deterministic: the bit positions come from the same FNV-1a64+mix
 * kernel as the MinHash family, so the same inputs give the same bytes
 * on every engine/JVM.
 */
case class BloomFilterBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Byte]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(numBits > 0 && (numBits & 7) == 0,
    s"bloom_build: numBits must be a positive multiple of 8, got $numBits")
  require(numHashes > 0, s"bloom_build: numHashes must be positive, got $numHashes")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits >>> 3)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Kernels.bloomSet(buf, v.asInstanceOf[UTF8String], numHashes)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BloomFilterBuild =
    copy(child = c)
}

/** bloom_might_contain(binary, string) -> boolean — codegen'd probe
  * against a [[BloomFilterBuild]] filter: false is definite absence,
  * true is presence-or-false-positive, so it is a PREFILTER — an exact
  * confirm must follow wherever false positives matter. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    Kernels.bloomTest(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.Kernels.bloomTest($b, $v, $numHashes)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}

/**
 * quantile_sketch_agg(bin) -> array<bigint> — the SQL-surface form of the
 * [[graft.operators.QuantileSketch]] histogram sketch (Presto parity:
 * qdigest_agg, which 0.248 exposes as a SQL aggregate): per-group bin
 * counts as a dense array indexed by 1-based bin. The buffer grows to the
 * highest bin actually seen (so callers don't pass a bins constant), is
 * merged by elementwise addition (commutative, associative — map-side
 * combine for free), and is CONSTANT-sized per group regardless of group
 * cardinality: the scale shape that makes a two-level percentile rollup
 * (leaf sketch → merged sketch) run without re-touching the corpus.
 * Deterministic by construction — unlike qdigest's engine-defined
 * internals, the array is hash-verifiable cross-engine.
 */
case class QuantileSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  /** Runaway-memory guard: a bin index beyond this is a caller bug (the
    * q115 topology uses 256), not a bigger sketch. */
  private val MaxBins = 1 << 20

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def grown(buf: Array[Long], n: Int): Array[Long] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val bin = v match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"quantile_sketch_agg: bin must be integral, got $other")
      }
      require(bin >= 1 && bin <= MaxBins,
        s"quantile_sketch_agg: bin must be in [1, $MaxBins], got $bin")
      val b = grown(buf, bin.toInt)
      b(bin.toInt - 1) += 1
      b
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val m = grown(a, b.length)
    var i = 0
    while (i < b.length) { m(i) += b(i); i += 1 }
    m
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
}

/**
 * quantile_sketch_merge(array<bigint>) -> array<bigint> — Presto's
 * merge(qdigest) for the graft sketch: elementwise-sum already-reduced
 * sketches, so a rollup level aggregates O(groups x bins) sketch rows and
 * never re-touches the corpus. Shorter arrays pad with zeros (a leaf that
 * never saw high bins merges correctly).
 */
case class QuantileSketchMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val m = if (buf.length >= arr.numElements()) buf
        else java.util.Arrays.copyOf(buf, arr.numElements())
      var i = 0
      while (i < arr.numElements()) { m(i) += arr.getLong(i); i += 1 }
      m
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val m = if (a.length >= b.length) a else java.util.Arrays.copyOf(a, b.length)
    var i = 0
    while (i < b.length) { m(i) += b(i); i += 1 }
    m
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): QuantileSketchMerge =
    copy(child = c)
}

/** edge_bin(array<double> edges, x) -> int — the histogram-sketch bin
  * decision (see [[Kernels.edgeBin]]): count of sorted edges <= x,
  * clamped to >= 1, by codegen binary search. The one bin function the
  * q115/e12/s09 topologies share with their oracles' count-of-edges
  * replay. */
case class EdgeBin(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(edges: Any, x: Any): Any =
    Kernels.edgeBin(edges.asInstanceOf[ArrayData], x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, x) => s"graft.functions.Kernels.edgeBin($e, $x)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): EdgeBin =
    copy(left = l, right = r)
}

/** sketch_quantile_bin(array<bigint>, p) -> int — the CDF read of the
  * histogram sketch: the smallest 1-based bin whose cumulative count
  * reaches ceil(total * p), exactly the q115 kernel's
  * `min(bin where cum >= ceil(total * p))` pick (and the DuckDB oracle's
  * replay of it), so `element_at(edges, sketch_quantile_bin(sk, p))`
  * reads the same quantile value the DataFrame topology reports.
  * Codegen'd via the static kernel; runs over already-aggregated sketch
  * rows, never the corpus. */
case class SketchQuantileBin(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(sk: Any, p: Any): Any =
    Kernels.sketchQuantileBin(sk.asInstanceOf[ArrayData], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, p) => s"graft.functions.Kernels.sketchQuantileBin($sk, $p)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchQuantileBin =
    copy(left = l, right = r)
}

/** Shared shape for the n-ary geometry predicates (Catalyst ships fixed
  * helpers only up to QuaternaryExpression; segment-segment needs 8
  * doubles, point-segment 6): children all cast to double upstream, one
  * static-kernel call per row, full codegen with standard null
  * short-circuiting so the expression stays inside whole-stage spans. */
trait NaryDoubleKernel extends Expression {
  /** Fully-qualified static kernel, e.g.
    * "graft.functions.Kernels.segmentsIntersect". */
  protected def kernel: String
  /** Java type + neutral initial value of the result. */
  protected def javaType: String
  protected def javaInit: String
  protected def evalKernel(args: Array[Double]): Any

  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val args = new Array[Double](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      args(i) = v.asInstanceOf[Double]
      i += 1
    }
    evalKernel(args)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val childCode = gens.map(_.code).reduce(_ + _)
    val callArgs = gens.map(_.value.toString).mkString(", ")
    if (nullable) {
      val anyNull = gens.map(_.isNull.toString).mkString(" || ")
      ev.copy(code = childCode + code"""
        boolean ${ev.isNull} = $anyNull;
        $javaType ${ev.value} = $javaInit;
        if (!${ev.isNull}) { ${ev.value} = $kernel($callArgs); }""")
    } else {
      ev.copy(code = childCode + code"""
        $javaType ${ev.value} = $kernel($callArgs);""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }
}

/** st_intersects(x1,y1, x2,y2, x3,y3, x4,y4) -> boolean — closed-segment
  * intersection (Presto ST_Intersects' segment-segment core; reference
  * surface: Presto 0.248's geospatial plugin). Orientation-sign test +
  * collinear/touching bounding checks; see [[Kernels.segmentsIntersect]].
  * Pair with a cheap bounding-box predicate (plain comparisons) as the
  * prefilter — at scale the pruning form is a bbox/tile JOIN KEY
  * (bing_tile_quadkey) so candidate pairs never materialize. */
case class SegmentsIntersect(children: IndexedSeq[Expression])
  extends NaryDoubleKernel {
  require(children.length == 8,
    s"st_intersects takes 8 coordinates (two segments), got ${children.length}")

  override def dataType: DataType = BooleanType
  override protected def kernel: String = "graft.functions.Kernels.segmentsIntersect"
  override protected def javaType: String = "boolean"
  override protected def javaInit: String = "false"
  override protected def evalKernel(a: Array[Double]): Any =
    Kernels.segmentsIntersect(a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SegmentsIntersect =
    copy(children = newChildren)
}

/** st_distance(px,py, x1,y1, x2,y2) -> double — Euclidean distance from
  * a point to a closed segment (Presto ST_Distance's point-to-segment
  * core); see [[Kernels.pointSegmentDist]]. */
case class PointSegmentDist(children: IndexedSeq[Expression])
  extends NaryDoubleKernel {
  require(children.length == 6,
    s"st_distance takes 6 coordinates (point + segment), got ${children.length}")

  override def dataType: DataType = DoubleType
  override protected def kernel: String = "graft.functions.Kernels.pointSegmentDist"
  override protected def javaType: String = "double"
  override protected def javaInit: String = "0.0"
  override protected def evalKernel(a: Array[Double]): Any =
    Kernels.pointSegmentDist(a(0), a(1), a(2), a(3), a(4), a(5))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PointSegmentDist =
    copy(children = newChildren)
}

/** st_area(xs array<double>, ys array<double>) -> double — shoelace
  * area of a closed ring (Presto ST_Area, polygon-shell case); see
  * [[Kernels.ringArea]]. */
case class RingArea(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(xs: Any, ys: Any): Any =
    Kernels.ringArea(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.ringArea($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RingArea =
    copy(left = l, right = r)
}

/** st_length(xs array<double>, ys array<double>) -> double — perimeter
  * of a closed ring (Presto ST_Length/ST_Perimeter core); see
  * [[Kernels.ringLength]]. */
case class RingLength(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(xs: Any, ys: Any): Any =
    Kernels.ringLength(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.ringLength($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RingLength =
    copy(left = l, right = r)
}

/** st_centroid_x / st_centroid_y (xs, ys arrays) -> double — one
  * coordinate of the area-weighted polygon centroid (Presto
  * ST_X/ST_Y(ST_Centroid(g))); see [[Kernels.ringCentroid]]. */
case class RingCentroid(left: Expression, right: Expression, axis: Int)
  extends BinaryExpression {
  require(axis == 0 || axis == 1, s"ring centroid axis must be 0 (x) or 1 (y), got $axis")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(xs: Any, ys: Any): Any =
    Kernels.ringCentroid(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData], axis)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.ringCentroid($a, $b, $axis)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RingCentroid =
    copy(left = l, right = r)
}

/** bpe_merge(syms, a, b) -> string — one greedy BPE merge pass over a
  * space-joined symbol string (see [[Kernels.bpeMerge]]); the t21
  * trainer's per-iteration hot path, codegen-native so the
  * vocabulary-sized merge application stays inside whole-stage codegen
  * (the lambda-HOF fold form pays interpreted eval per symbol). */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any, a: Any, b: Any): Any =
    Kernels.bpeMerge(s.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, a, b) => s"graft.functions.Kernels.bpeMerge($s, $a, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BpeMerge =
    copy(first = f, second = s, third = t)
}

/** st_geometry_from_text(wkt) -> struct(gtype, xs, ys), null on
  * malformed input — Presto ST_GeometryFromText's POINT / LINESTRING /
  * single-ring POLYGON subset, parsed straight into the coordinate-array
  * representation the ring/segment kernels consume (see
  * [[Kernels.wktParse]] for the grammar and the total-function null
  * contract). One codegen-native call per row, inside whole-stage
  * codegen — a 100 TB WKT column parses in the scan projection. */
case class WktParse(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = WktParse.geometryType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.wktParse(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Kernels.wktParse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): WktParse =
    copy(child = c)
}

/** st_area_wkt(string) -> double — shoelace area of a WKT POLYGON with
  * holes subtracted; parse + area in one codegen pass, null on malformed
  * text (see [[Kernels.stAreaWkt]]). */
case class StAreaWkt(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.stAreaWkt(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val tmp = ctx.freshName("areaRes")
      s"""
      java.lang.Double $tmp = graft.functions.Kernels.stAreaWkt($c);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildInternal(c: Expression): StAreaWkt =
    copy(child = c)
}

/** st_contains_wkt(string, x, y) -> boolean — point containment in a WKT
  * POLYGON honoring holes (in shell, not in any hole); null on malformed
  * text (see [[Kernels.stContainsWkt]]). */
case class StContainsWkt(first: Expression, second: Expression,
                         third: Expression)
  extends TernaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(w: Any, x: Any, y: Any): Any =
    Kernels.stContainsWkt(w.asInstanceOf[UTF8String],
      x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (w, x, y) =>
      val tmp = ctx.freshName("containsRes")
      s"""
      java.lang.Boolean $tmp = graft.functions.Kernels.stContainsWkt($w, $x, $y);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.booleanValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): StContainsWkt =
    copy(first = f, second = s, third = t)
}

/** st_num_interior_rings(string) -> int — hole count of a WKT POLYGON
  * (Presto ST_NumInteriorRing); null on malformed text. */
case class StNumInteriorRings(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.stNumInteriorRings(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val tmp = ctx.freshName("nringsRes")
      s"""
      java.lang.Integer $tmp = graft.functions.Kernels.stNumInteriorRings($c);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.intValue(); }
      """
    })

  override protected def withNewChildInternal(c: Expression): StNumInteriorRings =
    copy(child = c)
}

/** st_num_geometries(string) -> int — part count of a WKT POLYGON /
  * MULTIPOLYGON (Presto ST_NumGeometries); null on malformed text. */
case class StNumGeometries(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.stNumGeometries(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val tmp = ctx.freshName("ngeomRes")
      s"""
      java.lang.Integer $tmp = graft.functions.Kernels.stNumGeometries($c);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.intValue(); }
      """
    })

  override protected def withNewChildInternal(c: Expression): StNumGeometries =
    copy(child = c)
}

object WktParse {
  /** The parsed-geometry struct: the same (xs, ys) closed-ring /
    * vertex-list convention as st_area / st_length / point_in_polygon. */
  val geometryType: StructType = StructType(Seq(
    StructField("gtype", StringType, nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("ys", ArrayType(DoubleType, containsNull = false), nullable = false)))
}

/** st_as_text(gtype, xs, ys) -> string — Presto ST_AsText; the exact
  * inverse of [[WktParse]] (shortest-round-trip double text). Null on
  * tags/shapes outside the subset. */
case class WktText(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override protected def nullSafeEval(t: Any, xs: Any, ys: Any): Any =
    Kernels.wktText(t.asInstanceOf[UTF8String],
      xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = graft.functions.Kernels.wktText($a, $b, $c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WktText =
    copy(first = f, second = s, third = t)
}

/** word_stem(string) -> string — Presto's Porter stemmer (word_stem(x)
  * with the default 'en' stemmer serves the 1980 Porter algorithm).
  * Non-lowercase-letter inputs pass through unchanged, like Presto's
  * behavior on non-words. */
case class WordStem(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override protected def nullSafeEval(in: Any): Any =
    Kernels.porterStem(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.porterStem($c)")

  override protected def withNewChildInternal(c: Expression): WordStem =
    copy(child = c)
}

/** ngrams(array<string>, n) -> array<array<string>> — Presto's user-facing
  * ngrams(): every length-n sliding window; n >= length yields one n-gram
  * holding the whole array (Presto's convention). The hashed-n-gram
  * KERNELS (hashedNgramBuckets/Score) remain the shuffle-narrow scale
  * path; this is the exploratory SQL surface. */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngrams: n must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  // inner containsNull mirrors the INPUT array's: ngrams copies elements
  // verbatim (Presto's convention), so an input that can hold NULL
  // elements yields grams that can too — declaring false there while
  // copying nulls would hand codegen a schema it can mis-read
  override def dataType: DataType = {
    val inner = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    ArrayType(ArrayType(StringType, containsNull = inner), containsNull = false)
  }

  override protected def nullSafeEval(in: Any): Any =
    Kernels.ngrams(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.ngrams($c, $n)")

  override protected def withNewChildInternal(c: Expression): NGrams =
    copy(child = c)
}

/** hmac_<algo>(binary, binary) -> binary — Presto's keyed digest family
  * (RFC 2104; hmac_md5 / hmac_sha1 / hmac_sha256 / hmac_sha512); data
  * first, key second, like Presto. `algo` is the JCA Mac name. */
case class HmacDigest(left: Expression, right: Expression, algo: String)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(data: Any, key: Any): Any =
    Kernels.hmac(data.asInstanceOf[Array[Byte]], key.asInstanceOf[Array[Byte]], algo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, k) => s"""graft.functions.Kernels.hmac($d, $k, "$algo")""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HmacDigest =
    copy(left = l, right = r)
}
