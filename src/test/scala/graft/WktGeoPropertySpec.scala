package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{stAreaWkt, stContainsWkt}

/** Randomized property harness for the WKT geometry kernels (the
  * HashedNgramPropertySpec discipline applied to the geo family): seeded
  * random star-shaped polygons — radii drawn around a center, so every
  * instance is simple (non-self-intersecting) by construction without
  * being axis-aligned or hand-picked — checked against definitional
  * driver-side implementations: the shoelace formula for `st_area_wkt`
  * and an even-odd ray cast for `st_contains_wkt`, including holed
  * variants (a 0.4-scaled copy of the ring as an interior ring).
  * Probe points are continuous random draws, so exact boundary hits —
  * the only place two correct point-in-polygon conventions may disagree
  * — have probability zero. */
class WktGeoPropertySpec extends GraftSpec {

  private def fmt(v: Double): String = BigDecimal(v)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString

  /** Star-shaped ring: n vertices at equal angles, seeded radii. */
  private def ring(rnd: scala.util.Random, cx: Double, cy: Double,
                   n: Int, scale: Double): Seq[(Double, Double)] = {
    val pts = (0 until n).map { k =>
      val a = 2 * math.Pi * k / n
      val r = (1.0 + 4.0 * rnd.nextDouble()) * scale
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
    pts :+ pts.head
  }

  private def wktOf(rings: Seq[Seq[(Double, Double)]]): String =
    rings.map(_.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }
      .mkString("(", ", ", ")")).mkString("POLYGON (", ", ", ")")

  /** Definitional shoelace area (absolute value), independent code. */
  private def shoelace(r: Seq[(Double, Double)]): Double =
    math.abs(r.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      x1 * y2 - x2 * y1
    }.sum / 2.0)

  /** Even-odd ray cast, independent code (half-open edge rule). */
  private def rayCast(r: Seq[(Double, Double)], px: Double, py: Double): Boolean = {
    var in = false
    r.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      if ((y1 > py) != (y2 > py)) {
        val xi = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
        if (px < xi) in = !in
      }
    }
    in
  }

  test("random star polygons: st_area_wkt matches the shoelace formula") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 30).foreach { i =>
      val n = 3 + rnd.nextInt(10)
      val outer = ring(rnd, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10,
        n, 1.0)
      // the kernel parses the ROUNDED text, so the reference must too
      val parsed = outer.map { case (x, y) => (fmt(x).toDouble, fmt(y).toDouble) }
      val want = shoelace(parsed)
      val got = spark.range(1).select(stAreaWkt(lit(wktOf(Seq(outer)))))
        .head().getDouble(0)
      assert(math.abs(got - want) <= 1e-9 * math.max(1.0, want),
        s"case $i (n=$n): area $got != shoelace $want")
    }
  }

  test("random holed polygons: area subtracts the hole; containment is ring XOR hole") {
    val rnd = new scala.util.Random(42L)
    (1 to 20).foreach { i =>
      val cx = rnd.nextDouble() * 10 - 5; val cy = rnd.nextDouble() * 10 - 5
      val n = 4 + rnd.nextInt(8)
      val outer = ring(rnd, cx, cy, n, 1.0)
      // hole: the same-shape ring scaled 0.4 about the center — strictly
      // inside because every radius shrinks toward the star center
      val hole = outer.map { case (x, y) =>
        (cx + (x - cx) * 0.4, cy + (y - cy) * 0.4)
      }
      val po = outer.map { case (x, y) => (fmt(x).toDouble, fmt(y).toDouble) }
      val ph = hole.map { case (x, y) => (fmt(x).toDouble, fmt(y).toDouble) }
      val wkt = wktOf(Seq(outer, hole))
      val want = shoelace(po) - shoelace(ph)
      val got = spark.range(1).select(stAreaWkt(lit(wkt))).head().getDouble(0)
      assert(math.abs(got - want) <= 1e-9 * math.max(1.0, want),
        s"case $i: holed area $got != $want")
      // 20 random probes per polygon vs the definitional ray cast
      (1 to 20).foreach { _ =>
        val px = cx + rnd.nextDouble() * 12 - 6
        val py = cy + rnd.nextDouble() * 12 - 6
        val wantIn = rayCast(po, px, py) && !rayCast(ph, px, py)
        val gotIn = spark.range(1)
          .select(stContainsWkt(lit(wkt), lit(px), lit(py)))
          .head().getBoolean(0)
        assert(gotIn == wantIn, s"case $i: contains($px,$py) $gotIn != $wantIn")
      }
    }
  }
}
