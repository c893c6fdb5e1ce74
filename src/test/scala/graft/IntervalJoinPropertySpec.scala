package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Randomized equivalence harness for the interval-join rewrite: across
  * seeded random datasets — hour-aligned and odd timestamps, zero-width /
  * inverted / sentinel-wide intervals, null bounds, empty sides — the
  * joined result under IntervalJoinRule must equal an in-memory nested
  * loop with SQL three-valued semantics. Catches boundary bugs (bucket
  * edges, inclusive/exclusive upper) that fixed cases never will. Seeds
  * are fixed, so a failure is reproducible, not flaky. */
class IntervalJoinPropertySpec extends GraftSpec {

  private val probeSchema = StructType(Seq(
    StructField("pid", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = true)))
  private val intervalSchema = StructType(Seq(
    StructField("sid", LongType, nullable = false),
    StructField("lo", TimestampType, nullable = true),
    StructField("hi", TimestampType, nullable = true)))

  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private def randTs(r: scala.util.Random): Timestamp = {
    // half the draws land exactly on hour (= bucket) boundaries to stress
    // the quantization edges; the rest are second-granular
    val secs = if (r.nextBoolean()) r.nextInt(240) * 3600L
               else r.nextInt(240 * 3600).toLong
    new Timestamp(base + secs * 1000L)
  }

  private def nullable[A](r: scala.util.Random, v: => A): Option[A] =
    if (r.nextInt(10) == 0) None else Some(v)

  test("rewritten interval join is equivalent to a nested loop on random data") {
    for (seed <- 1 to 8) {
      val r = new scala.util.Random(seed)
      val probes = (0 until r.nextInt(40)).map { i =>
        Row(i.toLong, nullable(r, randTs(r)).orNull)
      }
      val intervals = (0 until r.nextInt(30)).map { i =>
        val lo = randTs(r)
        val hi = r.nextInt(6) match {
          case 0 => lo                                         // zero-width
          case 1 => new Timestamp(lo.getTime - 3600L * 1000L)  // inverted
          case 2 => Timestamp.valueOf("9999-12-31 00:00:00")   // sentinel
          case _ => new Timestamp(lo.getTime + (r.nextInt(5 * 3600) + 1) * 1000L)
        }
        Row(i.toLong, nullable(r, lo).orNull, nullable(r, hi).orNull)
      }
      val pdf = spark.createDataFrame(
        spark.sparkContext.parallelize(probes, 3), probeSchema)
      val idf = spark.createDataFrame(
        spark.sparkContext.parallelize(intervals, 2), intervalSchema)
      // alternate upper-exclusive / upper-inclusive and join orientation
      val upperInclusive = seed % 2 == 0
      val cond = if (upperInclusive)
        col("ts") >= col("lo") && col("ts") <= col("hi")
      else col("ts") >= col("lo") && col("ts") < col("hi")
      val joined = if (seed % 3 == 0) idf.join(pdf, cond) else pdf.join(idf, cond)
      val got = joined.select(col("pid"), col("sid")).collect()
        .map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq

      val expected = (for {
        p <- probes
        iv <- intervals
        ts = p.getAs[Timestamp](1)
        lo = iv.getAs[Timestamp](1)
        hi = iv.getAs[Timestamp](2)
        if ts != null && lo != null && hi != null
        if !ts.before(lo) && (if (upperInclusive) !ts.after(hi) else ts.before(hi))
      } yield (p.getLong(0), iv.getLong(0))).sorted
      assert(got == expected,
        s"seed=$seed upperInclusive=$upperInclusive: " +
          s"${got.size} rows vs expected ${expected.size}")
    }
  }
}
