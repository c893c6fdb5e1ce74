package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.FastDoubleToDecimal

/**
 * FastDoubleToDecimal must be value-for-value identical to the built-in
 * `Cast(double AS decimal(p, s))` — nulls, digits, signs, errors — or the
 * optimizer swap silently forks every decimal-exact aggregate. The spec
 * compares the two expressions directly over adversarial domains (the
 * rule rewrites casts globally, so the built-in side is evaluated through
 * the INTERPRETED expression, outside the optimizer's reach).
 */
class FastDecimalCastSpec extends GraftSpec {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, EvalMode, Literal}

  /** Interpreted Spark cast vs interpreted fast cast on one value. */
  private def both(d: Double, p: Int, s: Int): (Any, Any) = {
    val in = BoundReference(0, DoubleType, nullable = true)
    val row = InternalRow(d)
    val slow = Cast(in, DecimalType(p, s), None, EvalMode.LEGACY).eval(row)
    val fast = FastDoubleToDecimal(in, p, s, ansi = false, None).eval(row)
    (slow, fast)
  }

  private def assertSame(d: Double, p: Int = 18, s: Int = 2): Unit = {
    val (slow, fast) = both(d, p, s)
    assert(slow == fast, s"cast($d AS decimal($p,$s)): builtin=$slow fast=$fast")
  }

  test("adversarial literals: halfway, negatives, zero signs, tiny, huge") {
    Seq(0.0, -0.0, 1.005, -1.005, 2.675, -2.675, 0.1, 0.01, 123456789.994999,
      1e-300, -1e-300, 4.9e-324, 1e15, -1e15, 2.1e15, 9.99e17, -9.99e17,
      1e17, 1e18, -1e18, 38123.45, 0.005, -0.005, 0.004999999999999999,
      1.0 / 3.0, math.Pi, 1e9 + 0.005, 123.456, -123.456)
      .foreach(assertSame(_))
  }

  test("NaN and infinities go null exactly like the builtin") {
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity).foreach { d =>
      val (slow, fast) = both(d, 18, 2)
      assert(slow == null && fast == null, s"$d: builtin=$slow fast=$fast")
    }
  }

  test("randomized sweep across magnitudes and scales matches the builtin") {
    val rnd = new scala.util.Random(20260819L)
    for (_ <- 1 to 20000) {
      val mag = math.pow(10, rnd.nextInt(24) - 6)
      val d = (rnd.nextDouble() - 0.5) * mag
      val s = rnd.nextInt(7)
      val p = s + 1 + rnd.nextInt(18 - s)
      val (slow, fast) = both(d, p, s)
      assert(slow == fast, s"cast($d AS decimal($p,$s)): builtin=$slow fast=$fast")
    }
  }

  test("exact-centi doubles (the monetary domain) hit identical decimals") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 20000) {
      val cents = rnd.nextLong() % 100000000000L
      val d = cents / 100.0
      assertSame(d)
      assertSame(d, 18, 6)
    }
  }

  test("ANSI overflow throws like the builtin; in-range ANSI values agree") {
    val in = BoundReference(0, DoubleType, nullable = true)
    val fastA = FastDoubleToDecimal(in, 8, 2, ansi = true, None)
    val thrown = intercept[Exception] { fastA.eval(InternalRow(12345678.9)) }
    val builtin = intercept[Exception] {
      Cast(in, DecimalType(8, 2), None, EvalMode.ANSI).eval(InternalRow(12345678.9))
    }
    assert(thrown.getClass == builtin.getClass,
      s"fast threw ${thrown.getClass}, builtin ${builtin.getClass}")
    assert(fastA.eval(InternalRow(123456.78)) ==
      Cast(in, DecimalType(8, 2), None, EvalMode.ANSI).eval(InternalRow(123456.78)))
  }

  test("the optimizer rule rewrites the dsum cast and results are unchanged") {
    val df = spark.range(1000).select(
      (col("id").cast("double") * 1.01 - 3.345).as("d"))
    val agg = df.agg(sum(col("d").cast(DecimalType(18, 2))).cast("double").as("s"))
    val optimized = agg.queryExecution.optimizedPlan.toString
    assert(optimized.contains("fast_decimal_cast"),
      s"rule did not fire:\n$optimized")
    // same result as the interpreted built-in cast over the collected rows
    val expected = df.collect().map { r =>
      val v = Cast(Literal(r.getDouble(0), DoubleType), DecimalType(18, 2),
        None, EvalMode.LEGACY).eval(InternalRow.empty)
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal
    }.sum
    val got = agg.collect().head.getDouble(0)
    assert(got == expected.toDouble, s"got $got expected $expected")
  }

  test("TRY casts keep the built-in cast") {
    val df = spark.range(10).selectExpr("try_cast(cast(id as double) as decimal(18,2)) v")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("fast_decimal_cast"), optimized)
  }

  test("codegen and interpreted paths agree") {
    val rnd = new scala.util.Random(7L)
    // magnitudes capped below decimal(18,4)'s 10^14 range so the ANSI
    // session cast cannot overflow-throw; overflow parity is pinned above
    val vals = (1 to 5000).map(_ => (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(16) - 4)) ++
      Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 1.005, -0.0)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](vals.map(v => Row(v: java.lang.Double)).asJava),
      StructType(Seq(StructField("d", DoubleType))))
    val viaPlan = df.select(col("d").cast(DecimalType(18, 4)).as("c")).collect().map(_.get(0))
    val in = BoundReference(0, DoubleType, nullable = true)
    val interp = FastDoubleToDecimal(in, 18, 4, ansi = false, None)
    val viaInterp = vals.map { v =>
      val r = interp.eval(InternalRow(v))
      if (r == null) null else r.asInstanceOf[Decimal].toJavaBigDecimal
    }
    viaPlan.zip(viaInterp).zip(vals).foreach { case ((a, b), v) =>
      assert(a == b, s"value $v: plan=$a interp=$b")
    }
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
