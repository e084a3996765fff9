package graft.sim

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SimOps.roundMicrosHalfUp]]'s fast path to the exact
  * BigDecimal semantics embedding_gram's micro-unit sums rely on
  * (the DuckDB oracle rounds through the same decimal-string HALF_UP
  * definition — one flipped cell would flip a Gram sum's last bit).
  */
class RoundMicrosSpec extends AnyFunSuite {

  private def reference(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("agrees with BigDecimal over 1e6 pseudo-random float products") {
    val rnd = new scala.util.Random(0xfeed5eedL)
    var i = 0
    while (i < 1000000) {
      // the actual input distribution: products of two float-precision
      // embedding components, spanning sign and magnitude
      val x = (rnd.nextFloat() * 20 - 10).toDouble
      val y = (rnd.nextFloat() * 20 - 10).toDouble
      val d = x * y
      assert(SimOps.roundMicrosHalfUp(d) == reference(d), s"d=$d")
      i += 1
    }
  }

  test("agrees on adversarial half-boundary and edge values") {
    val cases = Seq(
      0.0, -0.0, 0.0000005, -0.0000005, 0.0000015, -0.0000015,
      1.0000005, -1.0000005, 2.5e-6, -2.5e-6, 0.5e-6, 1.5e-6,
      // doubles just above/below exact .5 micro boundaries
      0.0000004999999999, 0.0000005000000001,
      123.4567895, -123.4567895, 123.456789499999, 123.456789500001,
      // exact integers in micro units
      1.0, -1.0, 0.000001, -0.000001, 99.999999, -99.999999,
      // large magnitudes (float-product scale)
      9.999999e9, -9.999999e9, 1.23456789e8,
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE)
    cases.foreach { d =>
      assert(SimOps.roundMicrosHalfUp(d) == reference(d), s"d=$d")
    }
    // a dense sweep across consecutive representable doubles around a
    // .5 boundary — the guard band must route all of these to the
    // exact path or prove agreement
    var d = 0.0000005
    var i = 0
    while (i < 1000) { d = Math.nextUp(d); i += 1
      assert(SimOps.roundMicrosHalfUp(d) == reference(d), s"d=$d") }
    d = 0.0000005; i = 0
    while (i < 1000) { d = Math.nextDown(d); i += 1
      assert(SimOps.roundMicrosHalfUp(d) == reference(d), s"d=$d") }
  }
}
