package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property-based equivalence for [[RangeBucketJoinRule]]: for random
  * band tables (adjacent, overlapping, disjoint, and empty-interval
  * bands — including fractional and negative bounds) and random probe
  * values, the rewritten join returns exactly the rows of the plain
  * BETWEEN join. Plain ScalaCheck Gen with fixed seeds, as in
  * MapReducePropSpec.
  */
class RangeBucketJoinPropSpec extends AnyFunSuite {
  import TestSpark._

  private val boundGen: Gen[Double] =
    Gen.chooseNum(-40.0, 40.0).map(d => math.rint(d * 4) / 4) // quarter grid

  private val bandsGen: Gen[List[(Long, Double, Double)]] =
    Gen.choose(1, 12).flatMap { n =>
      Gen.listOfN(n, Gen.zip(boundGen, boundGen)).map(_.zipWithIndex.map {
        case ((a, b), i) => (i.toLong, math.min(a, b), math.max(a, b))
      })
    }

  private val probeGen: Gen[List[Double]] =
    Gen.listOfN(200, Gen.chooseNum(-45.0, 45.0).map(d => math.rint(d * 8) / 8))

  private def runRound(
      bands: List[(Long, Double, Double)], probes: List[Double],
      label: String): Unit = {
    import spark.implicits._
    val b = bands.toDF("band_id", "lo", "hi")
    val p = probes.zipWithIndex.map { case (v, id) => (id.toLong, v) }.toDF("row_id", "v")
    def join() = p.join(b, col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("row_id"), col("band_id"))
    val plain = join().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeBucketJoinRule
    val rewritten =
      try join().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeBucketJoinRule)
    assert(rewritten == plain, s"$label: rule changed the result")
    // sanity vs a local recompute, so both paths are anchored
    val local = (for {
      (id, v) <- probes.zipWithIndex.map { case (v, id) => (id.toLong, v) }
      (bid, lo, hi) <- bands if v >= lo && v < hi
    } yield (id, bid)).toSet
    assert(plain == local, s"$label: Spark differs from local recompute")
  }

  test("rewritten range join == plain range join on random bands and probes") {
    (0 until 10).foreach { i =>
      val bands = bandsGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail("gen failed"))
      val probes = probeGen(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(fail("gen failed"))
      runRound(bands, probes, s"seed $i")
    }
  }

  // Non-dyadic bounds: n/7 and n/3 are never binary-exact, so every
  // division in the bucket math carries IEEE rounding — the regime
  // where ceil(h/w)-1 band expansion silently dropped boundary rows.
  // Probes include every band's exact lo and hi (the inclusive and
  // exclusive edges themselves).
  private val uglyBoundGen: Gen[Double] =
    Gen.chooseNum(-280, 280).map(n => n / 7.0)

  test("rewrite survives non-dyadic bounds with probes on the exact band edges") {
    (0 until 10).foreach { i =>
      val bands = Gen.choose(1, 12).flatMap { n =>
        Gen.listOfN(n, Gen.zip(uglyBoundGen, uglyBoundGen)).map(_.zipWithIndex.map {
          case ((a, b), j) => (j.toLong, math.min(a, b), math.max(a, b))
        })
      }(Gen.Parameters.default, Seed(7000L + i)).getOrElse(fail("gen failed"))
      val grid = Gen.listOfN(150, Gen.chooseNum(-900, 900).map(n => n / 3.0))(
        Gen.Parameters.default, Seed(8000L + i)).getOrElse(fail("gen failed"))
      val edges = bands.flatMap { case (_, lo, hi) => Seq(lo, hi, math.nextDown(hi)) }
      runRound(bands, grid ++ edges, s"ugly seed $i")
    }
  }

  test("extreme probe values fall out of the join instead of overflowing the bucket cast") {
    // floor(1e19 / w) leaves long range; the TRY cast must yield a
    // null bucket (no match) — ANSI mode would otherwise fail the query
    val bands = List((0L, 0.0, 1.0), (1L, 1.0, 3.5))
    val probes = List(0.5, 1e19, -1e19, Double.MaxValue, 2.0)
    runRound(bands, probes, "extremes")
  }
}
