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

  test("rewritten range join == plain range join on random bands and probes") {
    import spark.implicits._
    (0 until 10).foreach { i =>
      val bands = bandsGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail("gen failed"))
      val probes = probeGen(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(fail("gen failed"))
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
      assert(rewritten == plain, s"seed $i: rule changed the result")
      // sanity vs a local recompute, so both paths are anchored
      val local = (for {
        (id, v) <- probes.zipWithIndex.map { case (v, id) => (id.toLong, v) }
        (bid, lo, hi) <- bands if v >= lo && v < hi
      } yield (id, bid)).toSet
      assert(plain == local, s"seed $i: Spark differs from local recompute")
    }
  }
}
