package graft.mr

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-based check of the MapReduce contract on generated data:
  * for arbitrary key/value bags and shuffle partition counts, the
  * distributed result equals the sequential one (SURVEY.md §5 — the
  * invariant the reference's salted hash() partitioning violates,
  * reference worker.py:136). Plain ScalaCheck Gen with fixed seeds
  * (scalatestplus isn't among the offline deps).
  */
class MapReducePropSpec extends AnyFunSuite {
  import TestSpark._

  private val kvGen: Gen[List[(String, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), Gen.chooseNum(-50, 50)))

  test("distributed result == sequential result for random bags and partitionings") {
    import spark.implicits._
    val partChoices = Seq(1, 3, 17)
    (0 until 8).foreach { i =>
      val kvs = kvGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail("gen failed"))
      val parts = partChoices(i % partChoices.length)
      val expected = kvs.groupBy(_._1).map { case (k, g) =>
        (k, g.map(_._2.toLong).sum, g.size.toLong)
      }.toSet
      val got = withShufflePartitions(parts) {
        MapReduce.run[(String, Int), String, Long, (String, Long, Long)](
          spark.createDataset(kvs),
          kv => Iterator((kv._1, kv._2.toLong)),
          (k, vs) => { val l = vs.toList; Iterator((k, l.sum, l.size.toLong)) })
          .collect().toSet
      }
      assert(got == expected, s"seed $i, partitions $parts")
    }
  }

  test("combiner path (runReduced) == generic path for random associative folds") {
    import spark.implicits._
    (0 until 6).foreach { i =>
      val kvs = kvGen(Gen.Parameters.default, Seed(100L + i))
        .getOrElse(fail("gen failed"))
      val ds = spark.createDataset(kvs)
      val generic = MapReduce.run[(String, Int), String, Long, (String, Long)](
        ds, kv => Iterator((kv._1, kv._2.toLong)),
        (k, vs) => Iterator((k, vs.sum))).collect().toSet
      val combined = MapReduce.runReduced[(String, Int), String, Long, (String, Long)](
        ds, kv => Iterator((kv._1, kv._2.toLong)),
        _ + _, (k, v) => (k, v)).collect().toSet
      assert(generic == combined, s"seed ${100 + i}")
    }
  }
}
