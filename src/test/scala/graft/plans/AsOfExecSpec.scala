package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.AsOf

/** The native as-of operator (AsOfJoinNode → AsOfJoinStrategy →
  * AsOfJoinExec): correctness against both the composed union-merge
  * form and a local brute force, plan shape (one exchange + sort per
  * side, no union, no window), partition invariance, and the
  * empty/null edge cases a streaming merge can get wrong.
  */
class AsOfExecSpec extends AnyFunSuite {
  import TestSpark._

  private def installStrategy(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Drive the exec directly with synthetic (key, time-as-timestamp,
    * payload) frames — left gets `id`, right gets `rv`.
    */
  private def nativeJoin(lRows: Seq[(Long, Long, Long)],
      rRows: Seq[(Long, Long, Double)]): DataFrame = {
    installStrategy(spark)
    import spark.implicits._
    val l = lRows.toDF("k", "id", "t_us")
      .select(col("k"), col("id"), timestamp_micros(col("t_us")).as("t"))
    val r = rRows.toDF("rk", "ru", "rv")
      .select(col("rk"), timestamp_micros(col("ru")).as("rt"), col("rv"))
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    org.apache.spark.sql.graftglue.GraftGlue.ofRows(spark,
      AsOfJoinNode(lp, rp, a(lp, "k"), a(rp, "rk"), a(lp, "t"), a(rp, "rt")))
  }

  test("native as-of equals the composed union-merge form on the fixture") {
    val native = AsOf.asofJoinNative(spark, sfSmall).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val composed = AsOf.asofJoin(spark, sfSmall).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("native as-of plans ONE merge exec: no union, no window, a shuffle+sort per side") {
    val p = AsOf.asofJoinNative(spark, sfSmall)
      .queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix: the exec prints as "AsOfJoin"
    assert(p.contains("AsOfJoin"), s"native exec not planned:\n${p.take(1500)}")
    assert(!p.contains("Union"), "composed-form union leaked into the native plan")
    assert(!p.contains("Window"), "composed-form window leaked into the native plan")
    // exactly 3: one per join side + the tie-collapse aggregate's own
    // (user_id, ts) exchange below the right side
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 3, s"expected exactly 3 exchanges, found $exchanges")
  }

  test("native as-of is partition-count invariant") {
    val base = withShufflePartitions(4) {
      AsOf.asofJoinNative(spark, sfSmall).collect()
        .map(_.toString).sorted.toSeq
    }
    for (n <- Seq(1, 3, 17)) {
      val got = withShufflePartitions(n) {
        AsOf.asofJoinNative(spark, sfSmall).collect()
          .map(_.toString).sorted.toSeq
      }
      assert(got == base, s"result changed at $n shuffle partitions")
    }
  }

  test("merge semantics: inclusive <=, last-wins, per-key isolation, outer nulls") {
    // key 1: candidates straddle; key 2: only future clicks (no
    // match); key 3: exact-tie time (inclusive); key 9: left-only key
    val left = Seq((1L, 10L, 1000L), (1L, 11L, 2000L), (2L, 20L, 500L),
      (3L, 30L, 700L), (9L, 90L, 1L))
    val right = Seq((1L, 900L, 0.9), (1L, 1000L, 1.0), (1L, 1500L, 1.5),
      (2L, 600L, 2.6), (3L, 700L, 3.7), (4L, 1L, 4.0))
    val got = nativeJoin(left, right).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(got == Map(
      10L -> Some(1.0),  // 1000 <= 1000 inclusive, last of {0.9, 1.0}
      11L -> Some(1.5),  // advances to 1500, not stuck at 1.0
      20L -> None,       // right rows exist but all in the future
      30L -> Some(3.7),  // exact tie matches
      90L -> None))      // key with no right rows at all
  }

  test("empty right side yields all-null matches, not an error") {
    val got = nativeJoin(Seq((1L, 10L, 100L), (2L, 20L, 200L)), Seq.empty)
      .collect()
    assert(got.length == 2)
    assert(got.forall(_.isNullAt(5)))
  }

  test("brute-force differential on randomized streams") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(10000).toLong))
    val right = (1 to 200).map(j =>
      (rnd.nextInt(8).toLong, rnd.nextInt(10000).toLong, j / 10.0))
    // collapse right ties at (key, time) to the max payload so the
    // expected candidate is well-defined (the registered query's
    // max_by discipline); feed the exec the same collapsed set
    val rightDedup = right.groupBy(t => (t._1, t._2))
      .map { case ((k, t), g) => (k, t, g.map(_._3).max) }.toSeq
    val got = nativeJoin(left, rightDedup).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    left.foreach { case (k, id, t) =>
      val expect = rightDedup.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == expect, s"left id=$id key=$k t=$t")
    }
  }
}
