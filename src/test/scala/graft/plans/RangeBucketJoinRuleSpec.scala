package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class RangeBucketJoinRuleSpec extends AnyFunSuite {
  import TestSpark._

  private val bands = Seq(
    (0L, 1.0, 3.0), (1L, 3.0, 8.0), (2L, 8.0, 15.0),
    (3L, 15.0, 27.0), (4L, 27.0, 51.0))

  private def rangeJoin() = {
    import spark.implicits._
    val b = bands.toDF("band_id", "lo", "hi")
    Tables.lineitem(spark, sfTiny)
      .join(b, col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
  }

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeBucketJoinRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeBucketJoinRule)
  }

  test("rule turns the BETWEEN join into a hash join with identical results") {
    val expected = rangeJoin().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // un-rewritten: nested loop (this is the problem the rule solves)
    assert(rangeJoin().queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withRule {
      val df = rangeJoin()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule did not fire:\n${p.take(2000)}")
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"no hash/merge join after rewrite:\n${p.take(2000)}")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected)
    }
  }

  test("rule preserves broadcast hints when the bands side is on the left") {
    import spark.implicits._
    val b = bands.toDF("band_id", "lo", "hi")
    def flipped() = broadcast(b).join(Tables.lineitem(spark, sfTiny),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("band_id")).agg(count(lit(1)).as("n"))
    val expected = flipped().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val df = flipped()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"))
      // rewrite puts the probe on the left; the bands-side broadcast
      // hint must follow the bands to the right, never the fact side
      assert(p.contains("BroadcastHashJoin") && p.contains("BuildRight"),
        s"bands-side broadcast hint lost in flip:\n${p.take(2000)}")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    }
  }

  test("rule leaves non-matching joins untouched") {
    import spark.implicits._
    withRule {
      // equi join: no range condition — must not rewrite
      val equi = Tables.orders(spark, sfTiny)
        .join(Tables.customer(spark, sfTiny), col("o_custkey") === col("c_custkey"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("graft_band_bucket"))
      // range over a non-local (parquet) side — must not rewrite
      val nonLocal = Tables.orders(spark, sfTiny)
        .join(Tables.customer(spark, sfTiny),
          col("o_totalprice") >= col("c_acctbal") && col("o_totalprice") < col("c_acctbal") + 1e9)
      assert(!nonLocal.queryExecution.optimizedPlan.toString.contains("graft_band_bucket"))
      // zero-width bands: unsatisfiable, left alone rather than mis-bucketed
      val degenerate = Seq((0L, 5.0, 5.0)).toDF("band_id", "lo", "hi")
      val z = Tables.lineitem(spark, sfTiny)
        .join(degenerate, col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      assert(!z.queryExecution.optimizedPlan.toString.contains("graft_band_bucket"))
      assert(z.count() == 0)
    }
  }

  test("extension class wiring registers without error") {
    // the shared TestSpark session can't be rebuilt with extensions
    // mid-suite (getOrCreate returns the live session and ignores the
    // builder), so pin the injection path directly: applying the
    // extension to a fresh SparkSessionExtensions must register both
    // the function and the optimizer rule without throwing
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
