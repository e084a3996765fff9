package graft.sources


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Bucketed tables — the co-located-join layout for repeated joins on
  * the same key at scale: both sides pre-hashed into the same bucket
  * count on the join key, so the join plans with zero Exchange.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("join of two tables bucketed on the key needs no shuffle") {
    // warehouse dir is a per-JVM temp dir set at session build
    // (static conf, see TestSpark). Auto-broadcast is disabled so the
    // fixture-sized dimension doesn't get broadcast — at real scale
    // both sides are too big to broadcast, which is when bucketing
    // pays; this pins the shuffle-free sort-merge plan.
    val db = "graft_bucketing"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.orders(spark, sfTiny).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      Tables.customer(spark, sfTiny).write
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(s"$db.customer_b")
      val joined = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      // co-located: no Exchange between the two scans and the join
      val joinIdx = p.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected sort-merge join:\n$p")
      val afterJoin = p.substring(joinIdx)
      assert(!afterJoin.contains("Exchange hashpartitioning(o_custkey") &&
        !afterJoin.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$p")
      // and the result matches the unbucketed join
      val expected = Tables.orders(spark, sfTiny)
        .join(Tables.customer(spark, sfTiny), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
