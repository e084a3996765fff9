package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the two storage-layout plan properties Bucketed.scala exists
  * for: the bucketed fact join runs without exchanging either side,
  * and the day filter prunes partitions at plan time.
  */
class BucketedSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact join is a zero-exchange sort-merge join") {
    // Broadcast would hide the bucket layout (valid, but not the
    // property under test) — disable it for the plan assertion only.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketed.joinBucketed(spark, sfTiny)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ in:\n$p")
      val exchanges = "Exchange".r.findAllIn(p).length
      // exactly one exchange: the post-join rollup. Zero on the join.
      assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges:\n$p")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed scan selects all declared buckets") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Bucketed.joinBucketed(spark, sfTiny)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 8 out of 8"),
        s"bucket metadata not used by the scan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("day filter becomes a partition filter, not a data filter") {
    val df = Bucketed.partitionPruned(spark, sfTiny)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), s"no PartitionFilters in:\n$p")
    assert(p.contains("2024-01-15"), s"day literal not in partition filter:\n$p")
    // the pruned scan must not carry the day predicate as a row filter
    assert(!p.contains("PushedFilters: [IsNotNull(day)"),
      "day leaked into data filters — pruning did not happen at plan time")
    assert(df.count() > 0)
  }
}
