package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM (Test/fork=true).
  * Mirrors Verify's config: UTC, nanos-as-long for events.ts, small
  * shuffle parallelism. Partition-sensitive suites temporarily change
  * spark.sql.shuffle.partitions via `withShufflePartitions`.
  */
object TestSpark {
  val sfTiny = "/root/testdata/sf0.001"
  val sfSmall = "/root/testdata/sf0.01"

  // local[4, 2]: 4 threads, maxFailures=2 — task retry is LIVE in the
  // test JVM (plain local[N] pins maxFailures to 1), so
  // FaultToleranceSpec can demonstrate Spark's built-in recovery (the
  // reference's health-check Tests 8-9). No other suite throws from
  // tasks, so the only behavior change elsewhere is that a genuine
  // task bug would surface after one retry instead of immediately.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.optimizer.excludedRules", GraftSession.ExcludedRules)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def withShufflePartitions[T](n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
