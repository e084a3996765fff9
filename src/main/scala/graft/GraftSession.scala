package graft

import org.apache.spark.sql.SparkSession

/** Pre-configured session builder for library users: graft's native
  * functions injected, fixture-compatible timestamp handling, UTC.
  * `SparkEntry` queries also self-register what they need, so a plain
  * session works too — this is the convenient front door.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events-style TIMESTAMP(NANOS) parquet columns read as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
