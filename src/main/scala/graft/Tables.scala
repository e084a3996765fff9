package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the driver-generated parquet fixtures
  * (TESTDATA.md): TPC-H-ish star schema + `events` + `documents` +
  * `embeddings`, one parquet per table under the scale-factor dir.
  *
  * At 100 TB these would be partitioned parquet/iceberg table roots;
  * the single-file layout here is only the test fixture. All queries
  * take the dir as a parameter so the same code runs at any scale.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across fixture
    * generations, so the loader adapts to what the file actually
    * holds (one schema probe, no data read):
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]) unless the session sets
    *    `spark.sql.legacy.parquet.nanosAsLong=true` at build time
    *    (GraftSession / Verify / Bench / TestSpark all do), which
    *    reads the column as a raw nanos long — truncated here to
    *    microseconds, matching DuckDB's `CAST(ts AS TIMESTAMP)`.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
    *    TIMESTAMP_NTZ — cast to TIMESTAMP, which under the session's
    *    pinned UTC timezone keeps the same wall-clock instant DuckDB
    *    sees as a naive timestamp, so `unix_micros(ts)` ==
    *    `epoch_us(ts)` in every downstream comparison.
    * Either way downstream code sees one canonical shape: `ts` as
    * TIMESTAMP at microsecond precision. Session conf is never
    * mutated here — that would be a surprise for library users.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long fixture
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Injective filesystem/identifier key for a fixture dir. The
    * readable sanitized form alone is NOT injective ("/data/a-b" and
    * "/data/a_b" both sanitize to "_data_a_b" — two fixtures would
    * silently share one cached tmp copy), so an md5 prefix of the
    * original path is appended to make distinct dirs distinct.
    */
  def dirKey(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(dir.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    // leading "d": an absolute path sanitizes to a LEADING underscore
    // ("/root/…" → "_root_…"), and Spark's file index treats
    // underscore-prefixed names as hidden (the _SUCCESS/_metadata
    // convention) — a staged dir named that way is silently ignored
    // by DataFrame reads ("All paths were ignored" WARNs in the
    // bench log). The prefix keeps the key identifier-safe and
    // injective while never colliding with the hidden-file rule.
    s"d${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$h"
  }
}
