package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a named query over the fixture
  * tables plus (when SQL-expressible) a DuckDB oracle for the driver's
  * differential check — the same shape as the reference's own test
  * oracle (reference test.py:48-72 runs each job twice, cluster vs
  * local simulator, and compares order-insensitively).
  *
  * @param oracle ANSI SQL for DuckDB over the same parquet tables;
  *               None for ops whose semantics aren't SQL-expressible
  *               (sketches, streaming state) — those get rows-only
  *               checks plus ScalaTest coverage.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Window spec for PROVABLY BOUNDED global frames — spectrum tables,
  * post-`limit(K)` heads, model-sized mixture weights. Semantically
  * identical to an unpartitioned window (every row in one partition;
  * `partitionBy(lit(0))` hashes all rows to the same task), but the
  * constant partition key (a) suppresses WindowExec's
  * "No Partition Defined" warning for these AUDITED sites, so a new,
  * genuinely unbounded global window is visible at a glance in the
  * bench log instead of drowning among hundreds of known-bounded
  * ones, and (b) lets PlanShapeSpec forbid empty-partition-spec
  * windows outright (the allowlist became this marker). Use ONLY
  * where the frame is already bounded by construction — on a
  * data-sized input this funnels the corpus through one task, which
  * is exactly the shape the plan audit exists to catch.
  */
object Bounded {
  def global: org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.functions.lit(0))
}
