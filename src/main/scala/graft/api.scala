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
