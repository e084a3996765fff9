package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Set operations (SURVEY.md §2.4). The reference only ever does the
  * implicit UNION ALL of its input files (J5); intersect/except exist
  * here as first-class distinct-set operators.
  */
object SetOps {

  def setIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))

  def setExcept(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .except(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))

  def setUnionAll(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .unionAll(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))

  /** Multiset (ALL) variants keep duplicates — bag semantics. */
  def setIntersectAll(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .intersectAll(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))

  def setExceptAll(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .exceptAll(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))

  val all: Seq[Q] = Seq(
    Q("set_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier""".stripMargin)(setIntersect),
    Q("set_except",
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier""".stripMargin)(setExcept),
    Q("set_union_all",
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk""".stripMargin)(setUnionAll),
    Q("set_intersect_all",
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier)
        |GROUP BY nk""".stripMargin)(setIntersectAll),
    Q("set_except_all",
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey FROM supplier)
        |GROUP BY nk""".stripMargin)(setExceptAll),
  )
}
