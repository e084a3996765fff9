package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2.4 R16) —
  * the UDAF shape a reference user writes when the reduce is an
  * associative fold. The buffer merges associatively, so Spark runs
  * it with map-side partial aggregation; exact BigDecimal sums keep
  * the result independent of merge order (same policy as the
  * decimal-sum SQL aggregates).
  */
object TypedAggregators {

  /** Quantity-weighted mean price: Σ(w·x) / Σ(w), both exact. */
  object WeightedMean extends Aggregator[(BigDecimal, BigDecimal), (BigDecimal, BigDecimal), Double] {
    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), a: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (b._1 + a._1 * a._2, b._2 + a._1)
    override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (BigDecimal, BigDecimal)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)] // decimal(38,18) — 20 integral digits
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Weighted mean price per return flag, via the Aggregator wrapped
    * as an untyped UDAF column (`functions.udaf`). The oracle is
    * plain decimal SQL — the Aggregator must agree with the
    * relational algebra exactly.
    */
  def aggWeightedMean(s: SparkSession, dir: String): DataFrame = {
    val wm = udaf(WeightedMean)
    // the Aggregator's input encoder is decimal(38,18); cast through
    // (18,2) first so values carry exactly the 2-decimal money scale
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").cast("decimal(38,18)").as("w"),
        col("l_extendedprice").cast("decimal(18,2)").cast("decimal(38,18)").as("x"))
      .groupBy(col("l_returnflag"))
      .agg(round(wm(col("w"), col("x")), 6).as("wmean_price"))
  }

  val all: Seq[Q] = Seq(
    Q("agg_weighted_mean",
      """SELECT l_returnflag,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS wmean_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)(aggWeightedMean),
  )
}
