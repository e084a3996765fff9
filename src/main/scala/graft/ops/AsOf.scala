package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** As-of (point-in-time) join — for each 'purchase' event, the most
  * recent 'click' by the same user at or before it.
  *
  * Spark has no asof-join operator, and the naive formulation
  * (range join + per-row max) degrades to a broadcast-nested-loop
  * blowup. Instead we use the union-merge pattern: tag both sides,
  * union them, sort within each user partition by (ts, side), and
  * carry the last click forward with last(..., ignoreNulls). That is
  * ONE shuffle on user_id and a spillable per-partition sort — linear
  * at 100 TB, no join explosion. Side ordering at equal ts puts clicks
  * first, giving inclusive (ts_click <= ts_purchase) semantics to
  * match DuckDB's ASOF JOIN.
  */
object AsOf {

  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("p_event_id"),
        col("value").as("c_value"), col("ts").as("c_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id").as("p_event_id"),
        lit(null).cast("double").as("c_value"),
        lit(null).cast("timestamp").as("c_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionAll(purchases)
      .select(col("side"), col("p_event_id"),
        last(col("c_value"), ignoreNulls = true).over(w).as("click_value"),
        last(col("c_ts"), ignoreNulls = true).over(w).as("click_ts"))
      .filter(col("side") === 1)
      .select(col("p_event_id").as("event_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        col("click_value"))
  }

  val all: Seq[Q] = Seq(
    Q("asof_join",
      """SELECT p.event_id,
        |  strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(asofJoin),
  )
}
