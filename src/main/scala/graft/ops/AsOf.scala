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
    // two clicks in the same truncated microsecond are an ambiguous
    // as-of antecedent (ASOF JOIN has no tiebreak to express) — keep
    // the max-event_id click per (user, ts) on BOTH engine sides so
    // the carried value is deterministic at any collision rate
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("value"))
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

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** [[asofJoin]] through graft's NATIVE as-of operator
    * ([[graft.plans.AsOfJoinExec]] — custom LogicalPlan + Strategy +
    * physical exec, the build brief's preference-order (c)): each
    * side shuffles once on user_id, sorts by (user, time), and a
    * single forward merge pass pairs every purchase with the last
    * click at or before it — no union materialization, no WindowExec
    * buffer, O(1) merge state. Same inclusive tie discipline as the
    * composed form: same-microsecond clicks collapse via max_by
    * BEFORE the join, so the exec's (key, time) ordering is total
    * where it matters. The oracle is the identical DuckDB ASOF JOIN
    * the composed query checks against — the two implementations and
    * the oracle triangulate.
    */
  def asofJoinNative(s: SparkSession, dir: String): DataFrame =
    nativeAsOf(s, dir, nearest = false)
      .select(col("event_id"),
        date_format(col("c_ts"), TsFmt).as("click_ts"),
        col("c_value").as("click_value"))

  /** [[asofNearest]] through the native exec (`nearest = true` on
    * [[graft.plans.AsOfJoinExec]]): same single merge pass as
    * backward mode — at the point the backward scan stops, the right
    * run's head IS the forward candidate, so "nearest" costs one
    * integer comparison, no second window frame, no union. The right
    * side pre-collapses same-(user, ts) clicks via max_by (the
    * asofJoinNative tie discipline — the exec orders only by
    * (key, time), so equal-time right rows must be collapsed before
    * the join); the oracle replays the composed two-frame form over
    * the SAME collapsed clicks. NOTE this differs from the composed
    * [[asofNearest]] registry query ON PURPOSE where two clicks share
    * a microsecond: that one keeps all clicks and resolves prev/next
    * ties by event_id in opposite directions (last vs first in frame
    * order); collapsing picks max-event_id for both. AsOfExecSpec
    * triangulates exec ≡ composed-over-collapsed ≡ DuckDB.
    */
  def asofNearestNative(s: SparkSession, dir: String): DataFrame =
    nativeAsOf(s, dir, nearest = true)
      .select(col("event_id"),
        date_format(col("c_ts"), TsFmt).as("click_ts"),
        col("c_value").as("click_value"),
        when(col("c_ts").isNull, lit(null).cast("string"))
          .when(unix_micros(col("c_ts")) <= unix_micros(col("ts")), lit("prev"))
          .otherwise(lit("next")).as("direction"))

  /** Shared purchases-to-collapsed-clicks as-of through
    * [[graft.plans.AsOfJoinNode]]; both native registry queries are
    * thin projections over this.
    */
  private def nativeAsOf(
      s: SparkSession, dir: String, nearest: Boolean): DataFrame = {
    import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}
    // read-modify-write on extraStrategies: synchronize on the session
    // so two concurrent callers can't interleave and drop an entry
    // (ConcurrencySpec races this path)
    s.synchronized {
      if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
        s.experimental.extraStrategies =
          s.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("value"))
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val lPlan = purchases.queryExecution.analyzed
    val rPlan = clicks.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = p.output.find(_.name == name).get
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, "user_id"), attr(rPlan, "c_user"),
      attr(lPlan, "ts"), attr(rPlan, "c_ts"), nearest)
    org.apache.spark.sql.graftglue.GraftGlue.ofRows(s, node)
  }

  /** Nearest-neighbor as-of join (pandas merge_asof
    * direction='nearest'): each purchase matched to the click with
    * the smallest |Δts| in either direction, ties to the earlier
    * click. Same union-merge plan as [[asofJoin]] — one shuffle, one
    * per-user sort — with TWO frames over the one sorted run (last
    * click carried forward, first click carried backward); the
    * nearer candidate is a per-row comparison on exact integer
    * microseconds. Still no range join, still no pair blowup.
    */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    // oid: every window op in this repo breaks same-microsecond ties
    // on event_id; without it, which of two tied clicks is carried is
    // partition-order luck (and can diverge from the oracle)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id").as("oid"),
        lit(null).cast("long").as("p_event_id"),
        col("value").as("c_value"), col("ts").as("c_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id").as("oid"),
        col("event_id").as("p_event_id"),
        lit(null).cast("double").as("c_value"),
        lit(null).cast("timestamp").as("c_ts"))
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("oid"))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val m = clicks.unionAll(purchases)
      .select(col("side"), col("p_event_id"), col("ts"),
        last(col("c_value"), ignoreNulls = true).over(wPrev).as("pv"),
        last(col("c_ts"), ignoreNulls = true).over(wPrev).as("pt"),
        first(col("c_value"), ignoreNulls = true).over(wNext).as("nv"),
        first(col("c_ts"), ignoreNulls = true).over(wNext).as("nt"))
      .filter(col("side") === 1)
    val dPrev = unix_micros(col("ts")) - unix_micros(col("pt"))
    val dNext = unix_micros(col("nt")) - unix_micros(col("ts"))
    val usePrev = col("nt").isNull || (col("pt").isNotNull && dPrev <= dNext)
    m.select(col("p_event_id").as("event_id"),
      when(usePrev, date_format(col("pt"), TsFmt))
        .otherwise(date_format(col("nt"), TsFmt)).as("click_ts"),
      when(usePrev, col("pv")).otherwise(col("nv")).as("click_value"),
      when(col("pt").isNull && col("nt").isNull, lit(null).cast("string"))
        .when(usePrev, lit("prev")).otherwise(lit("next")).as("direction"))
  }

  val all: Seq[Q] = Seq(
    Q("asof_nearest",
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 0 AS side,
        |    event_id AS oid,
        |    CAST(NULL AS BIGINT) AS p_event_id,
        |    value AS c_value, CAST(ts AS TIMESTAMP) AS c_ts
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id, event_id, NULL, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT side, p_event_id, ts,
        |    last_value(c_value IGNORE NULLS) OVER wprev AS pv,
        |    last_value(c_ts IGNORE NULLS) OVER wprev AS pt,
        |    first_value(c_value IGNORE NULLS) OVER wnext AS nv,
        |    first_value(c_ts IGNORE NULLS) OVER wnext AS nt
        |  FROM u
        |  WINDOW
        |    wprev AS (PARTITION BY user_id ORDER BY ts, side, oid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wnext AS (PARTITION BY user_id ORDER BY ts, side, oid
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT p_event_id AS event_id,
        |  CASE WHEN nt IS NULL OR (pt IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(pt) <= epoch_us(nt) - epoch_us(ts))
        |    THEN strftime(pt, '%Y-%m-%d %H:%M:%S.%f')
        |    ELSE strftime(nt, '%Y-%m-%d %H:%M:%S.%f') END AS click_ts,
        |  CASE WHEN nt IS NULL OR (pt IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(pt) <= epoch_us(nt) - epoch_us(ts))
        |    THEN pv ELSE nv END AS click_value,
        |  CASE WHEN pt IS NULL AND nt IS NULL THEN NULL
        |    WHEN nt IS NULL OR (pt IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(pt) <= epoch_us(nt) - epoch_us(ts))
        |    THEN 'prev' ELSE 'next' END AS direction
        |FROM m WHERE side = 1""".stripMargin)(asofNearest),
    Q("asof_join",
      """SELECT p.event_id,
        |  strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, arg_max(value, event_id) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(asofJoin),
    Q("asof_join_native",
      """SELECT p.event_id,
        |  strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, arg_max(value, event_id) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)(
      asofJoinNative),
    // the composed two-frame nearest replayed over the SAME collapsed
    // clicks the native exec joins against (see asofNearestNative's
    // scaladoc for why collapsing first is the contract here)
    Q("asof_nearest_native",
      """WITH cc AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    arg_max(value, event_id) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, ts, 0 AS side,
        |    CAST(NULL AS BIGINT) AS p_event_id,
        |    value AS c_value, ts AS c_ts
        |  FROM cc
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id, NULL, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT side, p_event_id, ts,
        |    last_value(c_value IGNORE NULLS) OVER wprev AS pv,
        |    last_value(c_ts IGNORE NULLS) OVER wprev AS pt,
        |    first_value(c_value IGNORE NULLS) OVER wnext AS nv,
        |    first_value(c_ts IGNORE NULLS) OVER wnext AS nt
        |  FROM u
        |  WINDOW
        |    wprev AS (PARTITION BY user_id ORDER BY ts, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wnext AS (PARTITION BY user_id ORDER BY ts, side
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT p_event_id AS event_id,
        |  CASE WHEN nt IS NULL OR (pt IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(pt) <= epoch_us(nt) - epoch_us(ts))
        |    THEN strftime(pt, '%Y-%m-%d %H:%M:%S.%f')
        |    ELSE strftime(nt, '%Y-%m-%d %H:%M:%S.%f') END AS click_ts,
        |  CASE WHEN nt IS NULL OR (pt IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(pt) <= epoch_us(nt) - epoch_us(ts))
        |    THEN pv ELSE nv END AS click_value,
        |  CASE WHEN pt IS NULL AND nt IS NULL THEN NULL
        |    WHEN nt IS NULL OR (pt IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(pt) <= epoch_us(nt) - epoch_us(ts))
        |    THEN 'prev' ELSE 'next' END AS direction
        |FROM m WHERE side = 1""".stripMargin)(asofNearestNative),
  )
}
