package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}

/** Window-function surface (SURVEY.md §2.4): ranking, running frames,
  * lag/lead. Each query orders by a unique tiebreaker so results are
  * deterministic under any partitioning.
  *
  * Scale: one shuffle on the partition key; per-partition sort is
  * spillable. Per-group top-k via row_number keeps only k rows per
  * group past the filter — never a global sort.
  */
object WindowOps {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Top-3 orders per customer with all three rank flavors. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .filter(col("rn") <= 3)
  }

  /** Distribution window functions: quartile assignment, percent
    * rank, cumulative distribution. The (k−1)/(n−1)-style fractions
    * are small-integer divisions, identical in both engines; rounded
    * anyway for ulp safety.
    */
  def windowDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
  }

  /** Running (cumulative) sum per user over event time. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"),
        sum(dec(col("value"))).over(w).cast("double").as("running"))
  }

  /** lag/lead: previous value and inter-event gap in microseconds. */
  def windowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("dt_us"))
  }

  /** SCD-2 interval construction: collapse each user's event stream
    * into contiguous validity ranges per event_type — lag() flags the
    * change points, a second lead() over only those rows closes each
    * interval (valid_to is NULL for the open current state). This is
    * the change-data-capture → slowly-changing-dimension build that
    * every warehouse pipeline needs; two window passes over the same
    * (user_id; ts, event_id) ordering, so Catalyst plans a single
    * shuffle and sort reused by both.
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("status"),
        col("ts").as("valid_from"), col("event_id"),
        lead(col("ts"), 1).over(w).as("valid_to"))
      .drop(col("event_id"))
  }

  /** Frame-clause surface: a time-based RANGE frame (trailing-hour
    * sum keyed on event-time microseconds, not row position) plus
    * first/last/nth over an explicit unbounded ROWS frame. RANGE
    * frames include all order-key peers on the boundary in both
    * engines, so ts ties don't need a tiebreaker; the positional
    * functions do, hence the (ts, event_id) ordering. Decimal sum for
    * order-independent exactness, as everywhere else.
    */
  def windowFrames(s: SparkSession, dir: String): DataFrame = {
    val full = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val trailingHour = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.events(s, dir).select(
      col("event_id"),
      sum(dec(col("value"))).over(trailingHour).cast("double").as("hour_sum"),
      first(col("value")).over(full).as("first_v"),
      last(col("value")).over(full).as("last_v"),
      nth_value(col("value"), 3).over(full).as("third_v"))
  }

  /** Event-transition matrix — first-order Markov telemetry over the
    * event stream: for each (from, to) adjacent pair within a user's
    * micro-truncated-timestamp order (event_id tiebreak, so the
    * sequence is unique), the transition count and the conditional
    * probability p(to | from). One lead() window partitioned by
    * user_id (per-key state, partial sort within hash partitions)
    * plus one hash aggregate whose key space is |event_types|² — tiny
    * at any corpus scale; the p column is a window over that tiny
    * aggregate.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("p", round(col("cnt") /
        sum(col("cnt")).over(Window.partitionBy(col("from_type"))), 6))
  }

  /** Event-level sessionization — assign each event its user-session
    * ordinal under a 30-minute inactivity gap (the row-granularity
    * complement to the `events_session` session_window AGGREGATE: this
    * one labels the events themselves, which is what downstream
    * attribution joins consume). Gap arithmetic is exact integer
    * microseconds (unix_micros / epoch_us) so the boundary decision is
    * identical in both engines; the running sum of session starts is
    * one window per user partition — per-key state, no global sort.
    */
  val SessionGapUs: Long = 1800L * 1000000L
  def sessionizeEvents(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    Tables.events(s, dir)
      .withColumn("new_sess",
        when(gap.isNull || gap > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts"), col("session_seq"))
  }

  /** Per-session rollup over [[sessionizeEvents]]'s labels: event
    * count and wall-clock duration (exact integer microseconds) per
    * (user, session ordinal) — the session-quality telemetry fed to
    * engagement dashboards and bot filters (1-event sessions and
    * marathon sessions are both anomalies). One extra hash aggregate
    * on (user_id, session_seq) on top of the sessionize window; the
    * key space is bounded by the session count, never raw events.
    */
  def sessionStats(s: SparkSession, dir: String): DataFrame =
    sessionizeEvents(s, dir)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"))

  /** Last-touch attribution — for every purchase, the most recent
    * strictly-preceding engagement event (view or click) by the same
    * user, the join marketing/conversion pipelines run to credit a
    * touchpoint. One window per user partition (ordered by ts with
    * event_id as the total-order tiebreak) evaluating
    * last(..., ignoreNulls) over UNBOUNDED PRECEDING..1 PRECEDING —
    * per-key state only, no self-join, no global sort; the two
    * last() calls share one window spec so they read the same sorted
    * run and always pick the same attributed row.
    */
  def attributionLastTouch(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("view", "click"), col("event_id"))
    val touchType = when(col("event_type").isin("view", "click"), col("event_type"))
    Tables.events(s, dir)
      .withColumn("attr_event_id", last(touch, ignoreNulls = true).over(w))
      .withColumn("attr_type", last(touchType, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("attr_event_id"), col("attr_type"))
  }

  /** EWMA lookback depth: the current event plus 7 predecessors. */
  private val EwmaDepth = 7

  /** Per-user exponentially-weighted moving average of event values
    * (half-life 1 step: weight 0.5^d for the event d steps back,
    * normalized over the weights actually present) — the smoothing
    * pass metric/sensor pipelines apply before thresholding. A
    * frame-positional weighted sum has no direct window form (frame
    * aggregates can't see the offset), so the scale-safe plan is a
    * map-side fan-out: each event contributes to its next
    * [[EwmaDepth]] anchor ordinals via one generator (×8 rows), then
    * one equi-shuffle on (user, anchor) aggregates exact DECIMAL
    * sums of pre-rounded terms. No self-join fan-out, no range join,
    * deterministic at any partitioning.
    */
  def ewmaSmooth(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // eventsSpread: the user_id fan-out doubles as the window exchange
    // and parallelizes the ×8 generator + decimal products that would
    // otherwise run inside the single scan task (r12: 1.17→0.58 s)
    val ev = Tables.eventsSpread(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w).cast("long"))
    // exact decimal end-to-end: value is 2-decimal money (the cast the
    // source rollups already gate on), 0.5^d is exact at scale 7, so
    // the products and sums carry NO float rounding anywhere — a
    // round(double, 6) here would sit on systematic .xxxxxx5 ties
    // (2-decimal × 2^-d) where engine tie-breaking diverges
    val contrib = ev
      .select(col("user_id"), col("rn"), col("value"),
        explode(sequence(lit(0), lit(EwmaDepth))).as("d"))
      .select(col("user_id"), (col("rn") + col("d")).as("rn"),
        (col("value").cast("decimal(18,2)")
          * pow(lit(0.5), col("d")).cast("decimal(9,7)")).as("wx"),
        pow(lit(0.5), col("d")).cast("decimal(9,7)").as("wt"))
    val agg = contrib.groupBy(col("user_id"), col("rn"))
      .agg(sum(col("wx")).as("swx"), sum(col("wt")).as("swt"))
    // the quotient stays UNROUNDED: both operands are exact decimals,
    // so the IEEE division is bit-identical in both engines, while a
    // round(·, 6) would re-introduce engine-specific tie behavior on
    // results landing exactly on a half-ulp boundary
    ev.join(agg, Seq("user_id", "rn"))
      .select(col("user_id"), col("event_id"),
        (col("swx").cast("double") / col("swt").cast("double")).as("ewma"))
  }

  /** Pareto cut (the 80/20 report): per nation, the smallest prefix
    * of customers — ordered by revenue — whose cumulative revenue
    * reaches 80% of the nation's total, i.e. "who are the customers
    * that make up 80% of revenue here". The revenue aggregate is one
    * partial+final shuffle; the cumulative sum and total ride
    * per-nation window frames (never unpartitioned). The membership
    * rule is `prev_cum < 0.8·total`, evaluated ENTIRELY in exact
    * decimals as `5·(cum − rev) < 4·total` — no floating-point
    * boundary exists for the two engines to disagree on. The
    * (revenue DESC, custkey) ordering is total, so the kept prefix is
    * deterministic.
    */
  def paretoCut(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val cust = rev.join(
      broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
      col("o_custkey") === col("c_custkey"))
    val ord = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("rev").desc, col("c_custkey"))
    val cum = sum(col("rev")).over(
      ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val total = sum(col("rev")).over(Window.partitionBy(col("c_nationkey")))
    cust
      .withColumn("cum", cum)
      .withColumn("total", total)
      .withColumn("rnk", row_number().over(ord).cast("long"))
      .filter((col("cum") - col("rev")) * 5 < col("total") * 4)
      .select(col("c_nationkey"), col("c_custkey"),
        col("rev").cast("double").as("revenue"), col("rnk"),
        round(col("cum").cast("double") / col("total").cast("double"), 6)
          .as("cum_share"))
  }

  /** Rolling 5-event median of each user's values — the ROBUST
    * smoother ([[ewmaSmooth]]'s outlier-immune sibling: one glitch
    * reading moves an EWMA for [[EwmaDepth]] steps but never moves a
    * median). An exact percentile CAN ride a window frame (unlike
    * COUNT DISTINCT — see rollingActives), so this is one per-user
    * window, O(k log k) per row with k = 5, shuffling each user's
    * stream once; the (ts, event_id) ordering is total, so frames are
    * identical in both engines. The interpolated midpoint on
    * even-sized head frames is the one double op; round(6) absorbs
    * the formula-order ulp between engines (the agg_percentiles
    * policy).
    */
  def rollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("med5",
        round(percentile(col("value"), lit(0.5)).over(w), 6))
      .drop("ts")
  }

  /** Rolling 7-day active users (DAU / WAU / stickiness) — the
    * product-analytics staple that is genuinely hard at scale because
    * COUNT(DISTINCT) cannot ride a window frame. The scale-safe shape
    * used here: reduce events to the distinct (day, user) set (one
    * exact two-phase distinct), EXPLODE each pair into the ≤7 window
    * anchors it contributes to (a generator — map-side, ×7 row cost),
    * keep only observed days via a broadcast of the tiny day
    * dimension, and take an exact distinct count per anchor. Every
    * join is equi, nothing nested-loops, and the 7× blow-up applies
    * to the already-collapsed (day, user) set, not raw events. At
    * 100 TB the same plan holds; the sketch alternative
    * (approx_count_distinct per window) drops in without changing
    * shape when exactness can be traded.
    */
  def rollingActives(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val days = du.select(col("d")).distinct()
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val contrib = du.select(
      explode(sequence(col("d"), date_add(col("d"), 6))).as("d"),
      col("user_id"))
    val wau = contrib.join(broadcast(days), Seq("d"))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau") / col("wau").cast("double"), 6).as("stickiness"))
  }

  /** Time-series densification — fill each user's daily activity
    * series with explicit zero rows for the days they were silent,
    * over the corpus' observed [min, max] day span. The downstream
    * consumers (rolling averages, churn models, forecasting) all
    * assume a dense grid; the fill itself is the (users × span) grid
    * generator — a broadcast of the 1-row span scalar onto the user
    * dimension, exploded map-side — left-joined against the daily
    * aggregate. Row cost is |users|·|days|, the size of the dense
    * output itself, and every join is equi.
    */
  def fillGaps(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val daily = e.groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n_events"))
    val span = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = daily.select(col("user_id")).distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("d"))
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Deterministic per-group sample — the distributed replacement for
    * "give me N examples per language": rank by a hash of the key
    * (md5 so the DuckDB oracle reproduces the order bit-for-bit, as
    * [[graft.dedup.DedupOps.simhash60]] does) and keep the first
    * [[SamplePerGroup]] per group. The rank-≤-k filter under a
    * partitioned window triggers Spark's WindowGroupLimit: each
    * partition keeps a k-row heap per group BEFORE the full sort, so
    * the shuffle carries O(groups·k), not the corpus — pinned in
    * PlanShapeSpec. Unlike rand()-based sampling this is reproducible
    * across runs, partitionings, and engines.
    */
  private val SamplePerGroup = 5

  def samplePerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= SamplePerGroup)
  }

  /** Step-function time-weighted average of `value` per user — the
    * telemetry/billing aggregate (mean held value over time, not over
    * samples). Each event's value holds until the next event; weights
    * are exact microsecond deltas from ONE partitioned lead() pass —
    * no self-join, no range join. Output keeps the exact-decimal
    * numerator and integer span alongside the quotient: both division
    * operands are exact, so the IEEE result is bit-identical across
    * engines (same policy as [[ewmaSmooth]]).
    *
    * Weights are MILLIsecond deltas, not microseconds, and that is
    * load-bearing: with µs weights the numerator's decimal mantissa
    * passes 2^53, where decimal→double needs two roundings
    * (int128→double, then ÷10^scale) and engines legitimately differ
    * by 1 ulp. At ms granularity the mantissa stays integer-exact in
    * a double, the cast is single-rounded, and both engines agree
    * bit-for-bit.
    *
    * The µs→ms step is a pmod-based FLOOR, not `div`: Spark's `div`
    * truncates toward zero while the DuckDB oracle's `//` floors, so
    * for pre-1970 timestamps the two would differ by 1 ms — a latent
    * differential break outside the fixture's 2024 range.
    */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 1000)) div 1000").as("t_ms"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("nt", lead(col("t_ms"), 1).over(w))
      .filter(col("nt").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        sum(col("v") * (col("nt") - col("t_ms"))).as("num"),
        sum(col("nt") - col("t_ms")).as("span"))
      .select(col("user_id"),
        col("num").cast("double").as("weighted_sum"),
        col("span").cast("long").as("span_ms"),
        (col("num").cast("double") / col("span").cast("double")).as("twa"))
  }

  /** First-[[PathLen]] event-type path per user — the "user journey"
    * string a funnel/sequence model trains on. The per-user prefix is
    * a rank-filtered window (WindowGroupLimit keeps per-group k-heaps
    * ahead of the sort at scale, the samplePerGroup property), and
    * the path string is assembled from the ≤K survivors by an
    * order-pinned in-group sort — collect_list order is partition-
    * dependent, so the (rn, type) structs are array_sort-ed before
    * joining — keeping both shuffle width and string length bounded
    * by K, never by a user's event count.
    */
  val PathLen = 10
  def eventPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PathLen)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_steps"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
  }

  /** Next-event training examples — the sequence-model dataset build:
    * per user, each event with at least [[NextEventContext]]
    * predecessors becomes one (context, label) example, context =
    * the previous K event types joined oldest-first — next-token
    * prediction over behavioral streams, the exact shape a
    * session-recommendation or churn model trains on. One per-user
    * window (bounded partitions), K `lag`s in a single WindowExec
    * pass, map-only after the sort — no self-join, no explode of
    * prefix combinations.
    */
  val NextEventContext = 3

  def nextEventExamples(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val lags = (NextEventContext to 1 by -1)
      .map(k => lag(col("event_type"), k).over(w))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        concat_ws(">", lags: _*).as("context"),
        col("event_type").as("label"),
        lags.head.isNotNull.as("full")) // oldest lag present ⇒ all are
      .filter(col("full"))
      .select(col("user_id"), col("event_id"), col("context"), col("label"))
  }

  private val nextEventOracle = {
    val lagCols = (NextEventContext to 1 by -1).map(k =>
      s"lag(event_type, $k) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS l$k")
    s"""WITH r AS (
       |  SELECT user_id, event_id, event_type,
       |    ${lagCols.mkString(",\n    ")}
       |  FROM events)
       |SELECT user_id, event_id,
       |  ${(NextEventContext to 1 by -1).map(k => s"l$k").mkString(" || '>' || ")}
       |    AS context,
       |  event_type AS label
       |FROM r WHERE l$NextEventContext IS NOT NULL""".stripMargin
  }

  /** Pareto frontier (skyline) of the part catalog — the parts no
    * other part beats on BOTH price (lower-better) and size
    * (higher-better). The textbook form is a quadratic NOT EXISTS
    * self-join; over DISTINCT (price, size) pairs one price-ordered
    * sweep finds the same frontier — after sorting by (price asc,
    * size desc), a pair is dominated exactly when some earlier pair
    * already reached a size ≥ its own, so the operator is sort +
    * running max. Distributed: a bucket-local sweep prunes dominated
    * pairs first (dominated in a subset ⇒ dominated in the full set,
    * and every true frontier point survives its own bucket), then
    * the global sweep orders only the survivors — the single-
    * partition window touches frontier candidates, not the catalog.
    */
  def skylineParts(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.part(s, dir)
      .groupBy(col("p_retailprice").as("price"),
        col("p_size").cast("long").as("psize"))
      .agg(count(lit(1)).as("n_parts"))
    val prune = Window.partitionBy(col("b"))
      .orderBy(col("price").asc, col("psize").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sweep = graft.Bounded.global.orderBy(col("price").asc, col("psize").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("b", pmod(xxhash64(col("price"), col("psize")), lit(16)))
      .withColumn("m", max(col("psize")).over(prune))
      .filter(col("m").isNull || col("m") < col("psize"))
      .withColumn("m2", max(col("psize")).over(sweep))
      .filter(col("m2").isNull || col("m2") < col("psize"))
      .select(col("price"), col("psize"), col("n_parts"))
  }

  val all: Seq[Q] = Seq(
    Q("event_paths",
      s"""WITH r AS (
         |  SELECT user_id, event_type,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS rn
         |  FROM events)
         |SELECT user_id, COUNT(*) AS n_steps,
         |  string_agg(event_type, '>' ORDER BY rn) AS path
         |FROM r WHERE rn <= $PathLen GROUP BY 1""".stripMargin)(eventPaths),
    Q("next_event_examples", nextEventOracle)(nextEventExamples),
    Q("skyline_parts",
      """WITH d AS (
        |  SELECT p_retailprice AS price, CAST(p_size AS BIGINT) AS psize,
        |    COUNT(*) AS n_parts
        |  FROM part GROUP BY 1, 2)
        |SELECT price, psize, n_parts FROM (
        |  SELECT *, MAX(psize) OVER (ORDER BY price ASC, psize DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
        |  FROM d)
        |WHERE m IS NULL OR m < psize""".stripMargin)(skylineParts),
    Q("sample_per_group",
      """SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |FROM documents
        |QUALIFY rn <= 5""".stripMargin)(samplePerGroup),
    Q("time_weighted_avg",
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS t_ms,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    LEAD(epoch_us(CAST(ts AS TIMESTAMP)) // 1000) OVER (
        |      PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nt
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(v * (nt - t_ms)) AS DOUBLE) AS weighted_sum,
        |  CAST(SUM(nt - t_ms) AS BIGINT) AS span_ms,
        |  CAST(SUM(v * (nt - t_ms)) AS DOUBLE)
        |    / CAST(SUM(nt - t_ms) AS DOUBLE) AS twa
        |FROM e WHERE nt IS NOT NULL
        |GROUP BY 1""".stripMargin)(timeWeightedAvg),
    Q("fill_gaps",
      """WITH e AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
        |    user_id FROM events),
        |daily AS (SELECT user_id, d, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
        |grid AS (
        |  SELECT user_id,
        |    CAST(unnest(range(d0, d1 + 1, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM (SELECT DISTINCT user_id FROM daily), span)
        |SELECT g.user_id, strftime(g.d, '%Y-%m-%d') AS day,
        |  COALESCE(n, 0) AS n_events
        |FROM grid g LEFT JOIN daily
        |  ON g.user_id = daily.user_id AND g.d = daily.d""".stripMargin)(
      fillGaps),
    Q("rolling_actives",
      """WITH du AS (
        |  SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |    AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM du),
        |dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY 1),
        |contrib AS (
        |  SELECT du.d + CAST(k AS INTEGER) AS d, user_id
        |  FROM du, (SELECT unnest(range(7)) AS k)),
        |wau AS (
        |  SELECT c.d, COUNT(DISTINCT user_id) AS wau
        |  FROM contrib c JOIN days ON c.d = days.d GROUP BY 1)
        |SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau, wau,
        |  round(dau / CAST(wau AS DOUBLE), 6) AS stickiness
        |FROM dau JOIN wau ON dau.d = wau.d""".stripMargin)(rollingActives),
    Q("sessionize_events",
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         |g AS (
         |  SELECT *, epoch_us(ts) - lag(epoch_us(ts)) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
         |  FROM e)
         |SELECT user_id, event_id, ts,
         |  CAST(SUM(CASE WHEN gap IS NULL OR gap > $SessionGapUs THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |FROM g""".stripMargin)(sessionizeEvents),
    Q("session_stats",
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         |g AS (
         |  SELECT *, epoch_us(ts) - lag(epoch_us(ts)) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
         |  FROM e),
         |lab AS (
         |  SELECT user_id, ts,
         |    CAST(SUM(CASE WHEN gap IS NULL OR gap > $SessionGapUs THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM g)
         |SELECT user_id, session_seq, COUNT(*) AS n_events,
         |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
         |FROM lab GROUP BY 1, 2""".stripMargin)(sessionStats),
    Q("ewma_smooth",
      s"""WITH ev AS (
         |  SELECT user_id, event_id, value,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
         |  FROM events),
         |c AS (
         |  SELECT user_id, rn + d AS rn,
         |    CAST(value AS DECIMAL(18,2))
         |      * CAST(power(0.5, d) AS DECIMAL(9,7)) AS wx,
         |    CAST(power(0.5, d) AS DECIMAL(9,7)) AS wt
         |  FROM ev, (SELECT unnest(range(0, ${EwmaDepth + 1})) AS d)),
         |a AS (
         |  SELECT user_id, rn, SUM(wx) AS swx, SUM(wt) AS swt
         |  FROM c GROUP BY 1, 2)
         |SELECT ev.user_id, event_id,
         |  CAST(swx AS DOUBLE) / CAST(swt AS DOUBLE) AS ewma
         |FROM ev JOIN a ON ev.user_id = a.user_id AND ev.rn = a.rn""".stripMargin)(
      ewmaSmooth),
    Q("rolling_median",
      """SELECT user_id, event_id, value,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
        |FROM events""".stripMargin)(rollingMedian),
    Q("pareto_cut",
      """WITH rev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT c_nationkey, c_custkey, rev
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        |w AS (
        |  SELECT c_nationkey, c_custkey, rev,
        |    SUM(rev) OVER (PARTITION BY c_nationkey
        |      ORDER BY rev DESC, c_custkey ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(rev) OVER (PARTITION BY c_nationkey) AS total,
        |    CAST(row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY rev DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM j)
        |SELECT c_nationkey, c_custkey, CAST(rev AS DOUBLE) AS revenue, rnk,
        |  round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share
        |FROM w WHERE (cum - rev) * 5 < total * 4""".stripMargin)(paretoCut),
    Q("attribution_last_touch",
      """SELECT event_id, user_id, attr_event_id, attr_type FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |      THEN event_id END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS attr_event_id,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |      THEN event_type END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS attr_type
        |  FROM events)
        |WHERE event_type = 'purchase'""".stripMargin)(attributionLastTouch),
    Q("event_transitions",
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS cnt FROM t
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  round(cnt / CAST(SUM(cnt) OVER (PARTITION BY from_type) AS DOUBLE), 6)
        |    AS p
        |FROM c""".stripMargin)(eventTransitions),
    Q("window_frames",
      """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS hour_sum,
        |  FIRST_VALUE(value) OVER wf AS first_v,
        |  LAST_VALUE(value) OVER wf AS last_v,
        |  NTH_VALUE(value, 3) OVER wf AS third_v
        |FROM events
        |WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)(
      windowFrames),
    Q("scd2_intervals",
      """WITH chg AS (
        |  SELECT * FROM (
        |    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |      LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        AS prev_type
        |    FROM events)
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS status, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM chg""".stripMargin)(scd2Intervals),
    Q("window_distribution",
      """SELECT o_orderkey, ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin)(windowDistribution),
    Q("window_rank",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3""".stripMargin)(windowRank),
    Q("window_running",
      """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM events""".stripMargin)(windowRunning),
    Q("window_lag",
      """SELECT event_id,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS dt_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)(windowLag),
  )
}
