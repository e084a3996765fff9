package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}

/** Relational operator sweep (SURVEY.md §2.4) — the capabilities the
  * reference can only express through user map/reduce code, exposed as
  * first-class declarative operators.
  *
  * Double-precision policy: any SUM/AVG over a double column is
  * computed in decimal (exact, order-independent) and cast to double
  * at the end. Spark and DuckDB then agree bit-for-bit regardless of
  * partitioning / accumulation order — the property the driver's
  * hash-compare needs, and the property that keeps results stable when
  * the same query runs on 32 or 100,000 partitions.
  */
object Relational {

  /** Exact money/quantity arithmetic: double → decimal(18,2). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------
  // Aggregation: TPC-H Q1-style pricing summary (hash agg with
  // partial aggregation; one shuffle on a 6-value grouping key).
  // ---------------------------------------------------------------
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    // lineitemSpread: 4 decimal casts + 3 products per row
    val l = Tables.lineitemSpread(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).as("sq"),
        sum(dec(col("l_extendedprice"))).as("sbp"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("sdp"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).as("sc"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        // cents-exact DECIMAL round first, double second: at
        // 17-significant-digit magnitudes (the 10×-facts sweep)
        // Spark's correctly-rounded BigDecimal→double and DuckDB's
        // int/10^scale float division differ by one ulp on scale-6
        // values; a scale-2 decimal's double image is one
        // exact-integer IEEE division, identical everywhere. The
        // explicit round() (NOT a decimal downcast — DuckDB's cast
        // truncates where Spark's rounds) is half-up on positives in
        // both engines, applied to EXACT decimals.
        round(col("sq"), 2).cast("double").as("sum_qty"),
        round(col("sbp"), 2).cast("double").as("sum_base_price"),
        round(col("sdp"), 2).cast("double").as("sum_disc_price"),
        round(col("sc"), 2).cast("double").as("sum_charge"),
        (round(col("sq"), 2).cast("double") / col("count_order"))
          .as("avg_qty"),
        (round(col("sbp"), 2).cast("double") / col("count_order"))
          .as("avg_price"),
        col("count_order"))
  }

  private val q1Sql =
    """WITH l AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
      |    CAST(l_discount AS DECIMAL(18,2)) AS d,
      |    CAST(l_tax AS DECIMAL(18,2)) AS t
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      |SELECT l_returnflag, l_linestatus,
      |  CAST(round(SUM(q), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(SUM(p), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(SUM(p * (1 - d)), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(SUM(p * (1 - d) * (1 + t)), 2) AS DOUBLE) AS sum_charge,
      |  CAST(round(SUM(q), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(round(SUM(p), 2) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM l GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** The `spark.sql(...)` entry path: the exact ANSI text the DuckDB
    * oracle runs is executed by Spark over a temp view — one string,
    * two engines, hash-identical results. Pins that the SQL front
    * door (not just the DataFrame API) is a first-class way into the
    * engine, and that the oracle dialect is genuinely shared.
    */
  def q1SqlEntry(s: SparkSession, dir: String): DataFrame = {
    // newSession(): same SparkContext and shared state, but an
    // ISOLATED temp-view namespace — registering "lineitem" in the
    // caller's session would clobber (and the cleanup drop would then
    // delete) a user view of the same name
    val s2 = s.newSession()
    // raw lineitem, no fan-out: measured twice in r12 — the spread
    // variant read +0.29 s in both full sweeps (unlike q1Agg, which
    // keeps it), so the SQL entry path stays on the bare scan
    Tables.lineitem(s2, dir).createOrReplaceTempView("lineitem")
    try s2.sql(q1Sql) finally s2.catalog.dropTempView("lineitem")
  }

  // ---------------------------------------------------------------
  // Projection + predicate — both push down to the parquet scan
  // (ReadSchema prunes to 6 columns, PushedFilters carries the
  // range + quantity predicates).
  // ---------------------------------------------------------------
  def filterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))

  /** Global top-k: orderBy+limit plans as TakeOrderedAndProject —
    * per-partition heaps of k rows, never a full sort.
    */
  def sortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .limit(100)

  /** Composite pipeline (TPC-H Q3 shape): 3-table join → filter →
    * aggregate → top-10. The realistic multi-operator query: customer
    * dim broadcast, orders⋈lineitem shuffle on orderkey, exact
    * decimal revenue, TakeOrderedAndProject for the limit.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1995-03-15 00:00:00"))
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: the 6-table star join — fact tables
    * (lineitem⋈orders⋈customer) shuffle on their keys; the three
    * dimensions (supplier, nation, region-filtered nation list) are
    * explicit broadcasts, so the fact side never reshuffles for them.
    * The c_nationkey = s_nationkey residual rides on the supplier
    * broadcast join. This is the query shape whose join ORDER matters
    * most at 100 TB — here the order is written smallest-last and AQE
    * re-plans at runtime if stats disagree.
    */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01 00:00:00"))
    val hi = to_timestamp(lit("1997-01-01 00:00:00"))
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    Tables.lineitem(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q14-shaped promo revenue share: one month of lineitem
    * joined to part (broadcast — part is a dimension), conditional
    * decimal revenue sums, one scalar out. The conditional aggregate
    * runs in the same partial+final hash agg as the plain sum — one
    * pass, no second scan for the numerator. Both sums stay exact
    * decimal to the end; the percentage is one double division on
    * identical operands in both engines.
    */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01 00:00:00"))
    val hi = to_timestamp(lit("1996-02-01 00:00:00"))
    val rev = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).as("pr"),
        sum(rev).as("tr"))
      .select(
        round(lit(100.0) * col("pr").cast("double") / col("tr").cast("double"), 6)
          .as("promo_pct"),
        col("pr").cast("double").as("promo_revenue"),
        col("tr").cast("double").as("total_revenue"))
  }

  /** TPC-H Q7-shaped bi-national trade volume: revenue flowing
    * between two fixed nations (supplier side vs customer side, both
    * directions), by ship year. The fact chain is
    * lineitem→orders→customer; supplier and both nation legs are
    * broadcast dimensions, and the disjunctive nation-pair predicate
    * rides the broadcast joins as a residual filter — the fact table
    * shuffles only for the lineitem⋈orders key, exactly once.
    */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val n1 = "NATION_18"
    val n2 = "NATION_19"
    val supNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === n1 && col("cust_nation") === n2) ||
          (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  // ---------------------------------------------------------------
  // Subqueries — Catalyst's scalar / IN / correlated-EXISTS rewrite
  // machinery (decorrelated into joins; the plan-shape sweep keeps
  // them nested-loop-free). Expressed through spark.sql to exercise
  // the SQL surface end to end.
  // ---------------------------------------------------------------
  def subqueryScalar(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_sq")
    s.sql(
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders_sq
        |WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders_sq)""".stripMargin)
  }

  def subqueryIn(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_sq")
    Tables.nation(s, dir).createOrReplaceTempView("nation_sq")
    s.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer_sq
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation_sq WHERE n_regionkey <= 1)
        |GROUP BY c_mktsegment""".stripMargin)
  }

  def subqueryExists(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("supplier_sq")
    Tables.customer(s, dir).createOrReplaceTempView("customer_sq2")
    s.sql(
      """SELECT s_nationkey, COUNT(*) AS n FROM supplier_sq
        |WHERE EXISTS (
        |  SELECT 1 FROM customer_sq2
        |  WHERE c_nationkey = s_nationkey AND c_acctbal > s_acctbal)
        |GROUP BY s_nationkey""".stripMargin)
  }

  /** Ordered funnel analysis — the product-analytics staple: for each
    * user, the first `view`, the first `click` strictly after it, and
    * the first `purchase` strictly after that, plus the stage reached
    * (1–3). Each step is one filtered aggregate equi-joined on
    * user_id — per-key state, no windows over the whole stream, no
    * driver logic — so the funnel computes in three hash shuffles of
    * the (already event-type-pruned) fact regardless of scale, and
    * AQE broadcasts the shrinking step frames onto later joins.
    */
  def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
          .cast("long").as("stage"))
  }

  /** TPC-H Q18 shape — large-order customers: a HAVING-filtered
    * aggregate over the fact drives the join back to orders and the
    * customer dim. The quantity sum is exact decimal (policy above);
    * the aggregate shrinks lineitem ~20× before any join, so the
    * orders join shuffles only qualifying orderkeys and AQE broadcasts
    * the survivor side when it fits — the pattern for any
    * "aggregate-then-enrich" query at 100 TB.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    // orderkey fan-out doubles as the aggregate's exchange (no extra
    // shuffle vs the raw form — the agg needed one on this key anyway)
    // while the decimal-sum map side runs on 32 tasks, not one
    val big = Tables.lineitemSpread(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
      .filter(col("sq") > 150)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("o_totalprice").as("total_price"),
        col("sq").cast("double").as("sum_qty"))
  }

  /** RFM customer segmentation — the classic warehouse scoring query:
    * per customer, Recency (days since last order, against the
    * corpus-max date), Frequency (order count), Monetary (exact
    * decimal lifetime spend), each banded 1–3 on fixed thresholds
    * (fixture-calibrated tertiles; production thresholds are config,
    * or quantile-derived like [[Aggregates.winsorizeValues]]'s
    * bounds). One aggregate over orders plus a 1-row max-date
    * broadcast: two scans, one shuffle, at any scale. The monetary
    * band compares the exact decimal→double sum, so banding is
    * engine-identical without rounding tricks.
    */
  def customerRfm(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val maxD = o.agg(max(to_date(col("o_orderdate"))).as("dmax"))
    val r = col("recency_days")
    val f = col("frequency")
    val m = col("monetary")
    o.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("frequency"),
        sum(dec(col("o_totalprice"))).cast("double").as("monetary"))
      .crossJoin(broadcast(maxD))
      .withColumn("recency_days", datediff(col("dmax"), col("last_d")).cast("long"))
      .select(col("o_custkey").as("custkey"), col("recency_days"),
        col("frequency"), col("monetary"),
        when(r <= 120, 3L).when(r <= 270, 2L).otherwise(1L).as("r_score"),
        when(f >= 12, 3L).when(f >= 9, 2L).otherwise(1L).as("f_score"),
        when(m >= 2800000d, 3L).when(m >= 2000000d, 2L).otherwise(1L)
          .as("m_score"))
  }

  /** TPC-H Q6 shape — the forecast-revenue scan: a single pass over
    * lineitem with every predicate (date range, discount band,
    * quantity cap) pushed to the parquet scan and one exact-decimal
    * sum out. The simplest query in the suite and the purest test of
    * pushdown: at 100 TB this is min/max-pruned row groups + a
    * map-only partial aggregate — zero shuffle beyond the final
    * 1-row exchange.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  /** TPC-H Q10 shape — returned-item ranking: one quarter of orders
    * joined to 'R'-flagged lineitem, enriched with customer and the
    * broadcast nation dim, top-20 by lost revenue. Both fact filters
    * are pushed below the join, so the orderkey shuffle carries only
    * the quarter × returned-rows intersection; the final ranking is
    * TakeOrderedAndProject (per-partition heaps), never a full sort.
    * Ties can't break differently across engines: the sort key
    * (revenue, c_custkey) is total because c_custkey is in the group.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1996-10-01 00:00:00")))
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13 shape — customer order-count distribution: a LEFT join
    * so zero-order customers survive, then two aggregations (orders
    * per customer, customers per count). The reference's comment-LIKE
    * filter has no fixture column; the '4-NOT SPECIFIED' priority
    * plays the excluded class. The histogram's second aggregate
    * groups on a value with ~tens of distinct counts — the classic
    * shrinking re-aggregation that AQE coalesces to a handful of
    * partitions.
    */
  def q13OrderCounts(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    * revenue-per-supplier aggregate is computed once, its 1-row max
    * broadcast back onto it (exact decimal equality — no double
    * epsilon games), and winners enriched from the supplier dim.
    * The "view used twice" of the official query becomes one frame
    * reused in two subplans; Spark evaluates the scan twice rather
    * than caching — correct and cheap since the aggregate output is
    * supplier-cardinality, and at 100 TB you'd persist the revenue
    * frame explicitly between the two uses.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("r"))
    val mx = rev.agg(max(col("r")).as("mr"))
    rev.join(broadcast(mx), col("r") === col("mr"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("r").cast("double").as("total_revenue"))
  }

  /** TPC-H Q19 shape — disjunctive brand/size/quantity predicate over
    * the part join: three (brand, size-range, quantity-range)
    * conjuncts OR-ed together. The join key is shared by all three
    * arms, so this stays ONE broadcast hash join with the disjunction
    * as a residual filter — not a UNION of three joins — and Catalyst
    * extracts the common p_partkey equality. The arm predicates
    * reference both sides, which is exactly what a residual is for.
    */
  def q19DiscountedRevenue(s: SparkSession, dir: String): DataFrame = {
    def arm(brand: String, szHi: Int, qLo: Double, qHi: Double): Column =
      col("p_brand") === brand &&
        col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#12", 5, 1, 11) || arm("Brand#23", 10, 10, 20) ||
        arm("Brand#3", 15, 20, 30))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q4 shape — late-shipping order priorities: one quarter of
    * orders kept when ANY of their lineitems shipped more than 30
    * days after the order date. The EXISTS decorrelates to a left
    * SEMI join (first match short-circuits — no fan-out, no distinct
    * needed), with the 30-day comparison as the join residual. The
    * fixture lacks TPC-H's commit/receipt dates, so ship-vs-order
    * lateness plays the Q4 predicate (reference has no date columns
    * at all; this is the Spark-idiomatic shape of the query class).
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
    o.join(Tables.lineitem(s, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
  }

  /** TPC-H Q8 shape — market share: of the revenue ASIA-region
    * customers generated in 1996–1997, what fraction was supplied by
    * NATION_2's suppliers, per year. `nation` joins in TWO roles
    * (customer side restricting to the region, supplier side naming
    * the competitor) — both broadcast, so the fact pipeline
    * lineitem⋈orders⋈customer shuffles only on its own keys. The
    * share division happens once per year row; sums stay exact
    * decimal until then.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val custNation = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    Tables.lineitem(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .withColumn("vol", dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round((sum(when(col("supp_nation") === "NATION_2", col("vol"))
          .otherwise(lit(0).cast(DecimalType(18, 2))))
          / sum(col("vol"))).cast("double"), 6).as("mkt_share"),
        sum(col("vol")).cast("double").as("total_volume"))
  }

  /** TPC-H Q9 shape — product-line profit by supplier nation and
    * year: every lineitem whose part name contains 'widget', revenue
    * grouped by the supplying nation and order year. Part, supplier,
    * and nation are broadcast dims; orders joins on the fact's own
    * orderkey — one fact shuffle total. (No partsupp table in the
    * fixture, so profit = revenue without supply cost; the join
    * topology — fact × 3 dims + orders — is the Q9 shape.)
    */
  def q9Profit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("profit"),
        count(lit(1)).as("n"))

  /** TPC-H Q16 shape — supplier diversity per part attribute:
    * distinct supplying suppliers per (brand, size), excluding one
    * brand and the small sizes. The fixture has no partsupp, so the
    * observed lineitem (partkey, suppkey) pairs play the relation —
    * same shape: a distinct aggregation over a join, where the
    * distinct is a second shuffle on (brand, size, suppkey) before
    * the count (Spark plans count(DISTINCT) as expand+two-phase agg).
    */
  def q16SupplierParts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#45" && col("p_size") > 10)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** TPC-H Q17 shape — small-quantity revenue: lineitems of one brand
    * whose quantity is below 20% of that part's average quantity.
    * The correlated scalar subquery decorrelates to a per-part
    * aggregate joined back on partkey. The threshold compare avoids
    * division entirely — `5 · qty · count < sum` in exact decimal —
    * so no float rounding can flip a boundary row in either engine.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    // NO fan-out here (implemented, measured, REVERTED in r12): the
    // raw form's two exchanges carry ~20k partial-aggregated /
    // brand-filtered rows, so replacing them with one reused 600k-row
    // fan-out exchange shuffles 15× the bytes it saves in map-side
    // parallelism (full sweep read 0.71→1.40 s)
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(dec(col("l_quantity"))).as("sq"), count(lit(1)).as("cq"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(dec(col("l_quantity")) * lit(5) * col("cq") < col("sq"))
      .agg(
        sum(dec(col("l_extendedprice"))).cast("double").as("total_price"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q22 shape — dormant high-balance customers: above the
    * positive-balance average, with no orders at all. The global
    * average arrives as a broadcast 1-row aggregate; the compare is
    * division-free (`bal · n > sum` in decimal, exact in both
    * engines); dormancy ("no orders since 1999") is a left ANTI join
    * — the 100 TB-safe form of NOT EXISTS (never a NOT IN, whose
    * null semantics also force a nullable-aware plan) — with the date
    * filter pushed below it so the anti side shrinks at the scan.
    * (Unscoped Q22 "no orders ever" is empty at every fixture scale —
    * all high-balance customers have some order — so the dormancy
    * window keeps the query demonstrably non-trivial.)
    */
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    val avgBal = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("sb"), count(lit(1)).as("cb"))
    Tables.customer(s, dir)
      .join(broadcast(avgBal))
      .filter(dec(col("c_acctbal")) * col("cb") > col("sb"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
  }

  /** The fixture ships no partsupp table, so the part-supplier
    * relation is DERIVED from observed lineitem trade: one row per
    * (partkey, suppkey) pair, cost = cheapest observed extended
    * price (exact decimal — min is order-independent), avail =
    * total traded quantity. Both engines derive it with the same
    * aggregation, so Q2/Q11 shapes stay under the differential gate.
    */
  private def derivedPartsupp(s: SparkSession, dir: String,
      spreadByPart: Boolean = false): DataFrame = {
    // spreadByPart: the partkey-keyed fan-out exchange serves the pair
    // aggregate here (subset rule) AND the consumer's per-part window
    // (q2) / per-part re-aggregate (q11) — no further exchange in
    // either plan (r12 full sweep: q11 1.18→0.60 s, q2 1.26→1.11 s).
    // q20 keeps the raw scan: its consumer joins on BOTH keys and
    // gains nothing from part clustering, so the fan-out only
    // replaced its post-partial-agg exchange with a full-row one
    // (measured +0.13 s).
    val li = if (spreadByPart) Tables.lineitemSpreadByPart(s, dir)
             else Tables.lineitem(s, dir)
    li.groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(
        min(dec(col("l_extendedprice"))).as("ps_supplycost"),
        sum(dec(col("l_quantity"))).as("ps_availqty"))
  }

  private val partsuppSql =
    """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2""".stripMargin

  /** TPC-H Q2 shape — min-cost supplier per part: among a region's
    * suppliers, who supplies each large part cheapest. The correlated
    * `= (SELECT MIN(..))` decorrelates to a per-part window min with
    * an exact-decimal equality keep — no epsilon games (min returns a
    * decimal that re-matches its own source rows bit-for-bit), and no
    * groupBy + self-join re-match, which would derive the partsupp
    * relation twice. Supplier/nation/region are broadcast; the whole
    * query shuffles the derived partsupp once on ps_partkey.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val regionSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val ps = derivedPartsupp(s, dir, spreadByPart = true)
      .join(regionSupp, col("ps_suppkey") === col("s_suppkey"))
    // correlated min as a per-part window, not a groupBy + self-join
    // re-match: one shuffle on ps_partkey and ONE derivation of the
    // partsupp relation instead of two (the self-join form re-derived
    // the whole lineitem aggregate for each side). The equality keep
    // is on exact decimals, so no float boundary can flip a row.
    val wPart = Window.partitionBy(col("ps_partkey"))
    ps.withColumn("mc", min(col("ps_supplycost")).over(wPart))
      .filter(col("ps_supplycost") === col("mc"))
      .join(broadcast(Tables.part(s, dir).filter(col("p_size") >= 30)),
        col("ps_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("ps_supplycost").cast("double").as("supplycost"),
        col("s_acctbal"))
  }

  /** TPC-H Q11 shape — important stock: parts whose derived inventory
    * value exceeds a fraction of the total. The global total arrives
    * as a broadcast 1-row aggregate and the HAVING compare is
    * division-free (`value · 10000 > total` in exact decimal), so no
    * float threshold can flip a boundary part.
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val perPart0 = derivedPartsupp(s, dir, spreadByPart = true)
      .withColumn("v", col("ps_supplycost") * col("ps_availqty"))
      .groupBy(col("ps_partkey"))
      .agg(sum(col("v")).as("part_value"))
    // r11 lineage cut (the entity_resolution idiom): without it the
    // broadcast `total` subtree re-derives the whole lineitem →
    // partsupp → per-part aggregate chain (2 fact scans per run);
    // behind the LogicalRDD leaf the total job shares perPart's
    // shuffle map stages and lineitem is scanned once.
    val perPart = s.createDataFrame(perPart0.rdd, perPart0.schema)
    // the global total is the sum of the per-part sums — exact
    // decimals are associative, so re-aggregating the (small) per-part
    // frame is bit-identical to a second pass over the derived
    // partsupp and skips re-deriving the whole lineitem aggregate
    val total = perPart.agg(sum(col("part_value")).as("total_value"))
    perPart.join(broadcast(total))
      .filter(col("part_value") * lit(10000) > col("total_value"))
      .select(col("ps_partkey"),
        col("part_value").cast("double").as("part_value"))
  }

  /** TPC-H Q12 shape — priority counts per ship class: one year of
    * lineitem joined to orders, conditional counts of urgent vs other
    * priorities per class. The fixture has no l_shipmode column, so
    * l_returnflag plays the mode; the pattern under test is the
    * post-join conditional aggregation (both counts in ONE pass —
    * never two filtered joins).
    */
  def q12ShipPriority(s: SparkSession, dir: String): DataFrame = {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag").as("ship_class"))
      .agg(
        sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q20 shape — excess stock: suppliers (with their nation)
    * whose derived availability of any 'small…' part exceeds half of
    * that part-supplier's quantity traded in 1996. The official
    * query's nested-IN chain becomes two left-SEMI joins over the
    * derived partsupp; the half-threshold compare is division-free
    * exact decimal (`2·avail > windowSum`).
    */
  def q20ExcessStock(s: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(s, dir)
      .filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val windowQty = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .groupBy(col("l_partkey").as("wk"), col("l_suppkey").as("ws"))
      .agg(sum(dec(col("l_quantity"))).as("wqty"))
    val excess = derivedPartsupp(s, dir)
      .join(broadcast(smallParts), col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(windowQty, col("ps_partkey") === col("wk")
        && col("ps_suppkey") === col("ws"))
      .filter(col("ps_availqty") * lit(2) > col("wqty"))
      // no distinct: consumed as a semi-join build side (existence only)
      .select(col("ps_suppkey"))
    Tables.supplier(s, dir)
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** TPC-H Q21 shape — suppliers who kept finished orders waiting:
    * for 'F' orders, the supplier shipped LATE (>60 days after the
    * order date — the fixture's stand-in for receipt>commit), the
    * order involved ANOTHER supplier (EXISTS → left semi), and no
    * OTHER supplier was late on it (NOT EXISTS → left anti). The
    * double-correlated subquery pair becomes two self-joins of the
    * same late-lines frame — both equi on orderkey with a
    * supplier-inequality residual.
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val fOrders = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    val lines = Tables.lineitem(s, dir)
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
    val l1 = lines.filter(col("late"))
      .select(col("ok"), col("sk")).distinct()
    // no distinct on semi/anti build sides — existence checks only
    val others = lines.select(col("ok").as("ok2"), col("sk").as("sk2"))
    val lateOthers = lines.filter(col("late"))
      .select(col("ok").as("ok3"), col("sk").as("sk3"))
    l1.join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(lateOthers, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
      .join(broadcast(Tables.supplier(s, dir)), col("sk") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** The region→nation→supplier containment DAG flattened to every
    * ancestor→descendant pair — the classic recursive-CTE use
    * (hierarchy closure), run from ONE SQL text on both engines
    * (Spark 4 WITH RECURSIVE and DuckDB parse the identical string,
    * the q1_sql discipline). Spark 4 restriction honored: the
    * recursive branch is UNION ALL with an explicit depth bound (the
    * dedup cluster fixpoint in [[graft.dedup.DedupOps]] remains the
    * scale path for UNBOUNDED iteration — there the loop lives in
    * driver code with checkpointing, not in the SQL).
    */
  private val hierarchySql =
    """WITH RECURSIVE
      |edges AS (
      |  SELECT 'r' || r_regionkey AS src, 'n' || n_nationkey AS dst
      |  FROM region JOIN nation ON r_regionkey = n_regionkey
      |  UNION ALL
      |  SELECT 'n' || n_nationkey, 's' || s_suppkey
      |  FROM nation JOIN supplier ON n_nationkey = s_nationkey),
      |reach(src, dst, depth) AS (
      |  SELECT src, dst, 1 AS depth FROM edges
      |  UNION ALL
      |  SELECT r.src, e.dst, r.depth + 1
      |  FROM reach r JOIN edges e ON r.dst = e.src
      |  WHERE r.depth < 4)
      |SELECT src, dst, CAST(MIN(depth) AS BIGINT) AS depth
      |FROM reach GROUP BY 1, 2""".stripMargin

  def hierarchyClosure(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession() // isolated temp-view namespace (as q1SqlEntry)
    Tables.region(s2, dir).createOrReplaceTempView("region")
    Tables.nation(s2, dir).createOrReplaceTempView("nation")
    Tables.supplier(s2, dir).createOrReplaceTempView("supplier")
    try s2.sql(hierarchySql)
    finally Seq("region", "nation", "supplier").foreach(s2.catalog.dropTempView)
  }

  /** Global contiguous row IDs — the scale-safe form of
    * `row_number() OVER (ORDER BY …)`. An un-partitioned window drags
    * the whole table onto ONE task (WindowExec warns exactly this);
    * training pipelines need dense example ids over billions of rows,
    * so that form is disqualified at 100 TB. The distributed shape:
    * range-partition by the order key (partition i's keys all precede
    * partition i+1's), sort within partitions, then `zipWithIndex` —
    * which runs one tiny job to count rows per partition, prefix-sums
    * the counts on the driver (numPartitions longs, not data), and
    * stamps offsets map-side. Total order without any single-task
    * stage. Output deliberately matches the ROW_NUMBER oracle
    * bit-for-bit: determinism comes from the total key order, not
    * from partition boundaries (wherever the sampled range bounds
    * land, concatenating sorted ranges is the same global order).
    */
  def globalRowIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sorted = Tables.documents(s, dir)
      .select(col("doc_id"), col("source")).as[(Long, String)]
      .repartitionByRange(16, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    sorted.rdd.zipWithIndex()
      .map { case ((id, src), idx) => (id, src, idx + 1L) }
      .toDF("doc_id", "source", "row_id")
  }

  /** Incremental materialized-view maintenance for a join-aggregate —
    * the ΔV identity every warehouse's streaming MV engine rests on:
    * for V = γ(R ⋈ S) with additive aggregates, V(R ∪ ΔR) is the
    * partial-state merge of V(R) and γ(ΔR ⋈ S), so an update touches
    * only |Δ| rows of the fact side. Here R is orders (base = keys
    * ≢0 mod 10, delta = the rest), S the customer dimension, V the
    * per-market-segment order count and revenue. Both states come
    * from the same join-aggregate shape; the maintenance step is a
    * union of two agg-sized (≤ |segments|) frames re-aggregated —
    * never a recompute of the base fact table. At 100 TB the delta
    * side is the small one, so AQE broadcasts Δ against the dim, and
    * the merge cost is O(|Δ| + |V|). The oracle recomputes V from the
    * full fact table — proving the identity, not just the plumbing.
    * Revenue sums ride DECIMAL(18,2) (exact, order-free) and only the
    * merged total is cast to double.
    */
  def mvIncremental(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def stateOf(orders: DataFrame): DataFrame =
      orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val orders = Tables.orders(s, dir)
    val base = stateOf(orders.filter(pmod(col("o_orderkey"), lit(10L)) =!= 0))
    val delta = stateOf(orders.filter(pmod(col("o_orderkey"), lit(10L)) === 0))
    base.unionByName(delta)
      .groupBy(col("segment"))
      .agg(sum(col("cnt")).cast("long").as("order_cnt"),
        sum(col("rev")).cast("double").as("revenue"))
  }

  private val mvIncrementalOracle =
    """SELECT c_mktsegment AS segment, COUNT(*) AS order_cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** CDC merge — MERGE INTO semantics (upsert + delete) applied as a
    * batch: a deterministic change feed derived from the base table
    * (keys ≡0 mod 10 delete, ≤3 update the balance, ≡4 insert under a
    * negated key — a namespace disjoint from the positive base keys
    * at ANY table size, so a synthetic insert can never collide with
    * and overwrite a real row) full-outer-joins the base on the key;
    * deletes drop,
    * updates/inserts take the change row, untouched rows pass
    * through, and every output row is tagged with the action that
    * produced it. One equi-shuffle of base and feed — the standard
    * distributed MERGE shape (Delta/Iceberg do exactly this join
    * under AQE; a bloom prefilter like [[Joins.joinBloom]] slots in
    * front when the feed is sparse).
    */
  def cdcMerge(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"),
        col("c_acctbal").as("bal"))
    val m = pmod(col("c_custkey"), lit(10L))
    val changes = Tables.customer(s, dir)
      .withColumn("op",
        when(m === 0, "delete").when(m <= 3, "update")
          .when(m === 4, "insert"))
      .filter(col("op").isNotNull)
      .select(
        when(col("op") === "insert", -col("c_custkey") - 1L)
          .otherwise(col("c_custkey")).as("k"),
        col("op"), col("c_mktsegment").as("new_segment"),
        round(col("c_acctbal") + 100, 2).as("new_bal"))
    base.join(changes, Seq("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(col("k"),
        coalesce(col("new_segment"), col("segment")).as("segment"),
        when(col("op").isNotNull, col("new_bal")).otherwise(col("bal"))
          .as("bal"),
        coalesce(col("op"), lit("keep")).as("op"))
  }

  val all: Seq[Q] = Seq(
    Q("q2_min_cost_supplier",
      s"""WITH ps AS (
         |  $partsuppSql),
         |rs AS (
         |  SELECT s_suppkey, s_name, s_acctbal, n_name
         |  FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |psr AS (
         |  SELECT ps.*, rs.s_name, rs.s_acctbal, rs.n_name
         |  FROM ps JOIN rs ON ps_suppkey = s_suppkey),
         |mc AS (
         |  SELECT ps_partkey AS mk, MIN(ps_supplycost) AS mc
         |  FROM psr GROUP BY 1)
         |SELECT p_partkey, p_name, s_name, n_name,
         |  CAST(ps_supplycost AS DOUBLE) AS supplycost, s_acctbal
         |FROM psr
         |JOIN mc ON ps_partkey = mk AND ps_supplycost = mc.mc
         |JOIN part ON ps_partkey = p_partkey
         |WHERE p_size >= 30""".stripMargin)(q2MinCostSupplier),
    Q("q11_important_stock",
      s"""WITH v AS (
         |  SELECT ps_partkey, ps_supplycost * ps_availqty AS v FROM (
         |  $partsuppSql)),
         |pp AS (SELECT ps_partkey, SUM(v) AS part_value FROM v GROUP BY 1),
         |t AS (SELECT SUM(v) AS total_value FROM v)
         |SELECT ps_partkey, CAST(part_value AS DOUBLE) AS part_value
         |FROM pp, t
         |WHERE part_value * 10000 > total_value""".stripMargin)(q11ImportantStock),
    Q("q12_ship_priority",
      """SELECT l_returnflag AS ship_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1""".stripMargin)(q12ShipPriority),
    Q("q20_excess_stock",
      s"""WITH ps AS (
         |  $partsuppSql),
         |wq AS (
         |  SELECT l_partkey AS wk, l_suppkey AS ws,
         |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS wqty
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY 1, 2),
         |excess AS (
         |  SELECT DISTINCT ps_suppkey
         |  FROM ps
         |  JOIN wq ON ps_partkey = wk AND ps_suppkey = ws
         |  WHERE ps_partkey IN (SELECT p_partkey FROM part
         |                       WHERE p_name LIKE 'small%')
         |    AND ps_availqty * 2 > wqty)
         |SELECT s_suppkey, s_name, n_name
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)""".stripMargin)(
      q20ExcessStock),
    Q("q21_waiting_supplier",
      """WITH lines AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |l1 AS (SELECT DISTINCT ok, sk FROM lines WHERE late)
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM l1
        |JOIN supplier ON sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lines o
        |              WHERE o.ok = l1.ok AND o.sk <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM lines o
        |                  WHERE o.ok = l1.ok AND o.sk <> l1.sk AND o.late)
        |GROUP BY 1, 2""".stripMargin)(q21WaitingSupplier),
    Q("hierarchy_closure", hierarchySql)(hierarchyClosure),
    Q("global_row_ids",
      """SELECT doc_id, source,
        |  ROW_NUMBER() OVER (ORDER BY doc_id) AS row_id
        |FROM documents""".stripMargin)(globalRowIds),
    Q("mv_incremental", mvIncrementalOracle)(mvIncremental),
    Q("cdc_merge",
      """WITH base AS (
        |  SELECT c_custkey AS k, c_mktsegment AS segment, c_acctbal AS bal
        |  FROM customer),
        |ch AS (
        |  SELECT CASE WHEN op = 'insert' THEN -c_custkey - 1
        |              ELSE c_custkey END AS k,
        |    op, c_mktsegment AS new_segment,
        |    round(c_acctbal + 100, 2) AS new_bal
        |  FROM (SELECT *,
        |      CASE WHEN c_custkey % 10 = 0 THEN 'delete'
        |           WHEN c_custkey % 10 <= 3 THEN 'update'
        |           WHEN c_custkey % 10 = 4 THEN 'insert' END AS op
        |    FROM customer)
        |  WHERE op IS NOT NULL)
        |SELECT COALESCE(base.k, ch.k) AS k,
        |  COALESCE(new_segment, segment) AS segment,
        |  CASE WHEN op IS NOT NULL THEN new_bal ELSE bal END AS bal,
        |  COALESCE(op, 'keep') AS op
        |FROM base FULL JOIN ch ON base.k = ch.k
        |WHERE op IS NULL OR op <> 'delete'""".stripMargin)(cdcMerge),
    Q("funnel_conversion",
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, MIN(ts) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  CAST(1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin)(funnelConversion),
    Q("customer_rfm",
      """WITH mx AS (
        |  SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
        |agg AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS monetary
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey AS custkey,
        |  CAST(dmax - last_d AS BIGINT) AS recency_days,
        |  frequency, monetary,
        |  CAST(CASE WHEN dmax - last_d <= 120 THEN 3
        |       WHEN dmax - last_d <= 270 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
        |  CAST(CASE WHEN frequency >= 12 THEN 3
        |       WHEN frequency >= 9 THEN 2 ELSE 1 END AS BIGINT) AS f_score,
        |  CAST(CASE WHEN monetary >= 2800000 THEN 3
        |       WHEN monetary >= 2000000 THEN 2 ELSE 1 END AS BIGINT) AS m_score
        |FROM agg, mx""".stripMargin)(customerRfm),
    Q("q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |SELECT c_custkey, c_mktsegment, o_orderkey,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS order_day,
        |  o_totalprice AS total_price,
        |  CAST(sq AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin)(q18LargeOrders),
    Q("q6_forecast",
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin)(q6Forecast),
    Q("q10_returned_items",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)(q10ReturnedItems),
    Q("q13_order_counts",
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
        |             WHERE o_orderpriority <> '4-NOT SPECIFIED') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM per_cust GROUP BY 1""".stripMargin)(q13OrderCounts),
    Q("q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        |FROM rev
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = (SELECT MAX(r) FROM rev)""".stripMargin)(q15TopSupplier),
    Q("q19_discounted_revenue",
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)(q19DiscountedRevenue),
    Q("q4_order_priority",
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1""".stripMargin)(q4OrderPriority),
    Q("q8_market_share",
      """SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |  round(CAST(
        |    SUM(CASE WHEN n2.n_name = 'NATION_2' THEN vol
        |             ELSE CAST(0 AS DECIMAL(18,2)) END) / SUM(vol)
        |    AS DOUBLE), 6) AS mkt_share,
        |  CAST(SUM(vol) AS DOUBLE) AS total_volume
        |FROM (
        |  SELECT l_suppkey, o_orderdate,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') f
        |JOIN supplier ON f.l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY 1""".stripMargin)(q8MarketShare),
    Q("q9_profit",
      """SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit,
        |  COUNT(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2""".stripMargin)(q9Profit),
    Q("q16_supplier_parts",
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_size > 10
        |GROUP BY 1, 2""".stripMargin)(q16SupplierParts),
    Q("q17_small_quantity",
      """WITH per_part AS (
        |  SELECT l_partkey AS pk,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |    COUNT(*) AS cq
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  COUNT(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN per_part ON l_partkey = pk
        |WHERE p_brand = 'Brand#23'
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq""".stripMargin)(
      q17SmallQuantity),
    Q("q22_global_sales",
      """WITH t AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sb,
        |    COUNT(*) AS cb
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, t
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cb > sb
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1""".stripMargin)(q22GlobalSales),
    Q("q1_agg", q1Sql)(q1Agg),
    Q("q1_sql", q1Sql)(q1SqlEntry),
    Q("q3_shipping",
      """SELECT l_orderkey,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS order_day,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, order_day
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)(q3Shipping),
    Q("q5_region_revenue",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin)(q5RegionRevenue),
    Q("q14_promo_revenue",
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'),
        |s AS (
        |  SELECT SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS pr,
        |    SUM(rev) AS tr
        |  FROM j)
        |SELECT round(100.0 * CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE), 6)
        |    AS promo_pct,
        |  CAST(pr AS DOUBLE) AS promo_revenue,
        |  CAST(tr AS DOUBLE) AS total_revenue
        |FROM s""".stripMargin)(q14PromoRevenue),
    Q("q7_nation_volume",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year, l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  WHERE (ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19')
        |     OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18'))
        |GROUP BY 1, 2, 3""".stripMargin)(q7NationVolume),
    Q("subquery_scalar",
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders
        |WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)""".stripMargin)(subqueryScalar),
    Q("subquery_in",
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
        |GROUP BY c_mktsegment""".stripMargin)(subqueryIn),
    Q("subquery_exists",
      """SELECT s_nationkey, COUNT(*) AS n FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM customer
        |  WHERE c_nationkey = s_nationkey AND c_acctbal > s_acctbal)
        |GROUP BY s_nationkey""".stripMargin)(subqueryExists),
    Q("filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity >= 45""".stripMargin)(filterProject),
    Q("sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d') AS ship_day
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin)(sortLimit),
  )
}
