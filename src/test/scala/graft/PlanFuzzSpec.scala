package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential fuzzing — extends the fixed registry gate
  * with GENERATED plans: a seeded ScalaCheck generator produces ~150
  * random filter/project/distinct/aggregate/join/window/set-op
  * queries over lineitem×orders (bases: each table alone, inner,
  * left-outer and FULL-outer joins — the latter with WHERE predicates
  * that license the full→left/right/inner outer-join-elimination
  * rewrites — EXISTS/NOT-EXISTS semi/anti joins with a
  * generated right-side predicate, and NULL-KEY-heavy inner/full
  * joins whose join condition itself nulls a fifth of the left
  * keys), each rendered BOTH as a DataFrame
  * program and as the equivalent ANSI SQL; the SQL runs in DuckDB
  * (tools/fuzz_runner.py, one subprocess for the whole batch) and the
  * row sets must match exactly. Window shapes cover
  * row_number/rank/lag/running-sum with a total-order tiebreak that
  * includes the value column (rows tied on the base key may differ in
  * the value — the grammar's own first catch); set-op shapes cover
  * the full UNION/INTERSECT/EXCEPT × [ALL] ladder; aggregates draw a
  * grouping mode (plain / ROLLUP / CUBE — the Expand surface); and a
  * correlated-scalar-subquery shape probes Spark's decorrelation
  * (DataFrame subquery API: `Column.outer()` + `Dataset.scalar()`),
  * count(*)-over-empty-group corner included. A generator shape
  * (explode/posexplode × inner/outer over sequence / split /
  * emptyable arrays — the Generate/LATERAL plan surface) and
  * natural-null grouping keys round out the grammar.
  *
  * The grammar is constrained by the repo's cross-engine determinism
  * rules (BASELINE.md): every numeric aggregate is over integer cents
  * (`CAST(ROUND(x * 100) AS BIGINT)` — ROUND lands on an exact
  * integer double before the cast, so Spark's truncating cast and
  * DuckDB's rounding cast agree), outputs are only strings and
  * integers, and raw doubles/timestamps never reach the projection
  * (they may appear in predicates, where comparisons are exact).
  *
  * Seeded-repeatable: the default seed is fixed; set GRAFT_FUZZ_SEED
  * to explore a different corner (a failure report prints the seed,
  * the spec index, and the SQL).
  */
class PlanFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private case class Pred(cond: Column, sql: String)
  private case class GCol(name: String, col: Column, sql: String)
  private case class Agg(name: String, col: Column, sql: String)
  private case class SelCol(name: String, col: Column, sql: String)

  private sealed trait Shape
  /** mode: 0 = plain GROUP BY, 1 = ROLLUP, 2 = CUBE — the Expand
    * plan surface. ROLLUP/CUBE require ≥1 grouping column (Spark's
    * zero-column rollup degenerates to a plain agg); on the FJ base
    * the grouping columns themselves can be null (unmatched side),
    * so natural nulls and the rollup-generated subtotal nulls
    * coexist — both engines follow the same SQL-standard grouping
    * multiset, so the canonical row sets still match exactly.
    */
  private case class GroupAgg(gs: List[GCol], aggs: List[Agg],
      having: Option[Long], mode: Int = 0) extends Shape
  /** topk: ORDER BY the base's unique key LIMIT n — deterministic
    * because the sort key is total; NULLS FIRST is rendered
    * explicitly (Spark's ASC default) since DuckDB's ASC default is
    * NULLS LAST. Mutually exclusive with distinct.
    */
  private case class Select(cols: List[SelCol], distinct: Boolean,
      topk: Option[Int] = None) extends Shape
  /** Window functions over a low-cardinality partition, ordered by the
    * base's TOTAL key (plus NULLS FIRST rendered on both engines) so
    * row_number/rank/lag/running-sum are all deterministic. The frame
    * for the running sum is an explicit ROWS BETWEEN UNBOUNDED
    * PRECEDING AND CURRENT ROW — Spark's default with an ORDER BY is
    * RANGE, which coincides only because the key is total; rendering
    * ROWS on both sides removes the dependence on that coincidence.
    * fn: 0 = row_number, 1 = rank, 2 = lag(value), 3 = running sum.
    */
  private case class Win(part: GCol, fn: Int, value: SelCol) extends Shape
  /** Set operations between two branches of the same base: the spec's
    * predicates apply to both, each branch may add one extra predicate
    * so the sides genuinely differ. op: 0 = UNION, 1 = UNION ALL,
    * 2 = INTERSECT, 3 = INTERSECT ALL, 4 = EXCEPT, 5 = EXCEPT ALL —
    * the full multiset ladder the registry's R12 row covers, now
    * probed on UNREGISTERED plans too.
    */
  private case class SetOp(cols: List[SelCol], extra1: Option[Pred],
      extra2: Option[Pred], op: Int) extends Shape
  /** Correlated scalar subquery in the projection (base L only):
    * `(SELECT agg FROM orders WHERE o_orderkey = l_orderkey [AND
    * extra]) AS ssub` — rendered on the Spark side through the
    * DataFrame subquery API (`Column.outer()` + `Dataset.scalar()`),
    * so what's probed is Spark's own decorrelation rewrite, COUNT
    * bug included (count(*) over an empty correlated group is 0, the
    * other aggregates are NULL — both engines must agree row by row).
    */
  private case class ScalarSub(cols: List[SelCol], agg: Agg,
      extra: Option[Pred]) extends Shape
  /** Generator / LATERAL shape: explode an array expression derived
    * from the base's own columns — the UDTF plan surface (Generate
    * node) the registry covers only with fixed queries. All four
    * flavors: explode / posexplode × inner / outer. The DuckDB
    * rendering differs by flavor: inner = unnest in the SELECT list
    * (two same-length unnests ZIP, giving posexplode's 0-based
    * ordinal), outer = LEFT JOIN LATERAL so an empty array yields one
    * null-extended row, exactly Spark's `*_outer` semantics. The
    * array pool per base includes an emptyable CASE array — the
    * corner where inner and outer genuinely differ. Restricted to
    * bases whose columns are non-null (no LJ/FJ/NFJ): an array built
    * over a null input diverges between engines (Spark sequence
    * propagates null, DuckDB generate_series differs) and is not the
    * surface under test.
    */
  private case class Explode(cols: List[SelCol], arrIdx: Int,
      outer: Boolean, withPos: Boolean) extends Shape

  /** rightPred: only for the semi/anti bases ("SJ"/"AJ") — an extra
    * predicate on the EXISTS subquery's orders side, so the probed
    * semi-join right side genuinely varies.
    */
  private case class Spec(base: String, preds: List[Pred], shape: Shape,
      rightPred: Option[Pred] = None) {
    def sql: String = {
      val from = base match {
        case "L" | "SJ" | "AJ" => "lineitem"
        case "O"  => "orders"
        case "J"  => "lineitem JOIN orders ON l_orderkey = o_orderkey"
        case "LJ" => "orders LEFT JOIN lineitem ON o_orderkey = l_orderkey"
        // WHERE predicates over a FULL join are exactly the rewrite
        // territory being probed: a pred on either side lets the
        // optimizer degrade full→left/right/inner (Spark's
        // EliminateOuterJoin), and a wrong degrade changes the row set
        case "FJ" => "lineitem FULL JOIN orders ON l_orderkey = o_orderkey"
        // null-key-heavy joins: ~1/5 of lineitem keys become NULL in
        // the join condition itself. NULL = x is UNKNOWN, so those
        // rows silently drop from the inner join and come back
        // null-extended in the full one — the null-key surface the
        // fixed bases (never-null TPC-H keys) cannot reach
        case "NJ" => "lineitem JOIN orders ON o_orderkey = " + NullKeyExpr
        case "NFJ" => "lineitem FULL JOIN orders ON o_orderkey = " + NullKeyExpr
      }
      val rp = rightPred.map(" AND " + _.sql).getOrElse("")
      val existsClause = base match {
        case "SJ" => List(
          s"EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey$rp)")
        case "AJ" => List(
          s"NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey$rp)")
        case _ => Nil
      }
      val allPreds = preds.map(_.sql) ++ existsClause
      val where =
        if (allPreds.isEmpty) "" else " WHERE " + allPreds.mkString(" AND ")
      shape match {
        case GroupAgg(gs, aggs, hav, mode) =>
          val sel = (gs.map(g => s"${g.sql} AS ${g.name}") ++
            aggs.map(a => s"${a.sql} AS ${a.name}")).mkString(", ")
          val gexprs = gs.map(_.sql).mkString(", ")
          val grp = mode match {
            case _ if gs.isEmpty => ""
            case 1 => s" GROUP BY ROLLUP ($gexprs)"
            case 2 => s" GROUP BY CUBE ($gexprs)"
            case _ => s" GROUP BY $gexprs"
          }
          val having = hav.map(h => s" HAVING count(*) > $h").getOrElse("")
          s"SELECT $sel FROM $from$where$grp$having"
        case Select(cols, dist, topk) =>
          val d = if (dist) "DISTINCT " else ""
          val sel = cols.map(c => s"${c.sql} AS ${c.name}").mkString(", ")
          val tail = topk.map { n =>
            // the fixture's (l_orderkey, l_linenumber) is NOT unique
            // (TPC-H-ish, not TPC-H — seed 5150 found the boundary),
            // so ties beyond the key break by every OUTPUT expression:
            // rows still tied are output-identical, making the LIMIT
            // multiset deterministic even without a total base key
            val keys = (sortKeys(base) ++ cols.map(_.sql))
              .map(k => s"$k ASC NULLS FIRST")
            s" ORDER BY ${keys.mkString(", ")} LIMIT $n"
          }.getOrElse("")
          s"SELECT $d$sel FROM $from$where$tail"
        case Win(part, fn, value) =>
          // the base key is total only up to duplicate fixture rows
          // (the topk lesson, seed 5150): rows tied on the key can
          // differ in the VALUE column, which would make lag and the
          // running sum order-dependent — so the value itself is the
          // final tiebreak, making tied rows fully identical
          val keys = sortKeys(base) :+ value.sql
          val over = s"PARTITION BY ${part.sql} ORDER BY " +
            keys.map(k => s"$k ASC NULLS FIRST").mkString(", ")
          val fnSql = fn match {
            case 0 => s"row_number() OVER ($over)"
            case 1 => s"rank() OVER ($over)"
            case 2 => s"lag(${value.sql}) OVER ($over)"
            case _ => s"sum(${value.sql}) OVER ($over " +
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
          }
          val keySel = sortKeys(base).zipWithIndex
            .map { case (k, i) => s"$k AS k${i + 1}" }.mkString(", ")
          s"SELECT ${part.sql} AS g, $keySel, $fnSql AS w FROM $from$where"
        case ScalarSub(cols, agg, extra) =>
          val sel = cols.map(c => s"${c.sql} AS ${c.name}").mkString(", ")
          val inner = s"SELECT ${agg.sql} FROM orders " +
            "WHERE o_orderkey = l_orderkey" +
            extra.map(" AND " + _.sql).getOrElse("")
          s"SELECT $sel, ($inner) AS ssub FROM $from$where"
        case SetOp(cols, e1, e2, op) =>
          val sel = cols.map(c => s"${c.sql} AS ${c.name}").mkString(", ")
          def branch(extra: Option[Pred]) = {
            val ps = (preds ++ extra).map(_.sql) ++ existsClause
            val w = if (ps.isEmpty) ""
              else " WHERE " + ps.mkString(" AND ")
            s"SELECT $sel FROM $from$w"
          }
          val opSql = Vector("UNION", "UNION ALL", "INTERSECT",
            "INTERSECT ALL", "EXCEPT", "EXCEPT ALL")(op)
          s"${branch(e1)} $opSql ${branch(e2)}"
        case Explode(cols, ai, outer, withPos) =>
          val arr = arrPool(base)(ai)._2
          val sel = cols.map(c => s"${c.sql} AS ${c.name}").mkString(", ")
          val posSql = s"unnest(generate_series(0, len($arr) - 1)) AS pos"
          if (!outer) {
            val ex = (if (withPos) s"$posSql, " else "") +
              s"unnest($arr) AS ex"
            s"SELECT $sel, $ex FROM $from$where"
          } else {
            val lat = "(SELECT " + (if (withPos) s"$posSql, " else "") +
              s"unnest($arr) AS ex)"
            val outCols = (if (withPos) "u.pos, " else "") + "u.ex"
            s"SELECT $sel, $outCols FROM $from LEFT JOIN LATERAL $lat AS u ON true$where"
          }
      }
    }
  }

  // ---- pools ---------------------------------------------------------

  private def cents(c: String): Column = round(col(c) * 100).cast("long")
  private def centsSql(c: String): String = s"CAST(ROUND($c * 100) AS BIGINT)"

  /** The NJ/NFJ join key: every l_orderkey ≡ 2 (mod 5) becomes NULL
    * inside the join condition — selectivity stays equi-join (at most
    * one orders match per lineitem row), but a fifth of the left keys
    * exercise three-valued-logic matching.
    */
  private val NullKeyExpr =
    "CASE WHEN l_orderkey % 5 = 2 THEN NULL ELSE l_orderkey END"
  private val nullKeyCol: Column =
    when(expr("l_orderkey % 5") === 2, lit(null)).otherwise(col("l_orderkey"))

  /** Array expressions per base for the Explode shape (Spark column,
    * DuckDB SQL): a size-varying integer sequence, a string split,
    * and an emptyable CASE array (the inner-vs-outer corner). Only
    * over non-null inputs — see [[Explode]].
    */
  private def arrPool(base: String): List[(Column, String)] = base match {
    case "O" => List(
      (sequence(lit(1), expr("CAST(o_orderkey % 3 AS INT) + 1")),
        "generate_series(1, o_orderkey % 3 + 1)"),
      (split(col("o_orderpriority"), "-"),
        "string_split(o_orderpriority, '-')"),
      (when(col("o_totalprice") > 100000, sequence(lit(1), lit(3)))
        .otherwise(typedLit(Array.empty[Int])),
        "CASE WHEN o_totalprice > 100000 THEN generate_series(1, 3) ELSE [] END"))
    case _ => List(
      (sequence(lit(1), col("l_linenumber").cast("int")),
        "generate_series(1, l_linenumber)"),
      (split(concat_ws("-", col("l_returnflag"), col("l_linestatus")), "-"),
        "string_split(l_returnflag || '-' || l_linestatus, '-')"),
      (when(col("l_quantity") > 25, sequence(lit(1), lit(3)))
        .otherwise(typedLit(Array.empty[Int])),
        "CASE WHEN l_quantity > 25 THEN generate_series(1, 3) ELSE [] END"))
  }
  /** Bases whose referenced columns are never null (Explode
    * eligibility; LJ/FJ/NFJ can null out either side).
    */
  private val explodeBases = Set("L", "O", "J", "SJ", "AJ", "NJ")

  private val lPreds = List(
    Pred(col("l_quantity") <= 23, "l_quantity <= 23"),
    Pred(col("l_quantity") > 40, "l_quantity > 40"),
    Pred(col("l_returnflag") === "R", "l_returnflag = 'R'"),
    Pred(col("l_linestatus") === "F", "l_linestatus = 'F'"),
    Pred(expr("l_orderkey % 3") === 1, "l_orderkey % 3 = 1"),
    Pred(col("l_extendedprice") > 30000, "l_extendedprice > 30000"),
    Pred(col("l_discount") < 0.05, "l_discount < 0.05"),
    Pred(col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")),
      "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"))
  private val oPreds = List(
    Pred(col("o_orderstatus") === "O", "o_orderstatus = 'O'"),
    Pred(col("o_totalprice") > 100000, "o_totalprice > 100000"),
    Pred(expr("o_custkey % 5") === 2, "o_custkey % 5 = 2"),
    Pred(col("o_orderpriority") === "1-URGENT", "o_orderpriority = '1-URGENT'"))

  private val lGCols = List(
    GCol("rf", col("l_returnflag"), "l_returnflag"),
    GCol("ls", col("l_linestatus"), "l_linestatus"),
    GCol("lkmod", expr("l_orderkey % 3"), "l_orderkey % 3"),
    // a natural-null grouping/partition key on EVERY base (not just
    // the outer joins): NULL groups collate together in GROUP BY /
    // DISTINCT / window partitioning on both engines, and under
    // ROLLUP/CUBE the natural nulls coexist with subtotal nulls
    GCol("nrf",
      expr("CASE WHEN l_orderkey % 7 = 3 THEN NULL ELSE l_returnflag END"),
      "CASE WHEN l_orderkey % 7 = 3 THEN NULL ELSE l_returnflag END"))
  private val oGCols = List(
    GCol("os", col("o_orderstatus"), "o_orderstatus"),
    GCol("op", col("o_orderpriority"), "o_orderpriority"),
    GCol("ckmod", expr("o_custkey % 5"), "o_custkey % 5"),
    GCol("nos",
      expr("CASE WHEN o_orderkey % 7 = 3 THEN NULL ELSE o_orderstatus END"),
      "CASE WHEN o_orderkey % 7 = 3 THEN NULL ELSE o_orderstatus END"))

  private val cntAgg = Agg("cnt", count(lit(1)), "count(*)")
  private val lAggs = List(cntAgg,
    Agg("s_qty", sum(cents("l_quantity")), s"sum(${centsSql("l_quantity")})"),
    Agg("s_price", sum(cents("l_extendedprice")),
      s"sum(${centsSql("l_extendedprice")})"),
    Agg("mn_disc", min(cents("l_discount")), s"min(${centsSql("l_discount")})"),
    Agg("mx_qty", max(cents("l_quantity")), s"max(${centsSql("l_quantity")})"),
    Agg("cntd_rf", countDistinct(col("l_returnflag")),
      "count(DISTINCT l_returnflag)"))
  private val oAggs = List(cntAgg,
    Agg("s_total", sum(cents("o_totalprice")), s"sum(${centsSql("o_totalprice")})"),
    Agg("mx_total", max(cents("o_totalprice")), s"max(${centsSql("o_totalprice")})"),
    Agg("cntd_os", countDistinct(col("o_orderstatus")),
      "count(DISTINCT o_orderstatus)"))

  private def plain(c: String) = SelCol(c + "_c", col(c), c)
  private val lSel = List("l_orderkey", "l_linenumber", "l_returnflag",
    "l_linestatus").map(plain) ++ List(
    // computed projections: scalar string/date/case/int-arith surface
    SelCol("urf", upper(col("l_returnflag")), "upper(l_returnflag)"),
    SelCol("shipyr", expr("year(l_shipdate)").cast("long"),
      "CAST(year(l_shipdate) AS BIGINT)"),
    SelCol("qband",
      expr("CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END"),
      "CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END"),
    SelCol("klsum", expr("l_orderkey + l_linenumber"),
      "l_orderkey + l_linenumber"))
  private val oSel = List("o_orderkey", "o_custkey", "o_orderstatus",
    "o_orderpriority").map(plain) ++ List(
    SelCol("pri1", expr("substr(o_orderpriority, 1, 1)"),
      "substr(o_orderpriority, 1, 1)"),
    SelCol("lop", length(col("o_orderpriority")).cast("long"),
      "CAST(length(o_orderpriority) AS BIGINT)"),
    SelCol("ordyr", expr("year(o_orderdate)").cast("long"),
      "CAST(year(o_orderdate) AS BIGINT)"))

  private def predPool(base: String) = base match {
    case "L" | "SJ" | "AJ" => lPreds // semi/anti: only l-columns survive
    case "O" => oPreds
    case _   => lPreds ++ oPreds
  }
  private def gcolPool(base: String) = base match {
    case "L" | "SJ" | "AJ" => lGCols
    case "O" => oGCols
    case _   => lGCols ++ oGCols
  }
  private def aggPool(base: String) = base match {
    case "L" | "SJ" | "AJ" => lAggs
    case "O" => oAggs
    case _   => (lAggs ++ oAggs).distinctBy(_.name)
  }
  private def selPool(base: String) = base match {
    case "L" | "SJ" | "AJ" => lSel
    case "O" => oSel
    case _   => lSel ++ oSel
  }
  /** A TOTAL key per base — what makes ORDER BY + LIMIT deterministic.
    * On FJ both sides can be null (unmatched rows), but the triple is
    * still total up to fully-duplicate fixture rows, the same caveat
    * the L bases carry (and the same fix: output columns join the
    * sort key where order matters).
    */
  private def sortKeys(base: String): List[String] = base match {
    case "L" | "J" | "SJ" | "AJ" | "NJ" => List("l_orderkey", "l_linenumber")
    case "O"                  => List("o_orderkey")
    case "LJ" | "FJ" | "NFJ"  => List("o_orderkey", "l_orderkey", "l_linenumber")
  }
  /** Window value columns; index 0 is numeric (the only legal running-
    * sum operand), the second exercises lag over strings. On LJ the
    * l-side value is NULL for unmatched orders — lag of NULL is part
    * of the surface being probed.
    */
  private def winValPool(base: String): List[SelCol] = base match {
    case "O" => List(
      SelCol("v", cents("o_totalprice"), centsSql("o_totalprice")),
      SelCol("v", col("o_orderpriority"), "o_orderpriority"))
    case _ => List(
      SelCol("v", cents("l_extendedprice"), centsSql("l_extendedprice")),
      SelCol("v", col("l_returnflag"), "l_returnflag"))
  }

  // ---- generator -----------------------------------------------------

  private def genScalarSub: Gen[Shape] = for {
    ns <- Gen.choose(1, 3)
    cols <- Gen.pick(ns, lSel)
    // count(*) drawn with extra weight: it is the COUNT-bug corner
    // (0 on an empty correlated group where every other agg is NULL)
    agg <- Gen.frequency((1, Gen.const(cntAgg)), (1, Gen.oneOf(oAggs)))
    extra <- Gen.option(Gen.oneOf(oPreds))
  } yield ScalarSub(cols.toList, agg, extra)

  private def genShape(base: String): Gen[Shape] = {
    val core = List[Gen[Shape]](
    for {
      mode <- Gen.frequency((2, 0), (1, 1), (1, 2))
      ng <- if (mode == 0) Gen.choose(0, 2) else Gen.choose(1, 2)
      gs <- Gen.pick(ng, gcolPool(base))
      na <- Gen.choose(1, 3)
      aggs <- Gen.pick(na, aggPool(base))
      hav <- Gen.option(Gen.choose(1L, 5L))
    } yield {
      val as = aggs.toList.distinctBy(_.name)
      val withCnt =
        if (hav.isDefined && !as.exists(_.name == "cnt")) cntAgg :: as else as
      GroupAgg(gs.toList, withCnt, hav, mode)
    },
    for {
      ns <- Gen.choose(1, 4)
      cols <- Gen.pick(ns, selPool(base))
      kind <- Gen.choose(0, 2) // 0 = plain, 1 = distinct, 2 = top-k
      n <- Gen.choose(1, 50)
    } yield kind match {
      case 1 => Select(cols.toList, distinct = true)
      case 2 => Select(cols.toList, distinct = false, topk = Some(n))
      case _ => Select(cols.toList, distinct = false)
    },
    for {
      part <- Gen.oneOf(gcolPool(base))
      fn <- Gen.choose(0, 3)
      value <- if (fn == 3) Gen.const(winValPool(base).head)
        else Gen.oneOf(winValPool(base))
    } yield Win(part, fn, value),
    for {
      ns <- Gen.choose(1, 3)
      cols <- Gen.pick(ns, selPool(base))
      e1 <- Gen.option(Gen.oneOf(predPool(base)))
      e2 <- Gen.option(Gen.oneOf(predPool(base)))
      op <- Gen.choose(0, 5)
    } yield SetOp(cols.toList, e1, e2, op))
    val genExplode: Gen[Shape] = for {
      ns <- Gen.choose(1, 3)
      cols <- Gen.pick(ns, selPool(base))
      ai <- Gen.choose(0, 2)
      outer <- Gen.oneOf(true, false)
      wp <- Gen.oneOf(true, false)
    } yield Explode(cols.toList, ai, outer, wp)
    // the correlated subquery names both tables' columns, so it only
    // composes with the bare-lineitem base; weight 2 keeps it drawn
    // reliably despite the single eligible base
    val gens = core ++
      (if (explodeBases(base)) List(genExplode) else Nil) ++
      (if (base == "L") List(genScalarSub, genScalarSub) else Nil)
    Gen.choose(0, gens.length - 1).flatMap(gens)
  }

  private val genSpec: Gen[Spec] = for {
    base <- Gen.oneOf("L", "O", "J", "LJ", "FJ", "SJ", "AJ", "NJ", "NFJ")
    np <- Gen.choose(0, 2)
    preds <- Gen.pick(np, predPool(base))
    shape <- genShape(base)
    rp <- if (base == "SJ" || base == "AJ") Gen.option(Gen.oneOf(oPreds))
      else Gen.const(None)
  } yield Spec(base, preds.toList, shape, rp)

  // ---- execution -----------------------------------------------------

  private val fuzzDir = sys.env.getOrElse("GRAFT_FUZZ_SF", sfTiny)

  private def frame(spec: Spec): DataFrame = {
    val base = spec.base match {
      case "L" => Tables.lineitem(spark, fuzzDir)
      case "O" => Tables.orders(spark, fuzzDir)
      case "J" => Tables.lineitem(spark, fuzzDir)
        .join(Tables.orders(spark, fuzzDir), col("l_orderkey") === col("o_orderkey"))
      case "LJ" => Tables.orders(spark, fuzzDir)
        .join(Tables.lineitem(spark, fuzzDir),
          col("o_orderkey") === col("l_orderkey"), "left")
      case "FJ" => Tables.lineitem(spark, fuzzDir)
        .join(Tables.orders(spark, fuzzDir),
          col("l_orderkey") === col("o_orderkey"), "full")
      case semiOrAnti @ ("SJ" | "AJ") =>
        val right = spec.rightPred
          .foldLeft(Tables.orders(spark, fuzzDir))((d, p) => d.filter(p.cond))
        Tables.lineitem(spark, fuzzDir).join(right,
          col("l_orderkey") === col("o_orderkey"),
          if (semiOrAnti == "SJ") "left_semi" else "left_anti")
      case nullKey @ ("NJ" | "NFJ") =>
        Tables.lineitem(spark, fuzzDir).join(Tables.orders(spark, fuzzDir),
          col("o_orderkey") === nullKeyCol,
          if (nullKey == "NJ") "inner" else "full")
    }
    val filtered = spec.preds.foldLeft(base)((d, p) => d.filter(p.cond))
    spec.shape match {
      case GroupAgg(gs, aggs, hav, mode) =>
        val aggCols = aggs.map(a => a.col.as(a.name))
        val gcols = gs.map(g => g.col.as(g.name))
        val agged =
          if (gs.isEmpty) filtered.agg(aggCols.head, aggCols.tail: _*)
          else (mode match {
            case 1 => filtered.rollup(gcols: _*)
            case 2 => filtered.cube(gcols: _*)
            case _ => filtered.groupBy(gcols: _*)
          }).agg(aggCols.head, aggCols.tail: _*)
        hav.map(h => agged.filter(col("cnt") > h)).getOrElse(agged)
      case Select(cols, dist, topk) =>
        val ordered = topk match {
          case Some(n) => filtered
            .orderBy((sortKeys(spec.base).map(col) ++ cols.map(_.col))
              .map(_.asc_nulls_first): _*)
            .limit(n)
          case None => filtered
        }
        val s = ordered.select(cols.map(c => c.col.as(c.name)): _*)
        if (dist) s.distinct() else s
      case Win(part, fn, value) =>
        val keys = sortKeys(spec.base)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(part.col)
          .orderBy(keys.map(k => col(k).asc_nulls_first) :+
            value.col.asc_nulls_first: _*)
        val wcol = fn match {
          case 0 => row_number().over(w)
          case 1 => rank().over(w)
          case 2 => lag(value.col, 1).over(w)
          case _ => sum(value.col).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow))
        }
        filtered.select((part.col.as("g") +:
          keys.zipWithIndex.map { case (k, i) => col(k).as(s"k${i + 1}") }) :+
          wcol.as("w"): _*)
      case ScalarSub(cols, agg, extra) =>
        val corr = extra.foldLeft(
          col("o_orderkey") === col("l_orderkey").outer())((c, p) => c && p.cond)
        // select(aggFn), not .agg(...): the eager per-step analysis of
        // an Aggregate node rejects the still-lazy outer reference,
        // while the Project-with-aggregate form defers to the full
        // query's analysis (the form Spark's own subquery suite uses)
        val sub = Tables.orders(spark, fuzzDir).where(corr)
          .select(agg.col.as(agg.name))
        filtered.select(
          cols.map(c => c.col.as(c.name)) :+ sub.scalar().as("ssub"): _*)
      case Explode(cols, ai, outer, withPos) =>
        val arr = arrPool(spec.base)(ai)._1
        val gen = (outer, withPos) match {
          case (false, false) => explode(arr)
          case (false, true)  => posexplode(arr)
          case (true, false)  => explode_outer(arr)
          case (true, true)   => posexplode_outer(arr)
        }
        val genCol =
          if (withPos) gen.as(Seq("pos", "ex")) else gen.as("ex")
        filtered.select(cols.map(c => c.col.as(c.name)) :+ genCol: _*)
      case SetOp(cols, e1, e2, op) =>
        def branch(extra: Option[Pred]) =
          extra.fold(filtered)(p => filtered.filter(p.cond))
            .select(cols.map(c => c.col.as(c.name)): _*)
        val a = branch(e1)
        val b = branch(e2)
        op match {
          case 0 => a.union(b).distinct()
          case 1 => a.union(b)
          case 2 => a.intersect(b)
          case 3 => a.intersectAll(b)
          case 4 => a.except(b)
          case _ => a.exceptAll(b)
        }
    }
  }

  private def canonRows(df: DataFrame): Seq[String] =
    df.collect().map { r =>
      (0 until r.length).map { i =>
        if (r.isNullAt(i)) "\\N" else r.get(i).toString
      }.mkString("")
    }.sorted.toSeq

  test("150 generated plans match DuckDB row-for-row (seeded)") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L)
    // GRAFT_FUZZ_SF overrides the fixture dir (e.g. sf0.01) for
    // larger-scale fuzz sweeps; default stays the fast tiny fixture
    val n = 150
    val specs = Gen.listOfN(n, genSpec)
      .pureApply(Gen.Parameters.default, Seed(seed))
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzz")
    val sqlFile = dir.resolve("sqls.txt")
    val outFile = dir.resolve("duck.txt")
    java.nio.file.Files.write(sqlFile,
      specs.map(_.sql).mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // spark side first (also warms the session before timing anything)
    val sparkResults = specs.map(s => canonRows(frame(s)))
    val runner = new java.io.File("tools/fuzz_runner.py").getAbsolutePath
    val rc = new ProcessBuilder("python3", runner, fuzzDir,
      sqlFile.toString, outFile.toString).inheritIO().start().waitFor()
    assert(rc == 0, s"fuzz_runner.py exited $rc")
    // parse duckdb blocks
    val lines = scala.io.Source.fromFile(outFile.toFile, "UTF-8").getLines().toVector
    val blocks = scala.collection.mutable.Map[Int, Either[String, Vector[String]]]()
    var i = 0
    while (i < lines.length) {
      val h = lines(i)
      assert(h.startsWith("#Q"), s"bad runner output at line $i: $h")
      val parts = h.drop(2).split(" ", 3)
      val qi = parts(0).toInt
      if (parts(1) == "OK") {
        val nr = parts(2).toInt
        blocks(qi) = Right(lines.slice(i + 1, i + 1 + nr))
        i += 1 + nr
      } else {
        blocks(qi) = Left(parts.drop(2).mkString(" "))
        i += 1
      }
    }
    specs.zipWithIndex.foreach { case (spec, qi) =>
      blocks(qi) match {
        case Left(err) =>
          fail(s"seed=$seed Q$qi: DuckDB error [$err] for SQL: ${spec.sql}")
        case Right(duck) =>
          val sp = sparkResults(qi)
          assert(sp.size == duck.size,
            s"seed=$seed Q$qi: rows spark=${sp.size} duckdb=${duck.size} SQL: ${spec.sql}")
          sp.zip(duck).zipWithIndex.find { case ((a, b), _) => a != b }
            .foreach { case ((a, b), rn) =>
              fail(s"seed=$seed Q$qi row $rn: spark[$a] duckdb[$b] SQL: ${spec.sql}")
            }
      }
    }
    // coverage sanity: the batch should exercise every base and shape.
    // Pinned on the DEFAULT seed only — an override seed's job is to
    // explore a different differential corner, and whether its 150
    // draws happen to hit every enum value is luck, not a defect
    if (sys.env.get("GRAFT_FUZZ_SEED").isEmpty) {
    val bases = specs.map(_.base).toSet
    assert(bases == Set("L", "O", "J", "LJ", "FJ", "SJ", "AJ", "NJ", "NFJ"),
      s"bases drawn: $bases")
    // both semi/anti flavors must draw a right-side predicate at least once
    assert(specs.exists(s => s.base == "SJ" && s.rightPred.isDefined)
      && specs.exists(s => s.base == "AJ" && s.rightPred.isDefined),
      "no semi/anti spec drew a right-side predicate")
    assert(specs.exists(_.shape.isInstanceOf[GroupAgg]))
    assert(specs.exists(_.shape.isInstanceOf[Select]))
    assert(specs.exists(_.shape.isInstanceOf[Win]))
    assert(specs.exists(_.shape.isInstanceOf[SetOp]))
    assert(specs.exists(_.shape.isInstanceOf[ScalarSub]))
    // the COUNT-bug corner specifically: a count(*) correlated
    // subquery must be drawn (0 on empty group, where sum/max are NULL)
    assert(specs.exists(s => s.shape match {
      case ScalarSub(_, a, _) => a.name == "cnt"; case _ => false }))
    assert(specs.exists(s => s.shape match {
      case GroupAgg(_, _, h, _) => h.isDefined; case _ => false }))
    // every grouping mode over the batch (plain / ROLLUP / CUBE)
    val gModes = specs.collect {
      case Spec(_, _, GroupAgg(_, _, _, m), _) => m }.toSet
    assert(gModes == Set(0, 1, 2), s"grouping modes drawn: $gModes")
    // every window function and every set-op flavor over the batch
    val winFns = specs.collect { case Spec(_, _, Win(_, fn, _), _) => fn }.toSet
    assert(winFns == Set(0, 1, 2, 3), s"window fns drawn: $winFns")
    val setOps = specs.collect { case Spec(_, _, SetOp(_, _, _, op), _) => op }.toSet
    assert(setOps == Set(0, 1, 2, 3, 4, 5), s"set ops drawn: $setOps")
    // every explode flavor (explode/posexplode × inner/outer) and
    // every array kind (sequence / split / emptyable CASE)
    val exFlavors = specs.collect {
      case Spec(_, _, Explode(_, _, o, p), _) => (o, p) }.toSet
    assert(exFlavors ==
      Set((false, false), (false, true), (true, false), (true, true)),
      s"explode flavors drawn: $exFlavors")
    val exArrs = specs.collect {
      case Spec(_, _, Explode(_, ai, _, _), _) => ai }.toSet
    assert(exArrs == Set(0, 1, 2), s"explode array kinds drawn: $exArrs")
    // a null-partition window and a null-key grouping must be drawn
    assert(specs.exists(s => s.shape match {
      case Win(p, _, _) => p.name == "nrf" || p.name == "nos"
      case GroupAgg(gs, _, _, _) => gs.exists(g =>
        g.name == "nrf" || g.name == "nos")
      case _ => false
    }), "no spec drew a natural-null grouping/partition key")
    }
  }

  test("generated plans are shuffle-partition invariant (seeded)") {
    // the C2 determinism contract, extended from the fixed registry to
    // GENERATED plans: the same 25 random specs at 1 and 7 shuffle
    // partitions must produce identical row sets (Spark vs Spark — no
    // oracle needed, so this runs as a plain in-JVM property)
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L)
    val specs = Gen.listOfN(25, genSpec)
      .pureApply(Gen.Parameters.default, Seed(seed + 1))
    specs.zipWithIndex.foreach { case (spec, i) =>
      val at1 = withShufflePartitions(1)(canonRows(frame(spec)))
      val at7 = withShufflePartitions(7)(canonRows(frame(spec)))
      assert(at1 == at7,
        s"seed=$seed Q$i diverged across partition counts: ${spec.sql}")
    }
  }
}
