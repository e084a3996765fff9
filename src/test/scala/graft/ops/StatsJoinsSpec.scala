package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Round-5 additions: bucketized interval-overlap join, blocked fuzzy
  * join, exact-power-sum correlation matrix, categorical mutual
  * information. Each is checked differentially against a local
  * brute-force recompute (the oracle covers the DuckDB side; these
  * cover the rewrite-invisibility claims the oracle can't isolate —
  * e.g. that chunking never double-counts a pair).
  */
class StatsJoinsSpec extends AnyFunSuite {
  import TestSpark._

  private def intervals[K](rows: Array[(K, Long)]): Map[(K, Long), (Long, Long)] =
    rows.groupBy { case (k, us) => (k, math.floorDiv(us, 86400000000L)) }
      .map { case (key, g) => key -> (g.map(_._2).min, g.map(_._2).max) }

  test("interval join equals the brute-force overlap join (chunking is invisible)") {
    val e = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val user = intervals(e.map(x => (x._1, x._3)))
    val burst = intervals(e.map(x => (x._2, x._3)))
    val brute = (for {
      ((_, _), (us, ue)) <- user.toSeq
      ((typ, _), (bs, be)) <- burst.toSeq
      if us <= be && bs <= ue
    } yield (typ, math.min(ue, be) - math.max(us, bs)))
      .groupBy(_._1)
      .map { case (t, g) => (t, g.size.toLong, g.map(_._2).sum) }
      .toSet
    val got = Joins.joinInterval(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    // a user-day span (≤24 h) crosses up to 5 six-hour chunks — the
    // distinct must collapse them; equality above proves it, this pins
    // that multi-chunk pairs actually occur in the fixture (otherwise
    // the dedup path is untested)
    val multiChunk = user.values.count { case (s, t) =>
      s / 21600000000L != t / 21600000000L
    }
    assert(multiChunk > 0, "fixture has no interval spanning two chunks")
  }

  test("chunked interval join is exact on adversarial synthetic intervals") {
    // randomized + boundary-aligned intervals: starts/ends ON chunk
    // edges, zero-length intervals, touching endpoints (closed
    // semantics: touch = overlap), intervals spanning many chunks —
    // the cases a floor/sequence off-by-one would corrupt
    import spark.implicits._
    val W = 1000L
    val rnd = new scala.util.Random(7)
    def edgy(): Long = rnd.nextInt(6) match {
      case 0 => rnd.nextInt(10) * W            // exactly on a boundary
      case 1 => rnd.nextInt(10) * W - 1        // just below
      case 2 => rnd.nextInt(10) * W + 1        // just above
      case _ => rnd.nextInt(10000).toLong
    }
    val lefts = (1 to 60).map { i =>
      val s = edgy(); val len = if (i % 7 == 0) 0L else rnd.nextInt(3000).toLong
      (i.toLong, s, s + len)
    }
    val rights = (1 to 40).map { j =>
      val s = edgy(); val len = if (j % 5 == 0) 0L else rnd.nextInt(5000).toLong
      (j.toLong, s, s + len)
    }
    val got = Joins.intervalOverlapJoin(
        lefts.toDF("lid", "l_start", "l_end"),
        rights.toDF("rid", "r_start", "r_end"), W)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = for {
      (li, ls, le) <- lefts; (ri, rs, re) <- rights
      if ls <= re && rs <= le
    } yield (li, ri)
    assert(got.toSet == brute.toSet, "chunked join disagrees with brute force")
    assert(got.length == got.toSet.size, "multi-chunk pair emitted twice")
    assert(brute.nonEmpty)
  }

  test("interval join plans a hash equi join on chunk, not a nested loop") {
    val p = Joins.joinInterval(spark, sfSmall)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join planned a nested loop:\n${p.take(2000)}")
  }

  test("fuzzy join finds exactly the blocked lev<=3 pairs") {
    val names = Tables.part(spark, sfSmall).groupBy(col("p_name"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // independent rarest-token blocking reference (r11 geometry):
    // token df over the distinct-name dictionary, each name blocked
    // on its (df, token)-min token, pairs within equal blocks
    val df = names.keys.toSeq.flatMap(_.split(" ").distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size }
    def blk(n: String): String =
      n.split(" ").distinct.minBy(t => (df(t), t))
    val brute = (for {
      a <- names.keys; b <- names.keys
      if a < b && blk(a) == blk(b) && lev(a, b) <= 3
    } yield (a, b, lev(a, b).toLong, names(a), names(b))).toSet
    val got = Joins.joinFuzzy(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture yields no fuzzy pairs — threshold dead")
  }

  test("fuzzy join blocks: hash equi join, no nested loop over name pairs") {
    val p = Joins.joinFuzzy(spark, sfSmall)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join planned a nested loop:\n${p.take(2000)}")
  }

  test("corr matrix matches Spark's built-in corr to 1e-6 and stays in [-1,1]") {
    val got = Aggregates.corrMatrix(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ref = Tables.lineitem(spark, sfSmall).groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("qp"),
        corr(col("l_quantity"), col("l_discount")).as("qd"),
        corr(col("l_extendedprice"), col("l_discount")).as("pd"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (a, b, c)) =>
      val (ra, rb, rc) = ref(k)
      Seq(a -> ra, b -> rb, c -> rc).foreach { case (g, r) =>
        // g is rounded to 6 dp, so up to 5e-7 from the unrounded corr
        assert(math.abs(g - r) < 2e-6, s"flag $k: $g vs built-in $r")
        assert(g >= -1.0 && g <= 1.0, s"flag $k: corr $g out of range")
      }
    }
  }

  test("pareto cut keeps the MINIMAL 80% prefix per nation") {
    val rows = WindowOps.paretoCut(spark, sfSmall).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // recompute revenue per customer and check, per nation: the kept
    // set is exactly the ranked prefix whose previous cumulative is
    // below 80%, and one more row would cross it (minimality)
    val rev = Tables.orders(spark, sfSmall)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .join(Tables.customer(spark, sfSmall)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .collect().map(r => (r.getInt(3), r.getLong(2), r.getDecimal(1)))
    rev.groupBy(_._1).foreach { case (nation, g) =>
      val ranked = g.map(t => (t._2, BigDecimal(t._3)))
        .sortBy { case (ck, r) => (-r, ck) }
      val total = ranked.map(_._2).sum
      // exact-decimal membership rule, same as the engines:
      // keep iff 5·prev_cum < 4·total (strict)
      var cum = BigDecimal(0)
      val expect = ranked.takeWhile { case (_, r) =>
        val keep = cum * 5 < total * 4; cum += r; keep
      }.map(_._1).toSet
      val got = rows.filter(_._1 == nation).map(_._2).toSet
      assert(got == expect, s"nation $nation prefix mismatch")
      assert(got.size < g.size, s"nation $nation cut kept everyone")
    }
  }

  test("k-anonymity flags exactly the small equivalence classes") {
    val got = Aggregates.kAnonymity(spark, sfSmall).collect()
      .map(r => ((r.getInt(0), r.getString(1)), (r.getLong(2), r.getBoolean(3))))
      .toMap
    val local = Tables.customer(spark, sfSmall)
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    assert(got.keySet == local.keySet)
    got.foreach { case (k, (n, risky)) =>
      assert(n == local(k))
      assert(risky == (n < Aggregates.KAnonymity), s"$k flag wrong")
    }
  }

  test("hll intersection estimate lands well inside its audited bound") {
    val r = Aggregates.hllIntersection(spark, sfSmall).head()
    assert(r.getBoolean(1), "inclusion-exclusion estimate outside 15%")
    // exact matches a direct distinct-join recompute
    val o = Tables.orders(spark, sfSmall)
    val a = o.filter(col("o_totalprice") > 300000)
      .select(col("o_custkey")).distinct()
    val b = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct()
    assert(r.getLong(0) == a.join(b, Seq("o_custkey")).count())
  }

  test("mutual information equals the local recompute and is non-negative") {
    val joint = Tables.lineitem(spark, sfSmall)
      .groupBy(col("l_returnflag"), col("l_linestatus")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = joint.values.sum.toDouble
    val nx = joint.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val ny = joint.groupBy(_._1._2).map { case (k, g) => k -> g.values.sum }
    val miLocal = joint.map { case ((x, y), nxy) =>
      val t = (nxy / n) * (math.log((nxy * n.toLong) / (nx(x) * ny(y)).toDouble)
        / math.log(2))
      BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val rows = Aggregates.mutualInfo(spark, sfSmall).collect()
    assert(rows.length == joint.size)
    val mi = rows.map(_.getDouble(5)).distinct
    assert(mi.length == 1, "mi_bits differs across rows")
    // 6-dp term rounding can straddle on a libm ulp: allow one grain/cell
    assert(math.abs(mi.head - miLocal) < 2e-6, s"mi ${mi.head} vs local $miLocal")
    assert(mi.head >= 0.0, "mutual information cannot be negative")
    // per-cell pmi sanity: p_xy log-consistency with counts
    rows.foreach { r =>
      val nxy = r.getLong(2)
      val pmi = r.getDouble(4)
      val expect = math.log((nxy * n.toLong)
        / (nx(r.getString(0)) * ny(r.getString(1))).toDouble) / math.log(2)
      assert(math.abs(pmi - expect) < 1e-5, s"pmi $pmi vs $expect")
    }
  }

  test("entity resolution equals local union-find over the verified jaro pairs") {
    // joinFuzzyJaro's pair list is itself oracle-verified (same
    // threshold, same blocking); resolving it with a local union-find
    // must reproduce the distributed component resolution exactly
    val pairs = Joins.joinFuzzyJaro(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val names = Tables.part(spark, sfSmall)
      .groupBy(col("p_name")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val parent = scala.collection.mutable.Map(names.keys.map(n => n -> n).toSeq: _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val expected = names.keys.toSeq.groupBy(find).map { case (_, g) =>
      (g.min, g.size.toLong, g.map(names).sum)
    }.toSet
    val got = Joins.entityResolution(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // conservation + the fixture must exercise a transitive chain
    // (a component that is larger than any single pair)
    assert(got.toSeq.map(_._2).sum == names.size)
    assert(got.toSeq.map(_._3).sum == names.values.sum)
    assert(got.exists(_._2 >= 3), "no transitive chain in the fixture")
  }

  test("l-diversity flags exactly the homogeneous classes") {
    val rows = Tables.customer(spark, sfSmall)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (k, g) =>
      val bands = g.map(t => math.floor(t._2 / 1000).toLong).distinct.length
      (k._1, k._2, g.length.toLong, bands.toLong, bands < Aggregates.LDiversity)
    }.toSet
    val got = Aggregates.lDiversity(spark, sfSmall).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == expected)
  }

  test("equi-depth histogram: near-equal masses, disjoint ranges, local recompute") {
    val prices = Tables.orders(spark, sfSmall).select(col("o_totalprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = prices.length
    val bs = (1 until Aggregates.EquidepthBuckets).map { i =>
      val idx = (n - 1) * (i.toDouble / Aggregates.EquidepthBuckets)
      val lo = idx.floor.toInt
      val g = idx - lo
      if (lo + 1 < n) prices(lo) * (1 - g) + prices(lo + 1) * g else prices(lo)
    }
    val expected = prices.groupBy(p => bs.count(p > _).toLong)
      .map { case (b, g) => (b, g.length.toLong, g.min, g.max) }.toSet
    val got = Aggregates.histogramEquidepth(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == expected)
    assert(got.size == Aggregates.EquidepthBuckets)
    // equi-depth contract: masses within 2× of each other at this
    // near-continuous fixture, and bucket value ranges are disjoint
    val masses = got.toSeq.map(_._2)
    assert(masses.max <= 2 * masses.min, s"unbalanced buckets: $masses")
    val ordered = got.toSeq.sortBy(_._1)
    ordered.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._3, "bucket ranges overlap")
      case _ =>
    }
  }
}
