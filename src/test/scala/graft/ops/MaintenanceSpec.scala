package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Warehouse-lifecycle operators: snapshot diff, compaction planning,
  * zone-map skipping, k-fold assignment. Each is checked against a
  * local recompute from the collected fixture (the oracle covers the
  * DuckDB side; these pin the semantic claims the hash compare can't
  * isolate — e.g. that a `skipped` file truly contains no qualifying
  * rows, or that compaction groups are contiguous runs).
  */
class MaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private def md5Fold(sv: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("snapshot diff recovers exactly the carved-out changeset") {
    val keys = Tables.orders(spark, sfTiny).select(col("o_orderkey"))
      .collect().map(_.getLong(0)).toSet
    val expected =
      keys.filter(_ % 10 == 7).map(k => (k, "added")) ++
      keys.filter(_ % 10 == 3).map(k => (k, "removed")) ++
      keys.filter(_ % 10 == 5).map(k => (k, "changed"))
    val got = Maintenance.snapshotDiff(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected)
  }

  test("compaction plan equals the local cumulative-sum packing") {
    val dayUs = 86400000000L
    val frags = Tables.events(spark, sfTiny)
      .select(unix_micros(col("ts")), col("event_id"), length(col("props")))
      .collect()
      .map(r => ((math.floor(r.getLong(0) / dayUs.toDouble).toLong,
        math.floorMod(md5Fold(r.getLong(1).toString),
          Maintenance.CompactionFragments.toLong)),
        r.getInt(2) + 32L))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val expected = frags.groupBy(_._1._1).flatMap { case (day, files) =>
      var cum = 0L
      files.toSeq.sortBy(_._1._2).map { case ((_, fid), bytes) =>
        cum += bytes
        (day, fid, bytes,
          math.floor((cum - 1) / Maintenance.CompactionTargetBytes.toDouble).toLong)
      }
    }.toSet
    val got = Maintenance.compactionPlan(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // packing must actually produce multi-group days (otherwise the
    // cumulative rule is untested) and groups are contiguous in
    // file_id: group ids never decrease as file_id increases
    val byDay = got.groupBy(_._1)
    assert(byDay.values.exists(_.map(_._4).size > 1))
    byDay.values.foreach { fs =>
      val ordered = fs.toSeq.sortBy(_._2).map(_._4)
      assert(ordered == ordered.sorted, "groups not contiguous in file_id")
    }
  }

  test("packing rule is exact on adversarial boundary-aligned manifests") {
    // sizes engineered so running totals land ON, just under, and just
    // over group boundaries (target = 100), plus an oversized fragment
    // spanning multiple groups — the cases an off-by-one in the −1
    // would corrupt. Expected semantics: a fragment belongs to the
    // group its cumulative total ends in; a total of exactly k·target
    // stays in group k−1.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sizes = Seq(50L, 50L, /* cum 100 → grp 0 (exact boundary) */
      1L,                     /* cum 101 → grp 1 */
      98L,                    /* cum 199 → grp 1 */
      1L,                     /* cum 200 → grp 1 (exact boundary) */
      350L,                   /* cum 550 → grp 5 (oversized spans)  */
      49L,                    /* cum 599 → grp 5 */
      1L)                     /* cum 600 → grp 5 (exact boundary) */
    val df = sizes.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("file_id", "f_bytes")
    val cum = sum(col("f_bytes")).over(Window.orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val got = df.select(col("file_id"), Maintenance.packingGroup(cum, 100L).as("grp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L)
    assert(got == expected)
  }

  test("boundary binning puts exact-boundary values in the lower bucket") {
    import spark.implicits._
    val bs = Seq(10.0, 20.0)
    val got = Seq(5.0, 10.0, 10.000001, 20.0, 25.0).toDF("v")
      .select(col("v"), Aggregates.bucketByBoundaries(col("v"), bs)
        .cast("long").as("b"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    // strict > rule: a value equal to a boundary does NOT pass it —
    // the convention both histogram_equidepth and psi_drift (and
    // their oracles' CASE chains) must share
    assert(got == Map(5.0 -> 0L, 10.0 -> 0L, 10.000001 -> 1L,
      20.0 -> 1L, 25.0 -> 2L))
  }

  test("zone-map skipped files contain zero qualifying rows") {
    val rows = Tables.lineitem(spark, sfTiny)
      .select(date_format(col("l_shipdate"), "yyyy-MM-dd"))
      .collect().map(_.getString(0))
    val report = Maintenance.zoneMapPrune(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4)))
    def fid(day: String) = day.take(4).toLong * 12 + day.slice(5, 7).toLong - 1
    val byFile = rows.groupBy(fid)
    assert(report.map(_._1).toSet == byFile.keySet)
    var partialKept = false
    report.foreach { case (f, n, minD, maxD, skipped) =>
      val inFile = byFile(f)
      assert(n == inFile.length)
      assert(minD == inFile.min && maxD == inFile.max)
      val qualifying =
        inFile.count(d => d >= Maintenance.ZoneLo && d <= Maintenance.ZoneHi)
      if (skipped) assert(qualifying == 0, s"file $f skipped but has matches")
      assert(skipped == (maxD < Maintenance.ZoneLo || minD > Maintenance.ZoneHi))
      if (!skipped && qualifying > 0 && qualifying < inFile.length)
        partialKept = true
    }
    // all three regimes must occur, or the flag logic is untested:
    // skipped, kept, and kept-with-partial-match (the conservative
    // case — min/max pruning keeps files it can't fully qualify)
    assert(report.exists(_._5) && report.exists(!_._5))
    assert(partialKept, "no kept file straddles the predicate boundary")
  }

  test("psi drift matches a local recompute and flags the planted upper-tail drift") {
    val keys = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ref = keys.collect { case (k, v) if k % 10 != 7 => v }
    val cur = keys.collect { case (k, v) if k % 10 != 3 =>
      if (k % 10 == 5) v * 2 else v }
    val sorted = ref.sorted
    val n = sorted.length
    val bs = (1 until Maintenance.PsiBuckets).map { i =>
      val idx = (n - 1) * (i.toDouble / Maintenance.PsiBuckets)
      val lo = idx.floor.toInt
      val g = idx - lo
      if (lo + 1 < n) sorted(lo) * (1 - g) + sorted(lo + 1) * g else sorted(lo)
    }
    def bucket(v: Double) = bs.count(v > _).toLong
    val nRef = ref.groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val nCur = cur.groupBy(bucket).view.mapValues(_.length.toLong).toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (nRef.keySet ++ nCur.keySet).map { b =>
      val pr = math.max(nRef.getOrElse(b, 0L).toDouble / ref.length, 1e-6)
      val pc = math.max(nCur.getOrElse(b, 0L).toDouble / cur.length, 1e-6)
      (b, nRef.getOrElse(b, 0L), nCur.getOrElse(b, 0L), round6(pr), round6(pc),
        round6((pc - pr) * math.log(pc / pr)))
    }
    val got = Maintenance.psiDrift(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got == expected)
    // doubled ≡5-key prices pile into the top reference decile: its
    // PSI term must be positive and the total index clearly nonzero
    // (≈0.02 at sf0.001 — visible drift, below the 0.1 retrain alarm)
    val top = got.maxBy(_._1)
    assert(top._6 > 0, "top decile psi term not positive")
    assert(got.toSeq.map(_._6).sum > 0.01, "total PSI misses the planted drift")
  }

  test("fk repair remaps exactly the planted orphans to the sentinel") {
    val custkeys = Tables.customer(spark, sfTiny).select(col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val surviving = custkeys.filter(_ % 50 != 3)
    val expected = orders.map { case (ok, ck) =>
      if (surviving(ck)) (ok, ck, false) else (ok, -1L, true)
    }.toSet
    val got = Maintenance.fkRepair(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected)
    assert(got.size == orders.length, "repair changed the row count")
    assert(got.exists(_._3) && got.exists(!_._3),
      "fixture must contain both orphaned and intact rows")
  }

  test("k-fold assignment is a deterministic partition of the corpus") {
    val out = Maintenance.kfoldAssign(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.documents(spark, sfSmall).count()
    assert(out.map(_._2).sum == total, "folds must partition all docs")
    assert(out.forall(f => f._1 >= 0 && f._1 < Maintenance.KFolds))
    assert(out.length == Maintenance.KFolds, "every fold populated at sf0.01")
    val again = Maintenance.kfoldAssign(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == again.toSet, "assignment must be content-stable")
  }
}
