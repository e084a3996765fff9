package graft.sources

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The transactional log table (TxLog.scala): commit atomicity,
  * snapshot isolation, time travel, optimistic concurrency,
  * copy-on-write file skipping, compaction, vacuum retention, and
  * checkpointed snapshot resolution. The registry entries
  * (`txlog_time_travel`, `txlog_head`) put the multi-version fixture
  * under the DuckDB gate; this suite covers the transactional
  * machinery the gate can't see.
  */
class TxLogSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-txlog-$tag").toString + "/t"

  private def ids(t: String, asOf: Option[Long] = None): Set[Long] =
    TxLog.read(spark, t, asOf).select($"id").as[Long].collect().toSet

  test("versions accumulate; time travel sees each commit's exact content") {
    val t = tmpTable("tt")
    TxLog.create(spark, t, spark.range(0, 10).toDF())
    TxLog.append(spark, t, spark.range(10, 20).toDF())
    TxLog.overwrite(spark, t, spark.range(100, 105).toDF())
    assert(TxLog.currentVersion(spark, t) === 2L)
    assert(ids(t, Some(0L)) === (0L until 10L).toSet)
    assert(ids(t, Some(1L)) === (0L until 20L).toSet)
    assert(ids(t, Some(2L)) === (100L until 105L).toSet)
    assert(ids(t) === (100L until 105L).toSet)
    val hist = TxLog.history(spark, t).orderBy($"version")
      .select($"action").as[String].collect().toSeq
    assert(hist === Seq("create", "append", "overwrite"))
    val err = intercept[IllegalArgumentException] { TxLog.read(spark, t, Some(7L)) }
    assert(err.getMessage.contains("does not exist"))
  }

  test("concurrent appends all land (optimistic create-if-absent, no lost update)") {
    val t = tmpTable("race")
    TxLog.create(spark, t, spark.range(0, 1).toDF())
    val futures = (1 to 8).map { k =>
      Future { TxLog.append(spark, t, spark.range(k * 100L, k * 100L + 10).toDF()) }
    }
    val versions = Await.result(Future.sequence(futures), 120.seconds)
    assert(versions.toSet === (1L to 8L).toSet, "each append got a distinct version")
    assert(TxLog.read(spark, t).count() === 81L)
  }

  test("stale-base writers conflict instead of losing updates") {
    val t = tmpTable("conflict")
    TxLog.create(spark, t, spark.range(0, 10).toDF())
    // simulate: writer resolves base=0, a racer commits, writer publishes
    val racerV = TxLog.append(spark, t, spark.range(50, 60).toDF())
    assert(racerV === 1L)
    // deleteWhere/overwrite/compact re-resolve at entry; emulate the
    // stale window by racing two deletes through futures repeatedly —
    // at least the semantics must hold: a delete based on version 0
    // must not erase the racer's rows. Direct check: delete after the
    // racer sees BOTH files (base re-resolved), so nothing is lost.
    TxLog.deleteWhere(spark, t, $"id" < 5)
    assert(ids(t) === ((5L until 10L) ++ (50L until 60L)).toSet)
  }

  test("copy-on-write delete rewrites ONLY files containing matches") {
    val t = tmpTable("cow")
    TxLog.create(spark, t, spark.range(0, 100).toDF().coalesce(1))
    TxLog.append(spark, t, spark.range(100, 200).toDF().coalesce(1))
    val before = TxLog.snapshotState(spark, t)
    assert(before.files.size === 2)
    val cleanFile = {
      // the file holding ids 100-199 must survive the delete untouched
      val perFile = TxLog.read(spark, t)
        .groupBy(input_file_name().as("f")).agg(min($"id").as("lo"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      new org.apache.hadoop.fs.Path(
        new java.net.URI(perFile.find(_._2 == 100L).get._1)).getName
    }
    TxLog.deleteWhere(spark, t, $"id" < 50)
    val after = TxLog.snapshotState(spark, t)
    assert(after.files.map(_.path).contains(cleanFile),
      "clean file was rewritten — copy-on-write did not skip it")
    assert(!ids(t).exists(_ < 50) && ids(t).size === 150)
    // a delete matching nothing is a no-op commit-wise
    val v = TxLog.currentVersion(spark, t)
    assert(TxLog.deleteWhere(spark, t, $"id" > 10000) === v)
  }

  test("compaction bin-packs without changing content; old versions still read") {
    val t = tmpTable("compact")
    TxLog.create(spark, t, spark.range(0, 50).toDF().repartition(5))
    TxLog.append(spark, t, spark.range(50, 100).toDF().repartition(5))
    val preFiles = TxLog.snapshotState(spark, t).files.size
    assert(preFiles === 10)
    val v = TxLog.compact(spark, t, 1L << 30)
    assert(TxLog.snapshotState(spark, t).files.size === 1)
    assert(ids(t) === (0L until 100L).toSet)
    assert(ids(t, Some(v - 1)) === (0L until 100L).toSet, "pre-compact snapshot intact")
  }

  test("vacuum enforces the retention floor and removes unreachable + orphan files") {
    val t = tmpTable("vacuum")
    TxLog.create(spark, t, spark.range(0, 10).toDF().coalesce(1))     // v0
    TxLog.overwrite(spark, t, spark.range(10, 20).toDF().coalesce(1)) // v1
    TxLog.overwrite(spark, t, spark.range(20, 30).toDF().coalesce(1)) // v2
    // plant an orphan (a crashed commit's moved-but-unpublished file)
    val orphan = new java.io.File(t, "data-orphan-test.parquet")
    spark.range(0, 5).toDF().coalesce(1).write.parquet(orphan.toString + ".tmpdir")
    val part = new java.io.File(orphan.toString + ".tmpdir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, orphan.toPath)
    assert(ids(t) === (20L until 30L).toSet, "orphan is invisible to readers")

    TxLog.vacuum(spark, t, keepVersions = 1, minAgeMs = 0L) // retain only v2 (head)
    assert(!orphan.exists, "orphan not removed by vacuum")
    val dataFiles = new java.io.File(t).listFiles()
      .count(f => f.getName.startsWith("data-") && f.getName.endsWith(".parquet"))
    assert(dataFiles === 1, s"unreachable files survived vacuum: $dataFiles")
    assert(ids(t) === (20L until 30L).toSet)
    val err = intercept[IllegalStateException] { TxLog.read(spark, t, Some(0L)) }
    assert(err.getMessage.contains("vacuumed"))
    assert(err.getMessage.contains("floor"))
    // a later vacuum with a LARGER retention must clamp to the
    // published floor, not crash resolving pre-floor versions
    TxLog.append(spark, t, spark.range(30, 35).toDF().coalesce(1))
    TxLog.vacuum(spark, t, keepVersions = 50, minAgeMs = 0L)
    assert(ids(t) === (20L until 35L).toSet)
  }

  test("floor-check-then-read race: a pre-vacuum reader fails loudly, never partially") {
    // the one interleaving the floor check cannot cover: the reader
    // resolves its snapshot (floor check passes, file list fixed),
    // THEN vacuum raises the floor and deletes those files, THEN the
    // reader scans. The scan must ERROR (missing input is a task
    // failure), not silently return the subset of files that survived
    val t = tmpTable("vacrace")
    TxLog.create(spark, t, spark.range(0, 100).toDF().repartition(4))  // v0
    TxLog.overwrite(spark, t, spark.range(100, 200).toDF().repartition(4)) // v1
    val preResolved = TxLog.read(spark, t, Some(0L)) // snapshot fixed at v0's files
    TxLog.vacuum(spark, t, keepVersions = 1, minAgeMs = 0L) // v0's files deleted
    val err = intercept[Exception] { preResolved.count() }
    def chain(e: Throwable): Seq[Throwable] =
      if (e == null) Seq.empty else e +: chain(e.getCause)
    assert(chain(err).exists(c =>
        c.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(c.getMessage).contains("does not exist") ||
        String.valueOf(c.getMessage).contains("FileNotFound")),
      s"expected a missing-file failure, got: $err")
    // a reader arriving AFTER the floor commit is refused up front
    // (vacuum publishes the floor BEFORE deleting — the ordering that
    // closes the other half of the window)
    val refused = intercept[IllegalStateException] { TxLog.read(spark, t, Some(0L)) }
    assert(refused.getMessage.contains("vacuumed"))
  }

  test("vacuum age guard: fresh unreferenced files are presumed in-flight") {
    val t = tmpTable("vacage")
    TxLog.create(spark, t, spark.range(0, 10).toDF().coalesce(1))
    TxLog.overwrite(spark, t, spark.range(10, 20).toDF().coalesce(1))
    val dataFiles = () => new java.io.File(t).listFiles()
      .count(f => f.getName.startsWith("data-") && f.getName.endsWith(".parquet"))
    val before = dataFiles()
    // default minAge: just-written unreferenced files could belong to
    // an in-flight commit (data moves in before the log publishes)
    TxLog.vacuum(spark, t, keepVersions = 1)
    assert(dataFiles() === before, "age guard did not protect fresh files")
    TxLog.vacuum(spark, t, keepVersions = 1, minAgeMs = 0L)
    assert(dataFiles() < before, "explicit zero-age vacuum should reclaim")
  }

  test("deleteWhere keeps rows where the predicate is NULL") {
    val t = tmpTable("delnull")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, java.lang.Double.valueOf(5.0)),
        org.apache.spark.sql.Row(2L, null),
        org.apache.spark.sql.Row(3L, java.lang.Double.valueOf(7.0))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType, true))))
    TxLog.create(spark, t, df)
    TxLog.deleteWhere(spark, t, $"x" === 5.0)
    // NOT(NULL)=NULL must not silently drop the x=NULL row from the
    // rewritten file
    assert(TxLog.read(spark, t).select($"id").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("stats corners: Infinity poisons the column; non-BMP strings compare in UTF-8 order") {
    val t = tmpTable("statcorner")
    TxLog.create(spark, t, spark.range(0, 10)
      .select($"id", when($"id" === 0, Double.PositiveInfinity)
        .otherwise($"id".cast("double")).as("v")).coalesce(1))
    // v has Infinity in its range: the column must carry no stats and
    // every numeric bound on it must fail open (correct rows anyway)
    assert(TxLog.readWhere(spark, t, $"v" > 3.0).count() === 7L) // ids 4..9 + Inf
    val supp = new String(Character.toChars(0x10000)) // U+10000, surrogate pair
    val t2 = tmpTable("statutf8")
    TxLog.create(spark, t2, spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("￿"), org.apache.spark.sql.Row(supp)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType, false)))))
    // parquet's max is U+10000 in UTF-8 byte order; UTF-16 compareTo
    // would call max < "￿" and wrongly exclude the file
    assert(TxLog.readWhere(spark, t2, $"s" === "￿").count() === 1L)
    // IN-list corners: a NaN literal must fail open (never throw),
    // and the string envelope must be picked in UTF-8 order too
    // (UTF-16 min/max of {U+FFFF, U+1F600} is inverted and would
    // exclude this file)
    assert(TxLog.readWhere(spark, t, $"v".isin(Double.NaN, 4.0)).count() === 1L)
    assert(TxLog.readWhere(spark, t2, $"s".isin("￿", "😀")).count() === 1L)
  }

  test("checkpointed resolution: long histories read from the checkpoint, not v0") {
    val t = tmpTable("ckpt")
    TxLog.create(spark, t, spark.range(0, 1).toDF())
    (1 to 12).foreach { k =>
      TxLog.append(spark, t, spark.range(k * 10L, k * 10L + 1).toDF())
    }
    val ckpt = new java.io.File(s"$t/_txlog")
      .listFiles().map(_.getName).filter(_.startsWith("checkpoint-"))
    assert(ckpt.nonEmpty, "no checkpoint written by version 12")
    assert(TxLog.read(spark, t).count() === 13L)
    assert(ids(t, Some(5L)) === (0 to 5).map(_ * 10L).toSet)
    // a checkpoint must carry the schema so replay-from-checkpoint
    // never needs the create entry
    assert(TxLog.snapshotState(spark, t).schemaDdl.toLowerCase.contains("id"))
  }

  test("footer stats are logged; predicate pruning skips disjoint-range files") {
    val t = tmpTable("skip")
    TxLog.create(spark, t, spark.range(0, 1000).toDF()
      .repartitionByRange(8, $"id"))
    val snap = TxLog.snapshotState(spark, t)
    assert(snap.files.size === 8)
    assert(snap.files.forall(_.stats.exists(_.contains("id"))),
      "footer min/max missing from the log's add entries")
    val (sel, total) = TxLog.pruneFiles(spark, t, $"id" < 100)
    assert(total === 8 && sel.size <= 2,
      s"range predicate should touch <=2 of 8 files, selected ${sel.size}")
    assert(TxLog.readWhere(spark, t, $"id" < 100).count() === 100L)
    val (selEq, _) = TxLog.pruneFiles(spark, t, $"id" === 999)
    assert(selEq.size === 1)
    val (selBand, _) = TxLog.pruneFiles(spark, t, $"id" >= 400 && $"id" < 525)
    assert(selBand.size <= 3 && selBand.nonEmpty)
    assert(TxLog.readWhere(spark, t, $"id" >= 400 && $"id" < 525).count() === 125L)
    // IN-lists prune by the literals' envelope
    val (selIn, _) = TxLog.pruneFiles(spark, t, $"id".isin(10, 40, 95))
    assert(selIn.size <= 2, s"isin envelope selected ${selIn.size} of 8")
    assert(TxLog.readWhere(spark, t, $"id".isin(10, 40, 95)).count() === 3L)
    // a predicate the matcher can't bound selects ALL files — stats
    // are an optimization, never a correctness input
    val (selAll, _) = TxLog.pruneFiles(spark, t, pmod($"id", lit(10)) === 3)
    assert(selAll.size === 8)
    assert(TxLog.readWhere(spark, t, pmod($"id", lit(10)) === 3).count() === 100L)
  }

  test("null-count pruning: isNull, isNotNull, and all-null columns") {
    val t = tmpTable("nulls")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType, true)))
    def rows(data: Seq[(Long, java.lang.Double)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (i, x) =>
        org.apache.spark.sql.Row(i, x) }, 1), schema)
    TxLog.create(spark, t, rows(Seq((1L, 1.0), (2L, 2.0))))          // x never null
    TxLog.append(spark, t, rows(Seq((3L, null), (4L, null))))        // x always null
    TxLog.append(spark, t, rows(Seq((5L, 5.0), (6L, null))))         // mixed
    val (selNull, total) = TxLog.pruneFiles(spark, t, $"x".isNull)
    assert(total === 3 && selNull.size === 2, "no-null file not excluded for isNull")
    val (selNotNull, _) = TxLog.pruneFiles(spark, t, $"x".isNotNull)
    assert(selNotNull.size === 2, "all-null file not excluded for isNotNull")
    val (selCmp, _) = TxLog.pruneFiles(spark, t, $"x" > 1.5)
    assert(selCmp.size === 2, "all-null file not excluded for a comparison")
    assert(TxLog.readWhere(spark, t, $"x".isNull).select($"id")
      .as[Long].collect().toSet === Set(3L, 4L, 6L))
    assert(TxLog.readWhere(spark, t, $"x".isNotNull).count() === 3L)
    assert(TxLog.readWhere(spark, t, $"x" > 1.5).count() === 2L)
  }

  test("string-column stats prune; stats survive checkpointed resolution") {
    val t = tmpTable("skipstr")
    TxLog.create(spark, t, spark.range(0, 260)
      .select(format_string("k%03d", $"id").as("s"), $"id")
      .repartitionByRange(4, $"s"))
    val (sel, total) = TxLog.pruneFiles(spark, t, $"s" < "k050")
    assert(total === 4 && sel.size === 1, s"selected ${sel.size} of $total")
    assert(TxLog.readWhere(spark, t, $"s" < "k050").count() === 50L)
    assert(TxLog.pruneFiles(spark, t, $"s" === "k200")._1.size === 1)
    // drive past a checkpoint: resolution must carry stats through it
    // (appended keys sort ABOVE "k050", so the selected set must not grow)
    (1 to 10).foreach { k =>
      TxLog.append(spark, t, spark.range(1000L + k, 1001L + k)
        .select(format_string("z%03d", $"id").as("s"), $"id"))
    }
    val (sel2, total2) = TxLog.pruneFiles(spark, t, $"s" < "k050")
    assert(total2 > 4 && sel2.size === 1,
      s"post-checkpoint pruning broke: ${sel2.size} of $total2")
    assert(TxLog.readWhere(spark, t, $"s" < "k050").count() === 50L)
  }

  test("merge upserts: only matching files rewritten, inserts appended, dupes refused") {
    val t = tmpTable("merge")
    TxLog.create(spark, t, spark.range(0, 400)
      .select($"id", ($"id" % 7).cast("double").as("v"))
      .repartitionByRange(4, $"id"))
    val before = TxLog.snapshotState(spark, t).files.map(_.path).toSet
    assert(before.size === 4)
    // updates confined to ids 0..49 (inside one file's range) plus
    // inserts far above every file's range
    val src = spark.range(0, 50).select($"id", lit(99.0).as("v"))
      .unionByName(spark.range(1000, 1005).select($"id", lit(-1.0).as("v")))
    TxLog.merge(spark, t, src, Seq("id"))
    val after = TxLog.snapshotState(spark, t).files.map(_.path).toSet
    assert((before -- after).size === 1,
      s"expected exactly 1 dirty file, rewrote ${(before -- after).size}")
    val out = TxLog.read(spark, t)
    assert(out.count() === 405L)
    assert(out.filter($"id" < 50 && $"v" === 99.0).count() === 50L)
    assert(out.filter($"id" >= 1000).count() === 5L)
    assert(out.filter($"id" >= 50 && $"id" < 400 && $"v" === 99.0).count() === 0L)
    val dup = intercept[IllegalArgumentException] {
      TxLog.merge(spark, t,
        spark.range(0, 2).select(lit(7L).as("id"), lit(0.0).as("v")), Seq("id"))
    }
    assert(dup.getMessage.contains("not unique"))
  }

  test("derived change feed: inserts and deletes tagged, pure rewrites silent") {
    val t = tmpTable("cdc")
    TxLog.create(spark, t, spark.range(0, 100).toDF())        // v0
    TxLog.append(spark, t, spark.range(100, 150).toDF())      // v1
    TxLog.deleteWhere(spark, t, $"id" < 10)                   // v2
    TxLog.compact(spark, t, 1L << 30)                         // v3 (pure rewrite)
    val ch = TxLog.changes(spark, t, 0L, 3L)
      .select($"id", $"change_type").as[(Long, String)].collect().toSet
    assert(ch === ((100L until 150L).map((_, "insert")) ++
      (0L until 10L).map((_, "delete"))).toSet)
    // compaction alone produces zero changes
    assert(TxLog.changes(spark, t, 2L, 3L).count() === 0L)
    // and the feed respects duplicates (multiset semantics)
    TxLog.append(spark, t, spark.range(20, 22).toDF())        // v4: ids 20,21 again
    val dup = TxLog.changes(spark, t, 3L, 4L)
      .select($"id", $"change_type").as[(Long, String)].collect().toSeq
    assert(dup.sorted === Seq((20L, "insert"), (21L, "insert")))
  }

  test("z-order cluster: both columns prune after the rewrite; content identical") {
    val t = tmpTable("zcluster")
    // a 64x64 grid: x and y independent, so any single-column sort
    // leaves the other column unprunable
    val grid = spark.range(0, 4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).as("y"), $"id")
    TxLog.create(spark, t, grid.repartitionByRange(16, $"x")) // x-sorted layout
    // baseline: x-sorted layout prunes x but NOT y
    val (selYBefore, totBefore) = TxLog.pruneFiles(spark, t, $"y" < 8)
    assert(totBefore === 16 && selYBefore.size === 16,
      "x-sorted layout should not prune on y")
    TxLog.cluster(spark, t, "x", "y", 16)
    val snap = TxLog.snapshotState(spark, t)
    assert(snap.files.size === 16)
    // both dimensions now prune to a bounded band of files
    val (selX, tot) = TxLog.pruneFiles(spark, t, $"x" < 8)
    val (selY, _) = TxLog.pruneFiles(spark, t, $"y" < 8)
    assert(tot === 16 && selX.size <= 8, s"x-band selected ${selX.size} of 16")
    assert(selY.size <= 8, s"y-band selected ${selY.size} of 16")
    assert(TxLog.readWhere(spark, t, $"x" < 8).count() === 512L)
    assert(TxLog.readWhere(spark, t, $"y" < 8).count() === 512L)
    // content identical, and the pre-cluster version still readable
    assert(TxLog.read(spark, t).select(sum($"id")).head.getLong(0) ===
      (0L until 4096L).sum)
    assert(TxLog.read(spark, t, Some(0L)).count() === 4096L)
  }

  test("streaming sink: replayed micro-batches commit exactly once") {
    val t = tmpTable("stream")
    TxLog.create(spark, t, spark.range(0, 0).toDF())
    TxLog.appendBatch(spark, t, spark.range(0, 10).toDF(), "app1", 0L)
    TxLog.appendBatch(spark, t, spark.range(10, 20).toDF(), "app1", 1L)
    // crash replay: Structured Streaming re-delivers batch 1 with
    // identical content (same offsets range) — must be a no-op
    TxLog.appendBatch(spark, t, spark.range(10, 20).toDF(), "app1", 1L)
    assert(TxLog.read(spark, t).count() === 20L)
    // writer identities are independent
    TxLog.appendBatch(spark, t, spark.range(20, 25).toDF(), "app2", 0L)
    assert(TxLog.read(spark, t).count() === 25L)
    assert(TxLog.lastCommittedBatch(spark, t, "app1") === Some(1L))
    // txn resolution must survive a checkpoint boundary
    (2 to 13).foreach { k =>
      TxLog.appendBatch(spark, t,
        spark.range(k * 100L, k * 100L + 1).toDF(), "app1", k.toLong)
    }
    assert(TxLog.lastCommittedBatch(spark, t, "app1") === Some(13L))
    val before = TxLog.read(spark, t).count()
    TxLog.appendBatch(spark, t, spark.range(0, 5).toDF(), "app1", 7L) // late replay
    assert(TxLog.read(spark, t).count() === before, "stale replay landed twice")
  }

  test("end-to-end: foreachBatch into TxLog through a real streaming query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = tmpTable("fb")
    TxLog.create(spark, t, spark.range(0, 0).toDF())
    val stream = MemoryStream[Long]
    val q = stream.toDF().toDF("id").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        TxLog.appendBatch(spark, t, df, "fbq", id)
        // a sink that crashes AFTER the table commit but BEFORE the
        // streaming offsets commit re-runs the same batch — emulate
        // the replay inline (same content, same id)
        TxLog.appendBatch(spark, t, df, "fbq", id)
        ()
      }
      .option("checkpointLocation", tmpTable("fb-ckpt"))
      .start()
    stream.addData(1L, 2L, 3L)
    q.processAllAvailable()
    stream.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    assert(TxLog.read(spark, t).as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("schema evolution: metadata-only add-column, old files null-fill") {
    val t = tmpTable("evolve")
    TxLog.create(spark, t, spark.range(0, 10).toDF().coalesce(1))
    val filesBefore = TxLog.snapshotState(spark, t).files.map(_.path).toSet
    TxLog.evolveSchema(spark, t, "id BIGINT NOT NULL,tag STRING")
    // zero data I/O: exactly the same files
    assert(TxLog.snapshotState(spark, t).files.map(_.path).toSet === filesBefore)
    assert(TxLog.read(spark, t).filter($"tag".isNull).count() === 10L)
    // post-evolution appends carry the new column
    TxLog.append(spark, t, spark.range(10, 15)
      .select($"id", concat(lit("t"), $"id").as("tag")))
    assert(TxLog.read(spark, t).filter($"tag".isNotNull).count() === 5L)
    // time travel below the evolution sees the OLD schema
    assert(TxLog.read(spark, t, Some(0L)).columns.toSeq === Seq("id"))
    // the change feed spans the evolution boundary: the pre-evolution
    // side is null-filled, not an AnalysisException
    val ch = TxLog.changes(spark, t, 0L, TxLog.currentVersion(spark, t))
    assert(ch.filter($"change_type" === "insert").count() === 5L)
    assert(ch.filter($"change_type" === "delete").count() === 0L)
    // illegal evolutions fail loudly
    val bad1 = intercept[IllegalArgumentException] {
      TxLog.evolveSchema(spark, t, "id INT NOT NULL,tag STRING,x DOUBLE")
    }
    assert(bad1.getMessage.contains("existing columns"))
    val bad2 = intercept[IllegalArgumentException] {
      TxLog.evolveSchema(spark, t, "id BIGINT NOT NULL,tag STRING,x DOUBLE NOT NULL")
    }
    assert(bad2.getMessage.contains("nullable"))
  }

  test("schema discipline: mismatched append fails loudly; overwrite may evolve") {
    val t = tmpTable("schema")
    TxLog.create(spark, t, spark.range(0, 5).toDF())
    val bad = intercept[IllegalArgumentException] {
      TxLog.append(spark, t, spark.range(0, 5).select($"id", lit(1).as("extra")))
    }
    assert(bad.getMessage.contains("schema"))
    TxLog.overwrite(spark, t, spark.range(0, 5).select($"id", lit(1L).as("extra")))
    assert(TxLog.read(spark, t).columns.toSeq === Seq("id", "extra"))
  }

  test("MOR delete: sidecar subtracts, no data file rewritten, DVs stack, compact folds") {
    val t = tmpTable("mor")
    TxLog.create(spark, t, spark.range(0, 300).toDF()
      .repartitionByRange(4, $"id"))
    val filesV0 = TxLog.snapshotState(spark, t).files.map(_.path).toSet
    TxLog.deleteWhereMor(spark, t, pmod($"id", lit(3)) === 0)
    val snap1 = TxLog.snapshotState(spark, t)
    assert(snap1.files.map(_.path).toSet === filesV0, "MOR delete rewrote data files")
    assert(snap1.dvs.nonEmpty && snap1.dvs.map(_.rows).sum === 100L)
    assert(TxLog.read(spark, t).count() === 200L)
    // stacked second DV commit over the same files
    TxLog.deleteWhereMor(spark, t, pmod($"id", lit(3)) === 1)
    assert(TxLog.read(spark, t).count() === 100L)
    assert(TxLog.read(spark, t).as[Long].collect().forall(_ % 3 == 2))
    // readWhere: stats pruning + DV subtraction compose
    assert(TxLog.readWhere(spark, t, $"id" < 30).count() === 10L)
    // time travel: v1 sees only the first deletion, v0 everything
    assert(TxLog.read(spark, t, Some(1L)).count() === 200L)
    assert(TxLog.read(spark, t, Some(0L)).count() === 300L)
    // deleting already-deleted rows is a no-op commit (no new rows match)
    val v = TxLog.currentVersion(spark, t)
    assert(TxLog.deleteWhereMor(spark, t, pmod($"id", lit(3)) === 0) === v)
    // compaction folds DVs into data files; sidecars auto-GC
    TxLog.compact(spark, t, 1L << 30)
    val snapC = TxLog.snapshotState(spark, t)
    assert(snapC.dvs.isEmpty, "sidecars must auto-GC once their files are rewritten")
    assert(TxLog.read(spark, t).count() === 100L, "compaction resurrected DV'd rows")
  }

  test("MOR merge matches COW merge content; writes only batch-sized data") {
    val cow = tmpTable("morcow")
    val mor = tmpTable("mormor")
    def seed(t: String) = TxLog.create(spark, t, spark.range(0, 400)
      .select($"id", ($"id" % 10).as("v")).repartitionByRange(4, $"id"))
    seed(cow); seed(mor)
    val batch = spark.range(0, 500, 5)
      .select($"id", lit(99L).as("v")) // updates (in-range) + inserts (400..495)
    TxLog.merge(spark, cow, batch, Seq("id"))
    val before = TxLog.snapshotState(spark, mor).files.map(_.path).toSet
    TxLog.mergeMor(spark, mor, batch, Seq("id"))
    val after = TxLog.snapshotState(spark, mor)
    assert(before.subsetOf(after.files.map(_.path).toSet),
      "MOR merge must not remove data files")
    // identical logical content
    val a = TxLog.read(spark, cow).as[(Long, Long)].collect().sorted.toSeq
    val b = TxLog.read(spark, mor).as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
    // applyDvs folds, content unchanged, sidecars gone
    TxLog.applyDvs(spark, mor)
    assert(TxLog.snapshotState(spark, mor).dvs.isEmpty)
    assert(TxLog.read(spark, mor).as[(Long, Long)].collect().sorted.toSeq === b)
  }

  test("MOR interplay: COW delete and cluster never resurrect DV'd rows; vacuum respects sidecars") {
    val t = tmpTable("morvac")
    TxLog.create(spark, t, spark.range(0, 200)
      .select($"id", ($"id" * 2).as("v")).repartitionByRange(4, $"id"))
    TxLog.deleteWhereMor(spark, t, $"id" < 50)                 // v1: DV
    TxLog.deleteWhere(spark, t, $"id" >= 150)                  // v2: COW over DV'd table
    assert(TxLog.read(spark, t).as[(Long, Long)].collect().map(_._1).sorted.toSeq ===
      (50L until 150L).toSeq, "COW rewrite resurrected or lost rows")
    TxLog.cluster(spark, t, "id", "v", 4)                      // v3: pure rewrite
    assert(TxLog.read(spark, t).count() === 100L, "cluster resurrected DV'd rows")
    assert(TxLog.snapshotState(spark, t).dvs.isEmpty,
      "sidecar should auto-GC after every referenced file was rewritten")
    // vacuum with retention covering v1 must KEEP the sidecar parquet
    // (time travel to v1 still subtracts); dropping retention reclaims it
    val dvFiles = () => new java.io.File(t).listFiles()
      .count(f => f.getName.startsWith("dv-") && f.getName.endsWith(".parquet"))
    assert(dvFiles() === 1)
    TxLog.vacuum(spark, t, keepVersions = 10, minAgeMs = 0L)   // retains v1
    assert(dvFiles() === 1, "vacuum deleted a sidecar a retained version needs")
    assert(TxLog.read(spark, t, Some(1L)).count() === 150L)
    TxLog.vacuum(spark, t, keepVersions = 1, minAgeMs = 0L)    // floor past v1
    assert(dvFiles() === 0, "unreachable sidecar survived vacuum")
    assert(TxLog.read(spark, t).count() === 100L)
  }

  test("changes across MOR commits: DV deletes and upserts tag correctly") {
    val t = tmpTable("morchg")
    TxLog.create(spark, t, spark.range(0, 100)
      .select($"id", lit(1L).as("v")).coalesce(1))
    TxLog.deleteWhereMor(spark, t, $"id" < 10)
    val ch = TxLog.changes(spark, t, 0L, 1L)
    assert(ch.filter($"change_type" === "delete").count() === 10L)
    assert(ch.filter($"change_type" === "insert").count() === 0L)
    TxLog.mergeMor(spark, t, spark.range(20, 25)
      .select($"id", lit(7L).as("v")), Seq("id"))
    val ch2 = TxLog.changes(spark, t, 1L, 2L)
    // an upsert is delete(old)+insert(new) in the derived feed
    assert(ch2.filter($"change_type" === "delete").count() === 5L)
    assert(ch2.filter($"change_type" === "insert").count() === 5L)
  }

  test("decimal-column stats compare SCALED: no unsound pruning, skipping still works") {
    // Spark writes decimal(p<=18) as INT32/INT64 with a decimal
    // annotation whose parquet min/max are UNSCALED ints; the pruner
    // must compare them at the column's scale, or a predicate like
    // d < 2.00 wrongly prunes a file whose values are 0.00..0.99
    // (stored 0..99, "min 0 > 2" → excluded)
    val t = tmpTable("dec")
    TxLog.create(spark, t, spark.range(0, 800)
      .select(($"id".cast("decimal(10,2)") / 100).cast("decimal(10,2)").as("d"), $"id")
      .repartitionByRange(8, $"d"))
    // correctness first: every matching row survives pruning
    assert(TxLog.readWhere(spark, t, $"d" < lit(BigDecimal("2.00"))).count() === 200L)
    assert(TxLog.readWhere(spark, t, $"d" === lit(BigDecimal("7.99"))).count() === 1L)
    // and the stats still PRUNE (rescaled, not dropped fail-open)
    val (sel, total) = TxLog.pruneFiles(spark, t, $"d" < lit(BigDecimal("1.00")))
    assert(total === 8 && sel.size <= 2,
      s"rescaled decimal stats should skip disjoint files, selected ${sel.size} of $total")
  }

  test("nested-field predicates produce no bounds (no collision with a top-level twin)") {
    import org.apache.spark.sql.graftglue.GraftGlue
    // col("a.b") names a NESTED field; a bound on top-level "b" would
    // prune against the wrong column's stats — the matcher must emit
    // nothing for multi-part names (fail open)
    assert(GraftGlue.comparisonBounds(col("a.b") < 5).isEmpty)
    assert(GraftGlue.comparisonBounds(col("a.b") < 5 && col("c") >= 1) ===
      Seq(("c", ">=", 1)))
    // end-to-end: a table with top-level "b" must not lose rows to a
    // predicate on a struct's inner b
    val t = tmpTable("nested")
    TxLog.create(spark, t, spark.range(0, 100)
      .select(struct(($"id" + 1000).as("b")).as("a"), $"id".as("b"))
      .repartitionByRange(4, $"b"))
    val (sel, total) = TxLog.pruneFiles(spark, t, col("a.b") < 10)
    assert(total === 4 && sel.size === 4, "nested predicate must not prune by top-level stats")
    assert(TxLog.readWhere(spark, t, col("a.b") < lit(1010L)).count() === 10L)
  }

  test("concurrent replays of the SAME (appId, batchId) commit at most once") {
    // both writers pass appendBatch's entry check before either
    // commits; the loser of the create-if-absent race must re-read
    // the txn map at the new head and stand down
    (0 until 5).foreach { round =>
      val t = tmpTable(s"race$round")
      TxLog.create(spark, t, spark.range(0, 0).toDF())
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val fs = (1 to 2).map { _ =>
        Future {
          barrier.await()
          TxLog.appendBatch(spark, t, spark.range(0, 10).toDF(), "racer", 0L)
        }
      }
      fs.foreach(Await.result(_, 60.seconds))
      assert(TxLog.read(spark, t).count() === 10L,
        s"round $round: batch 0 double-committed")
      assert(TxLog.lastCommittedBatch(spark, t, "racer") === Some(0L))
    }
  }
}
