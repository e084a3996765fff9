package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** Evidence tool (CandidateEconomy/SkewBench's sibling): the
  * transactional table's three scale claims, MEASURED on a real
  * fixture instead of asserted —
  *
  *  1. '''Data skipping''': a selective predicate on the cluster key
  *     opens the files its bounds admit, not the table. Reported:
  *     files selected / total, plus wall time of the stats-pruned
  *     read vs the same filter over the full snapshot scan.
  *  2. '''Merge economy''': a CDC batch confined to ~1% of the key
  *     range rewrites only the files it touches. Reported: files
  *     rewritten / total and bytes rewritten / table bytes.
  *  3. '''Metadata resolution''': after hundreds of commits, a
  *     snapshot resolves from the newest checkpoint + log suffix.
  *     Reported: wall time of head resolution at >100 versions (cold
  *     entry caches), which must not scale with history length.
  *
  * One JSON line per claim, per fixture dir. The table is built from
  * `events`, range-clustered on event_id into 64 files — the layout a
  * scan-heavy production key earns.
  */
object TxLogEconomy {
  def main(args: Array[String]): Unit = {
    val dirs: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = MainSession.build(defaultCpus = "32")
    val f3 = (d: Double) =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (dir <- dirs) {
      val table = java.nio.file.Files
        .createTempDirectory("graft-txlog-econ").toString + "/t"
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("ts_us"))
      TxLog.create(spark, table, ev.repartitionByRange(64, col("event_id")))
      val snap0 = TxLog.snapshotState(spark, table)
      val maxId = ev.agg(max(col("event_id"))).head.getLong(0)
      val band = maxId / 100 // ~1% of the key range

      // 1. skipping: files touched + wall time, pruned vs full-scan
      val cond = col("event_id") >= lit(0L) && col("event_id") < lit(band)
      val (sel, total) = TxLog.pruneFiles(spark, table, cond)
      val (nPruned, tPruned) = timed(TxLog.readWhere(spark, table, cond).count())
      val (nFull, tFull) = timed(TxLog.read(spark, table).filter(cond).count())
      require(nPruned == nFull, s"pruned read lost rows: $nPruned != $nFull")
      println(s"""{"metric":"txlog_economy","claim":"skipping","sf":"$dir",""" +
        s""""files_selected":${sel.size},"files_total":$total,""" +
        s""""rows":$nPruned,"sec_pruned":${f3(tPruned)},"sec_full":${f3(tFull)}}""")

      // 2. merge: a 1%-band CDC batch (updates in-band + fresh inserts)
      val batch = ev.filter(col("event_id") < band)
        .withColumn("value", col("value") * 2)
        .unionByName(ev.filter(col("event_id") >= maxId - band)
          .withColumn("event_id", col("event_id") + maxId + 1))
      val (_, tMerge) = timed(TxLog.merge(spark, table, batch, Seq("event_id")))
      val snap1 = TxLog.snapshotState(spark, table)
      val rewritten = snap0.files.map(_.path).toSet -- snap1.files.map(_.path).toSet
      val rewrittenBytes = snap0.files.filter(f => rewritten(f.path)).map(_.bytes).sum
      val tableBytes = snap0.files.map(_.bytes).sum
      println(s"""{"metric":"txlog_economy","claim":"merge","sf":"$dir",""" +
        s""""files_rewritten":${rewritten.size},"files_total":${snap0.files.size},""" +
        s""""bytes_rewritten":$rewrittenBytes,"bytes_table":$tableBytes,""" +
        s""""sec_merge":${f3(tMerge)}}""")

      // Skewed key source for 2c/2b: the fixture's lineitem l_partkey
      // — Zipf(1) on a tools/skew10.py fixture — rescaled onto the
      // event-id space, a deterministic ~1%-of-lineitem draw.
      val nPart = Tables.part(spark, dir).count()
      val keyScale = (maxId + 1).toDouble / nPart
      val skewKeys = Tables.lineitem(spark, dir)
        .filter(pmod(xxhash64(col("l_orderkey") * 8 + col("l_linenumber")),
          lit(100L)) === 0L)
        .select(floor(col("l_partkey") * keyScale).cast("long").as("event_id"))
        .distinct()

      // 2c. the same skewed source confined to its HEAD band (the hot
      // keys only, no tail) — separates key LOCALITY from key SKEW:
      // a hot-entity batch is range-local, so stage-2 narrowing must
      // confine the rewrite to the hot file(s), while 2b's full-range
      // tail made every file genuinely dirty (COW's honest floor —
      // the mitigation at that dispersion is merge-on-read deletion
      // vectors, out of this table's COW scope, or clustering by
      // update affinity)
      val snapC = TxLog.snapshotState(spark, table)
      val headBatch = ev.join(
          skewKeys.filter(col("event_id") <= lit(maxId / 100)),
          Seq("event_id"), "left_semi")
        .withColumn("value", col("value") * 5)
        .dropDuplicates("event_id")
      val nHead = headBatch.count()
      val (_, tMergeH) = timed(TxLog.merge(spark, table, headBatch, Seq("event_id")))
      val snapC1 = TxLog.snapshotState(spark, table)
      val rewrittenH = snapC.files.map(_.path).toSet -- snapC1.files.map(_.path).toSet
      val rewrittenHBytes = snapC.files.filter(f => rewrittenH(f.path)).map(_.bytes).sum
      println(s"""{"metric":"txlog_economy","claim":"merge_skew_head","sf":"$dir",""" +
        s""""batch_keys":$nHead,""" +
        s""""files_rewritten":${rewrittenH.size},"files_total":${snapC.files.size},""" +
        s""""bytes_rewritten":$rewrittenHBytes,"bytes_table":${snapC.files.map(_.bytes).sum},""" +
        s""""sec_merge":${f3(tMergeH)}}""")

      // 2b. merge under SKEWED keys (r11): the update batch's keys
      // come from the fixture's lineitem l_partkey — on a
      // tools/skew10.py fixture that column is Zipf(1) (one key holds
      // ~7% of draws), rescaled onto the event-id space. The skewed
      // draw's DISTINCT key set is a dense head (one hot file) plus a
      // thin tail smeared across the clustered table, so stage-1
      // min/max pruning admits everything and the narrowing burden
      // falls entirely on stage-2 match detection — the case the
      // three-stage design must not degrade to a full-table rewrite
      // on. On a uniform fixture the same code measures the uniform
      // baseline; compare the two lines in BASELINE.md.
      val snapB = TxLog.snapshotState(spark, table)
      val skewBatch = ev.join(skewKeys, Seq("event_id"), "left_semi")
        .withColumn("value", col("value") * 3)
        .dropDuplicates("event_id")
      val nBatch = skewBatch.count()
      val (_, tMergeZ) = timed(TxLog.merge(spark, table, skewBatch, Seq("event_id")))
      val snapB1 = TxLog.snapshotState(spark, table)
      val rewrittenZ = snapB.files.map(_.path).toSet -- snapB1.files.map(_.path).toSet
      val rewrittenZBytes = snapB.files.filter(f => rewrittenZ(f.path)).map(_.bytes).sum
      val tableZBytes = snapB.files.map(_.bytes).sum
      println(s"""{"metric":"txlog_economy","claim":"merge_skew","sf":"$dir",""" +
        s""""batch_keys":$nBatch,""" +
        s""""files_rewritten":${rewrittenZ.size},"files_total":${snapB.files.size},""" +
        s""""bytes_rewritten":$rewrittenZBytes,"bytes_table":$tableZBytes,""" +
        s""""sec_merge":${f3(tMergeZ)}}""")

      // 2d. the same dispersed batch via MERGE-ON-READ (r11): matched
      // rows are DV-deleted in place and the batch appends as new
      // files — bytes written are O(batch + sidecar) at ANY key
      // dispersion, where 2b's copy-on-write rewrote ~the whole
      // table. Also timed: the head read paying the DV anti-join
      // (the read-amplification side of the trade).
      val snapD = TxLog.snapshotState(spark, table)
      val morBatch = ev.join(skewKeys, Seq("event_id"), "left_semi")
        .withColumn("value", col("value") * 4)
        .dropDuplicates("event_id")
      val (_, tMorMerge) = timed(TxLog.mergeMor(spark, table, morBatch, Seq("event_id")))
      val snapD1 = TxLog.snapshotState(spark, table)
      val addedD = snapD1.files.map(_.path).toSet -- snapD.files.map(_.path).toSet
      val addedBytes = snapD1.files.filter(f => addedD(f.path)).map(_.bytes).sum
      val dvBytes = snapD1.dvs.map(_.bytes).sum
      val removedD = snapD.files.map(_.path).toSet -- snapD1.files.map(_.path).toSet
      val (_, tReadDv) = timed(TxLog.read(spark, table).count())
      println(s"""{"metric":"txlog_economy","claim":"merge_mor_skew","sf":"$dir",""" +
        s""""batch_keys":${morBatch.count()},"files_removed":${removedD.size},""" +
        s""""bytes_written_data":$addedBytes,"bytes_written_dv":$dvBytes,""" +
        s""""bytes_table":${snapD.files.map(_.bytes).sum},""" +
        s""""sec_merge":${f3(tMorMerge)},"sec_read_with_dvs":${f3(tReadDv)}}""")

      // 3. metadata: 120 tiny commits, then head resolution from cold
      // caches — cost is checkpoint + suffix, not history length
      (1 to 120).foreach { k =>
        TxLog.append(spark, table,
          ev.filter(col("event_id") === (k % 1000).toLong).limit(1))
      }
      TxLog.dropMetadataCaches()
      val (snapN, tResolve) = timed(TxLog.snapshotState(spark, table))
      val head = TxLog.currentVersion(spark, table)
      val ckpts = new java.io.File(s"$table/_txlog").listFiles()
        .count(_.getName.startsWith("checkpoint-"))
      println(s"""{"metric":"txlog_economy","claim":"metadata","sf":"$dir",""" +
        s""""versions":$head,"checkpoints":$ckpts,""" +
        s""""files_at_head":${snapN.files.size},"sec_resolve_cold":${f3(tResolve)}}""")

      // leave no fixture behind
      new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
        .delete(new Path(table).getParent, true)
      ()
    }
    spark.stop()
  }
}
