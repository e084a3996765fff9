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
