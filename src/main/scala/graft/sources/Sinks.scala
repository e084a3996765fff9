package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output surface (SURVEY.md §2.1 S7, §2.2 C6). The reference's sink
  * is one text file per reduce partition with `k\tv` lines (reference
  * worker.py:52-58,200-209, master.py:196); its client concatenates
  * partition files on read (interactive_client.py:93-105). Spark-side
  * the same shapes are one-liners — this module names them so the
  * capability is a tested, documented part of the library rather than
  * an implicit possibility.
  *
  * Scale notes: `coalesce(1)` exists for small summaries only — a
  * single output file is a driver-shaped bottleneck at 100 TB, which
  * is why every writer defaults to one file per partition (exactly the
  * reference's fan-out, C6). Partitioned parquet is the layout the
  * fixture tables would use at real scale (TESTDATA.md note).
  */
object Sinks {

  /** Reference-style text sink: tab-separated key/value lines, one
    * file per partition. Columns are cast to string — the reference
    * stringifies everything at this boundary anyway (worker.py:137).
    */
  def writeTsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "false")
      .csv(path)
  }

  /** Columnar sink, optionally hive-partitioned by key columns —
    * the 100 TB layout (partition pruning on read).
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Line-JSON sink (one object per row). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
