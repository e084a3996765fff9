package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed frequency ranking — the scale-safe replacement for
  * `row_number()/SUM() OVER (ORDER BY cnt DESC, tok)` on a
  * data-derived frame. A global window drags the whole frame onto ONE
  * task (WindowExec warns exactly this); a web-corpus "vocabulary"
  * (every distinct `[a-z]+` run, garbage included) is itself 10⁸–10⁹
  * rows at 100 TB, so even a Heaps-bounded frame must not funnel
  * through a single partition.
  *
  * Mechanism (the [[Relational.globalRowIds]] shape, extended with a
  * running sum): range-partition by the rank key (partition i's keys
  * all precede partition i+1's), sort within partitions, run one tiny
  * job collecting per-partition (row count, cnt sum) — numPartitions
  * pairs, not data — prefix-sum those on the driver, then stamp rank
  * and cumulative sum map-side from each partition's offsets. The
  * range shuffle is materialized once; the stats job and the stamp
  * job share its shuffle files (the second run skips the exchange
  * stages). Output is bit-identical to the ROW_NUMBER/SUM-OVER
  * oracle: determinism comes from the total (cnt DESC, tok) order,
  * not from where the sampled range bounds land.
  */
object Ranks {

  /** Rank `counts` (columns `tok`, `cnt`) by (cnt DESC, tok ASC).
    * Returns (tok, cnt, rank, cum, total): 1-based dense global rank,
    * running sum of cnt in rank order, and the grand total stamped as
    * a literal (free — it is the last prefix sum, so no extra pass).
    */
  def freqRanked(s: SparkSession, counts: DataFrame, parts: Int = 16): DataFrame = {
    import s.implicits._
    val sorted = counts
      .select(col("tok").cast("string").as("tok"), col("cnt").cast("long").as("cnt"))
      .as[(String, Long)]
      .repartitionByRange(parts, col("cnt").desc, col("tok"))
      .sortWithinPartitions(col("cnt").desc, col("tok"))
      .rdd
    // INVARIANT: this collect ships one (count, sum) pair PER RANGE
    // PARTITION — O(parts), bounded by the `parts` argument, never by
    // data volume. At cluster scale `parts` is the range-partition
    // count (thousands), so the driver holds a few KB of offsets; the
    // rows themselves never leave the executors.
    val stats = sorted
      .mapPartitionsWithIndex { (i, it) =>
        var n = 0L; var sm = 0L
        it.foreach { kv => n += 1L; sm += kv._2 }
        Iterator((i, n, sm))
      }
      .collect().sortBy(_._1)
    val nParts = stats.length
    val rankOff = new Array[Long](nParts + 1)
    val sumOff = new Array[Long](nParts + 1)
    stats.foreach { case (i, n, sm) => rankOff(i + 1) = n; sumOff(i + 1) = sm }
    var i = 1
    while (i <= nParts) {
      rankOff(i) += rankOff(i - 1); sumOff(i) += sumOff(i - 1); i += 1
    }
    val total = if (nParts == 0) 0L else sumOff(nParts)
    sorted
      .mapPartitionsWithIndex { (i, it) =>
        var rank = rankOff(i); var run = sumOff(i)
        it.map { case (t, c) => rank += 1L; run += c; (t, c, rank, run) }
      }
      .toDF("tok", "cnt", "rank", "cum")
      .withColumn("total", lit(total))
  }
}
