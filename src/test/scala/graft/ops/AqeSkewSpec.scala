package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Runtime skew mitigation — the AQE half of the skew story.
  * [[Joins.joinSalted]] is the WRITE-time fix (explicit salt when the
  * hot keys are known); AQE skew-join is the RUNTIME fix (no code
  * change, Spark splits oversized partitions after seeing map output
  * sizes). This spec manufactures a join where ~90% of the left side
  * lands on one key, drops the skew thresholds to fixture scale, and
  * asserts the executed plan actually split the partition — the
  * `skew=true` marker on the sort-merge join. At 100 TB these
  * thresholds stay at their defaults (256 MB); the mechanism is
  * identical.
  */
class AqeSkewSpec extends AnyFunSuite {
  import TestSpark._

  private def withConfs[T](kv: (String, String)*)(body: => T): T = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // ~90% of lineitem rows collapse onto key 0; the rest keep
      // distinct keys — one shuffle partition dwarfs its siblings.
      // repartition(8) first: AQE splits a skewed partition by MAP
      // INDEX ranges, so the upstream stage must have >1 task — the
      // single-file fixture scan is 1 mapper, a real cluster scan is
      // thousands. (With one mapper the rule logs "skewed partitions:
      // 0" — nothing to subdivide.)
      val skewed = Tables.lineitem(spark, sfSmall)
        .repartition(8)
        .select(
          when(pmod(col("l_orderkey"), lit(10)) < 9, 0L)
            .otherwise(col("l_orderkey")).as("k"),
          col("l_quantity"))
      // unique keys WITHOUT distinct(): an aggregate between the
      // shuffle stage and the join defeats OptimizeSkewedJoin's
      // pattern (it splits only SMJ(Sort(shuffle), Sort(shuffle))).
      // orders.o_orderkey is already unique; 0 is appended once.
      val dim = Tables.orders(spark, sfSmall)
        .filter(pmod(col("o_orderkey"), lit(10)) >= 9)
        .select(col("o_orderkey").as("k"))
        .union(spark.range(1).select(lit(0L).as("k")))
        .withColumn("tag", col("k") % 7)
      val joined = skewed.join(dim, "k")
      // collect() runs THIS dataset's queryExecution (count() would
      // build a new one), finalizing the adaptive plan we inspect
      assert(joined.collect().nonEmpty)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"adaptive plan never executed:\n${p.take(500)}")
      assert(p.contains("skew=true"),
        s"AQE did not mark any skewed join side:\n${p.take(3000)}")
    }
  }
}
