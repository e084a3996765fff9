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

  test("AQE splits and joinSalted agrees on a Zipf-keyed lineitem⋈part (the skew10 fixture shape)") {
    // The round-8 fixtures were uniform, so the skew machinery had
    // only ever faced the manufactured 90%-one-key shape above. This
    // is the tools/skew10.py distribution in miniature: l_partkey
    // rewritten Zipf(1) over the part domain — pk = ⌊N^u⌋ − 1 with u
    // uniform from a hash — putting ~7% of ALL rows on key 0 with a
    // heavy tail behind it, the realistic hot-dimension-member shape.
    val n = graft.Tables.part(spark, sfSmall).count()
    def zipfed(df: org.apache.spark.sql.DataFrame) = df.withColumn(
      "l_partkey",
      least(lit(n - 1),
        floor(pow(lit(n.toDouble),
          pmod(xxhash64(col("l_orderkey") * 8 + col("l_linenumber")),
            lit(1000000L)) / lit(1000000.0))).cast("long") - 1))
    def brandRollup(li: org.apache.spark.sql.DataFrame) =
      li.join(graft.Tables.part(spark, sfSmall),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"), count(lit(1)).as("n"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}").sorted.toSeq

    // ground truth: plain shuffle join, no AQE (broadcast off — skew
    // only exists when the build side is too big to broadcast)
    val plain = withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      canon(brandRollup(zipfed(graft.Tables.lineitem(spark, sfSmall))))
    }

    // leg 1: the explicit salted rewrite agrees (its contract: result
    // identical to the unsalted join, hot key spread over R reducers)
    val salted = withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val R = 8
      val li = zipfed(graft.Tables.lineitem(spark, sfSmall))
        .withColumn("salt", pmod(col("l_orderkey"), lit(R)).cast("int"))
      val p = graft.Tables.part(spark, sfSmall)
        .withColumn("salt", explode(typedLit(List.range(0, R))))
      canon(li.join(p, col("l_partkey") === col("p_partkey")
          && li("salt") === p("salt"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"), count(lit(1)).as("n")))
    }
    assert(salted == plain, "salted rollup diverged from the plain join")

    // leg 2: AQE actually SPLITS the Zipf-hot partition at runtime.
    // shuffle.partitions=32: the Zipf head is ~9% of ROWS — at the
    // suite's 4 shuffle partitions every partition holds ~25% and no
    // partition stands out; at 32 (or a cluster's thousands) the hot
    // key's partition is ~4x the median, the realistic shape
    withConfs(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // repartition(8): AQE subdivides by map-index ranges, so the
      // upstream stage needs >1 task (same note as the test above);
      // join BEFORE aggregating so the SMJ(Sort(shuffle), ...) shape
      // OptimizeSkewedJoin matches is what executes
      val joined = zipfed(graft.Tables.lineitem(spark, sfSmall))
        .repartition(8)
        .join(graft.Tables.part(spark, sfSmall),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_quantity"))
      assert(joined.collect().length > 0)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"adaptive plan never executed:\n${p.take(500)}")
      assert(p.contains("skew=true"),
        s"AQE did not split the Zipf-hot partition:\n${p.take(3000)}")
    }
  }
}
