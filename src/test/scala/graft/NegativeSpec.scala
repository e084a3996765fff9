package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

/** Negative-path parity with the reference's error tests (reference
  * test.py:238-310: zero reducers rejected, nonexistent input fails
  * gracefully, wrong function name fails): bad inputs raise clean
  * errors and leave the session usable.
  */
class NegativeSpec extends AnyFunSuite {
  import TestSpark._

  test("nonexistent input path fails with AnalysisException") {
    intercept[AnalysisException] {
      spark.read.parquet("/root/testdata/does_not_exist.parquet").count()
    }
  }

  test("query against a bad fixture dir fails; session recovers") {
    intercept[Exception] {
      SparkEntry.queries("word_count")(spark, "/nonexistent/dir").count()
    }
    // the shared session must still work afterward
    assert(SparkEntry.queries("word_count")(spark, sfTiny).count() > 0)
  }

  test("reference to a missing column fails at analysis, not runtime") {
    intercept[AnalysisException] {
      Tables.lineitem(spark, sfTiny)
        .select(org.apache.spark.sql.functions.col("no_such_column")).collect()
    }
  }

  test("invalid SQL raises a parse error") {
    intercept[Exception] { spark.sql("SELEC wrong FROM nowhere") }
  }

  test("unknown query name is a clean map miss, not a crash") {
    assert(!SparkEntry.queries.contains("no_such_query"))
  }

  test("bloom prefilter join survives an empty build side") {
    // no customer clears this bar — Spark's stat.bloomFilter NPEs on
    // zero rows, so the operator must short-circuit instead of crash
    val n = graft.ops.Joins.joinBloomThreshold(spark, sfTiny, 1e18).count()
    assert(n == 0)
  }

  test("iterative and generator ops survive an empty corpus") {
    // the iterative loop divides by the node count (0) and the chunker
    // guards its sequence() bounds — both must yield empty, not crash
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.documents(spark, sfTiny).limit(0)
      .write.parquet(s"$dir/documents.parquet")
    assert(graft.graph.GraphOps.pageRank(spark, dir).count() == 0)
    assert(graft.text.TextAnalysis.chunkDocs(spark, dir).count() == 0)
    assert(graft.text.TextAnalysis.collocationPmi(spark, dir).count() == 0)
  }

  test("range-bucket rule skips band tables above its size cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wide = (0 until 1100).map(i => (i.toLong, i.toDouble, i + 0.5)).toDF("band_id", "lo", "hi")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RangeBucketJoinRule
    try {
      val j = Tables.lineitem(spark, sfTiny)
        .join(wide, col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      assert(!j.queryExecution.optimizedPlan.toString.contains("graft_band_bucket"),
        "rule fired on an oversized band table")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.RangeBucketJoinRule)
  }

  test("zero-partition requests are rejected cleanly (reference num_reducers=0 parity)") {
    // reference test.py test_invalid_num_reducers_zero: the system
    // must reject a zero-reducer job, not hang or corrupt state
    intercept[IllegalArgumentException] {
      graft.Tables.lineitem(spark, sfTiny).repartition(0).count()
    }
    intercept[IllegalArgumentException] {
      graft.Tables.lineitem(spark, sfTiny).coalesce(0).count()
    }
    // session still healthy afterwards
    assert(SparkEntry.queries("word_count")(spark, sfTiny).count() > 0)
  }

  test("jaro_winkler rejects non-string inputs at analysis time") {
    graft.functions.StringFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    val e = intercept[AnalysisException] {
      graft.Tables.lineitem(spark, sfTiny)
        .select(graft.functions.StringFunctions
          .jaroWinkler(col("l_quantity"), col("l_returnflag")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("jaro_winkler"),
      s"type-check failure does not name the function: ${e.getMessage}")
    // session still healthy
    assert(SparkEntry.queries("word_count")(spark, sfTiny).count() > 0)
  }
}
