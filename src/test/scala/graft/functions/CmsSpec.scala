package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.text.TextOps.tokens

class CmsSpec extends AnyFunSuite {
  import TestSpark._
  import TypedAggregators.{CountMinSketch, cmsEstimate}

  private def toks(dir: String) = Tables.documents(spark, dir)
    .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] = {
    val cms = udaf(CountMinSketch)
    df.agg(cms(col("tok"))).head().getSeq[Long](0).toArray
  }

  test("CMS never underestimates: est >= exact for EVERY word") {
    val sketch = sketchOf(toks(sfSmall))
    val exact = toks(sfSmall).groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (w, c) =>
      assert(cmsEstimate(sketch, w) >= c, s"underestimate for '$w'")
    }
  }

  test("CMS sketches merge: sketch(A ∪ B) == sketch(A) + sketch(B)") {
    val all = sketchOf(toks(sfSmall))
    val a = sketchOf(toks(sfSmall).filter(col("doc_id") % 2 === 0))
    val b = sketchOf(toks(sfSmall).filter(col("doc_id") % 2 === 1))
    val merged = a.zip(b).map { case (x, y) => x + y }
    assert(merged.sameElements(all), "sketch is not a linear sketch")
  }

  test("CMS sketch is partition-invariant") {
    val base = withShufflePartitions(1) { sketchOf(toks(sfTiny)) }
    val wide = withShufflePartitions(7) {
      sketchOf(toks(sfTiny).repartition(7))
    }
    assert(base.sameElements(wide))
  }

  test("total mass equals the stream length in every sketch row") {
    val sketch = sketchOf(toks(sfTiny))
    val n = toks(sfTiny).count()
    for (d <- 0 until TypedAggregators.CmsDepth) {
      val rowSum = (0 until TypedAggregators.CmsWidth)
        .map(i => sketch(d * TypedAggregators.CmsWidth + i)).sum
      assert(rowSum == n, s"row $d mass $rowSum != $n")
    }
  }
}
