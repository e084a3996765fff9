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

  test("CMS inner product bounds the true join size from above") {
    import TypedAggregators.{CmsDepth, CmsWidth}
    val a = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey").cast("string").as("tok"))
    val b = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey").cast("string").as("tok"))
    val sA = sketchOf(a)
    val sB = sketchOf(b)
    val est = (0 until CmsDepth).map { d =>
      (0 until CmsWidth).map(j =>
        sA(d * CmsWidth + j) * sB(d * CmsWidth + j)).sum
    }.min
    val exact = Tables.orders(spark, sfTiny)
      .join(Tables.lineitem(spark, sfTiny),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(est >= exact, "inner product underestimated the join size")
    val slack = math.ceil(2.0 * a.count() * b.count() / CmsWidth).toLong
    assert(est <= exact + slack, s"est $est outside Markov bound")
    // and the registered audit row agrees
    val row = TypedAggregators.joinSizeEstimate(spark, sfTiny).head()
    assert(row.getLong(0) == exact)
    assert(row.getBoolean(1) && row.getBoolean(2))
  }
}
