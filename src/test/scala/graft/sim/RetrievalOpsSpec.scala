package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Hybrid retrieval (RRF) and embedding-outlier flags against local
  * recomputes from the raw fixture data.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrf fusion reproduces a local rank fusion of its two runs") {
    val lex = graft.text.CurationRules.bm25(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }
      .take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val vecs = Tables.embeddings(spark, sfSmall)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val q = vecs(0L)
    val nq = math.sqrt(dot(q, q))
    val dense = vecs.toSeq
      .filter { case (id, v) => id != 0L && dot(v, v) > 0 }
      .map { case (id, v) => (id, dot(v, q) / (math.sqrt(dot(v, v)) * nq)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val want = (lex.keySet ++ dense.keySet).toSeq
      .map { id =>
        val s = round6(lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
        (id, s)
      }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val got = RetrievalOps.rrfFusion(spark, sfSmall)
      .orderBy(col("fused_rank")).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == want.toSeq, "fused ranking diverges from local RRF")
  }

  test("embedding outliers flag exactly the vectors beyond 1.5x the mean distance") {
    val rows = RetrievalOps.embeddingOutliers(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.nonEmpty && rows.forall(_._2 >= 0), "distances must be non-negative")
    // the threshold the operator applied must equal the one recomputed
    // from its own reported distances (same integer-micro rounding
    // pipeline as the operator — no float rounding boundary)
    val sumMicro = rows.map(r => BigDecimal(r._2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).bigDecimal.movePointRight(6).longValueExact).sum
    val meanMicro = (10 * sumMicro / rows.length + 5) / 10
    val thr = ((3 * meanMicro + 1) / 2) / 1e6
    rows.foreach { case (id, d, flag) =>
      assert(flag == d > thr, s"vec $id: flag $flag but dist $d vs thr $thr")
    }
    // sanity: not everything is an outlier (mean-based cut can't flag all)
    assert(rows.count(_._3) < rows.length / 2, "more than half flagged")
  }

  test("rag index manifest is exactly kept-docs x their chunks x their ivf list") {
    val kept = graft.text.TextAnalysis.qualityFilter(spark, sfSmall)
      .filter(col("keep")).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val chunks = graft.text.TextAnalysis.chunkDocs(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val lists = SimOps.ivfAssignments(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = chunks
      .filter(c => kept(c._1) && lists.contains(c._1))
      .map(c => (c._1, c._2, c._3, lists(c._1))).toSet
    val got = RetrievalOps.ragIndex(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, "manifest diverges from the composed stages")
    assert(got.nonEmpty && got.map(_._4).size > 1,
      "manifest should shard across multiple ivf lists")
  }

  test("embedding outlier distance matches a local centroid recompute") {
    val vecs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    val dim = vecs.head._2.length
    val cent = (0 until dim).map { d =>
      // the operator's integer-micro mean: Σ of 6-dp-rounded values in
      // micro units, divided half-up by n in integer arithmetic
      val sumMicro = vecs.map(v => BigDecimal(round6(v._2(d)))
        .bigDecimal.movePointRight(6).longValueExact).sum
      ((10 * sumMicro / vecs.length + 5) / 10) / 1e6
    }
    val want = vecs.map { case (id, v) =>
      id -> round6(math.sqrt(
        (0 until dim).map(d => BigDecimal(round6((v(d) - cent(d)) * (v(d) - cent(d)))))
          .sum.toDouble))
    }.toMap
    val got = RetrievalOps.embeddingOutliers(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, d) =>
      assert(math.abs(d - want(id)) <= 1e-6 + 1e-9, s"vec $id: $d vs ${want(id)}")
    }
  }

  test("sparse_cosine_pairs matches a local df-capped tf-idf recompute") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect()
    val grams = docs.flatMap { case (id, t) =>
      val toks = graft.mr.MrJobs.tokenize(t)
      if (toks.length < 2) Nil
      else toks.sliding(2).map(w => (id, w.mkString(" "))).toList
    }
    val tf = grams.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val dfMap = tf.keys.groupBy(_._2).map { case (g, ks) => g -> ks.size.toLong }
    val n = docs.length
    val w = tf.collect { case ((id, g), f) if dfMap(g) <= 60L =>
      (id, g) -> round6(f * (math.log((1.0 + n) / (1.0 + dfMap(g))) + 1))
    }
    val norms = w.groupBy(_._1._1).map { case (id, m) =>
      id -> math.sqrt(m.values.map(x => BigDecimal(round6(x * x))).sum.toDouble)
    }
    val byDoc = w.groupBy(_._1._1).map { case (id, m) =>
      id -> m.map { case ((_, g), x) => g -> x }
    }
    val ids = byDoc.keys.toSeq.sorted
    val pairs = for {
      a <- ids; b <- ids if a < b
      shared = byDoc(a).keySet.intersect(byDoc(b).keySet) if shared.nonEmpty
    } yield {
      val dot = shared.toSeq
        .map(g => BigDecimal(round6(byDoc(a)(g) * byDoc(b)(g)))).sum.toDouble
      (a, b, round6(dot / (norms(a) * norms(b))))
    }
    val want = pairs.sortBy { case (a, b, c) => (-c, a, b) }.take(20)
    val got = RetrievalOps.sparseCosinePairs(spark, sfTiny)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, s"got ${got.take(5)}… want ${want.take(5)}…")
    got.foreach { case (_, _, c) => assert(c > 0 && c <= 1.0 + 1e-9) }
  }
}
