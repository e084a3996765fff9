package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark._

  test("langId identifies real multilingual prose") {
    import spark.implicits._
    val samples = Seq(
      (1L, "The cat sat on the mat and it is happy in the sun."),
      (2L, "Der Hund und die Katze, das ist nicht ein Problem."),
      (3L, "El perro y los gatos, es una casa que tiene luz por la manana."),
      (4L, "Le chien et les chats, une maison qui est grande pour tous."),
      (5L, "Wo zai jia li, ni bu shi wo de pengyou, ta le."))
    val df = samples.toDF("doc_id", "text")
    val preds = TextAnalysis.langIdOn(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("doc_fingerprint matches a local recompute and is order-sensitive") {
    import spark.implicits._
    val P = 2147483647L
    def tokHash(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % P
    }
    def localFp(text: String): Long =
      MrJobsTokens.tokenize(text).foldLeft(0L)((acc, t) => (acc * 31 + tokHash(t)) % P)

    val fps = TextAnalysis.docFingerprint(spark, sfTiny)
      .as[(Long, Long)].collect().toMap
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(fps(id) == localFp(text), s"doc $id fingerprint mismatch")
    }
    assert(localFp("alpha beta gamma") != localFp("gamma beta alpha"),
      "fingerprint must be order-sensitive")
  }

  test("tfidf matches a local recompute") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tf = docs.flatMap { case (id, text) =>
      MrJobsTokens.tokenize(text).groupBy(identity).map { case (t, g) => ((id, t), g.size) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, g) => t -> g.size }
    val n = docs.length
    val expected = tf.map { case ((id, t), f) =>
      (id, t) -> math.round(f * (math.log((1.0 + n) / (1.0 + df(t))) + 1) * 1e6) / 1e6
    }
    val got = TextAnalysis.tfidf(spark, sfTiny)
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-6, s"$k: $v vs ${expected(k)}")
    }
  }

  test("kneser_ney: model is a proper distribution and doc scores match a local recompute") {
    import spark.implicits._
    val D = TextAnalysis.KnDiscount
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect()
    val bigrams = docs.flatMap { case (id, text) =>
      val t = MrJobsTokens.tokenize(text)
      if (t.length < 2) Nil else t.sliding(2).map(w => (id, w.head, w(1))).toList
    }
    val bc = bigrams.groupBy(b => (b._2, b._3)).map { case (k, g) => k -> g.size.toLong }
    val cc = bc.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val fwd = bc.groupBy(_._1._1).map { case (w1, g) => w1 -> g.size.toLong }
    val rev = bc.groupBy(_._1._2).map { case (w2, g) => w2 -> g.size.toLong }
    val b = bc.size.toLong
    def p(w1: String, w2: String): Double =
      (bc((w1, w2)) - D) / cc(w1) + D * fwd(w1) / cc(w1) * (rev(w2).toDouble / b)
    // KN is a PROPER conditional distribution: over the full vocab,
    // the discounted mass plus the redistributed continuation mass
    // sums to Σ_{w2∈V} P(w2|w1) = 1 − D·N1+(w1,·)/c(w1·)·(1 − 1) = 1
    // exactly (continuation probs sum to 1 across V). Verify per
    // context, including the zero-count backoff terms.
    val vocab = (bc.keysIterator.map(_._1) ++ bc.keysIterator.map(_._2)).toSet
    cc.keys.foreach { w1 =>
      val total = vocab.iterator.map { w2 =>
        val cObs = bc.getOrElse((w1, w2), 0L)
        math.max(cObs - D, 0) / cc(w1) + D * fwd(w1) / cc(w1) * (rev.getOrElse(w2, 0L).toDouble / b)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context '$w1' sums to $total")
    }
    // per-doc NLL equals the operator's output under the identical
    // micro-nat integer pipeline (terms rounded to integer micro-nats,
    // mean rounded by integer division — bit-exact, no float rounding
    // boundary anywhere past the ln)
    val expected = bigrams.groupBy(_._1).map { case (id, g) =>
      val sumMicro = g.map { case (_, w1, w2) =>
        BigDecimal(-math.log(p(w1, w2)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      val nllMicro = ((10 * sumMicro) / g.size + 5) / 10
      id -> (g.size.toLong, nllMicro / 1e6)
    }
    val got = TextAnalysis.kneserNey(spark, sfTiny)
      .select("doc_id", "n_big", "kn_nll").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (n, nll)) =>
      assert(got(id)._1 == n, s"doc $id bigram count")
      assert(got(id)._2 == nll, s"doc $id: ${got(id)._2} vs $nll")
    }
  }

  test("zipf_slope matches a local OLS fit and slopes downward") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = Tables.documents(spark, sfTiny)
      .select("text").as[String].collect()
      .flatMap(MrJobsTokens.tokenize)
    val counts = toks.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
    val xy = ranked.map { case ((_, c), i) =>
      (r6(math.log(i + 1.0)), r6(math.log(c.toDouble))) }
    val n = xy.size.toDouble
    val sx = xy.map(p => BigDecimal(p._1)).sum.toDouble
    val sy = xy.map(p => BigDecimal(p._2)).sum.toDouble
    val sxx = xy.map(p => BigDecimal(r6(p._1 * p._1))).sum.toDouble
    val sxy = xy.map(p => BigDecimal(r6(p._1 * p._2))).sum.toDouble
    val slope = r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
    val intercept = r6((sy - slope * sx) / n)
    val got = TextAnalysis.zipfSlope(spark, sfTiny)
      .as[(Long, Double, Double)].collect()
    assert(got.length == 1)
    assert(got(0)._1 == xy.size.toLong)
    assert(math.abs(got(0)._2 - slope) < 1e-6, s"slope ${got(0)._2} vs $slope")
    assert(math.abs(got(0)._3 - intercept) < 1e-6)
    assert(got(0)._2 < 0, "frequency must decay with rank on any real corpus")
  }

  test("phrase_match equals a local positional recompute and plans an equi hash join") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pat = "[a-z]+".r
    val brute = docs.flatMap { case (id, text) =>
      val toks = pat.findAllIn(text.toLowerCase).toArray
      val hits = toks.indices.dropRight(1)
        .filter(i => toks(i) == "fast" && toks(i + 1) == "table")
      if (hits.isEmpty) None else Some((id, hits.size.toLong, hits.min.toLong))
    }.toSet
    val got = TextAnalysis.phraseMatch(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture has no phrase hits - query surface dead")
    val p = TextAnalysis.phraseMatch(spark, sfSmall)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"adjacency join fell back to a nested loop:\n${p.take(2000)}")
  }

  test("topic words match a local tf-idf rank recompute") {
    import org.apache.spark.sql.functions.col
    val rows = Tables.documents(spark, sfTiny)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sw = rows.flatMap { case (src, t) =>
      MrJobsTokens.tokenize(t).map(w => (src, w))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfw = sw.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nSources = rows.map(_._1).distinct.length.toDouble
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = sw.keys.groupBy(_._1).flatMap { case (src, keys) =>
      keys.toSeq
        .map { case k @ (_, w) =>
          (w, sw(k), dfw(w), round6(sw(k) * math.log(nSources / dfw(w))))
        }
        .sortBy { case (w, _, _, score) => (-score, w) }
        .take(TextAnalysis.TopicWordsK)
        .zipWithIndex
        .map { case ((w, cnt, df, score), i) =>
          (src, i + 1L, w, cnt, df, score)
        }
    }.toSet
    val got = TextAnalysis.topicWords(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == expected)
    // distinctiveness: the rank surfaces genuinely non-ubiquitous
    // words (score > 0 ⇔ df < |sources|) somewhere in the report
    assert(got.exists(_._6 > 0.0), "every top word is corpus-ubiquitous")
  }
}

/** Local alias so the spec reads clearly. */
private object MrJobsTokens {
  def tokenize(text: String): List[String] = graft.mr.MrJobs.tokenize(text)

}
