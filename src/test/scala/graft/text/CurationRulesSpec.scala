package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Local recomputes of the curation-scoring operators at sf0.001 —
  * the same shape as TextAnalysisSpec: collect the tiny fixture,
  * recompute the metric in plain Scala, compare (with a 1e-9
  * tolerance where doubles round differently than the engine's
  * 6-decimal policy).
  */
class CurationRulesSpec extends AnyFunSuite {
  import TestSpark._

  private def tokenize(t: String): List[String] = MrJobsTokens.tokenize(t)
  private def round6(d: Double): Double = math.round(d * 1e6) / 1e6

  private lazy val docs: Map[Long, String] = {
    import spark.implicits._
    Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
  }

  test("gopher_rules matches a local recompute of every rule") {
    import spark.implicits._
    val got = CurationRules.gopherRules(spark, sfTiny)
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "n_stop_types", "keep")
      .as[(Long, Long, Double, Double, Long, Boolean)].collect()
    assert(got.length == docs.size)
    got.foreach { case (id, nWords, meanLen, symRatio, nStop, keep) =>
      val toks = tokenize(docs(id))
      assert(nWords == toks.size)
      val expMean = round6(toks.map(_.length).sum.toDouble / math.max(toks.size, 1))
      assert(math.abs(meanLen - expMean) < 1e-9, s"doc $id mean_word_len")
      val text = docs(id)
      val expSym = round6(
        text.count(c => !c.isLetterOrDigit && !c.isWhitespace).toDouble /
          math.max(text.length, 1))
      assert(math.abs(symRatio - expSym) < 1e-9, s"doc $id symbol_ratio")
      val expStop = TextAnalysis.stopwords.count(toks.contains)
      assert(nStop == expStop, s"doc $id n_stop_types")
      val expKeep = nWords >= 50 && nWords <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 && symRatio < 0.1 && nStop >= 2
      assert(keep == expKeep, s"doc $id keep")
    }
    assert(got.exists(_._6) && got.exists(!_._6),
      "fixture should exercise both keep outcomes")
  }

  test("bm25_score matches a local recompute") {
    import spark.implicits._
    val qterms = Seq("spark", "join", "stream")
    val (k1, b) = (1.2, 0.75)
    val dl = docs.map { case (id, t) => id -> tokenize(t).size }
    val n = docs.size
    val avgdl = round6(dl.values.sum.toDouble / n)
    val tf = docs.toSeq.flatMap { case (id, t) =>
      tokenize(t).filter(qterms.contains).groupBy(identity)
        .map { case (term, g) => (id, term) -> g.size }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, g) => t -> g.size }
    val idf = df.map { case (t, d) =>
      t -> round6(math.log((n - d + 0.5) / (d + 0.5) + 1.0))
    }
    val expected = tf.groupBy(_._1._1).map { case (id, g) =>
      id -> BigDecimal(g.map { case ((_, t), f) =>
        BigDecimal(round6(idf(t) * f * (k1 + 1) /
          (f + k1 * (1 - b + b * dl(id).toDouble / avgdl))))
      }.sum.toDouble).toDouble
    }
    val got = CurationRules.bm25(spark, sfTiny)
      .select("doc_id", "n_terms_hit", "bm25")
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (id, hits, score) =>
      assert(hits == tf.keys.count(_._1 == id), s"doc $id n_terms_hit")
      assert(math.abs(score - expected(id)) < 1e-6, s"doc $id bm25")
    }
  }

  test("span_dup_fraction matches a local recompute and flags planted dups") {
    import spark.implicits._
    val spans = docs.map { case (id, t) =>
      val toks = tokenize(t)
      id -> (if (toks.size < 8) Set.empty[String]
             else toks.sliding(8).map(_.mkString(" ")).toSet)
    }
    val freq = spans.values.flatten.groupBy(identity).map { case (s, g) => s -> g.size }
    val got = CurationRules.spanDupFraction(spark, sfTiny)
      .select("doc_id", "n_spans", "n_shared", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == docs.size)
    got.foreach { case (id, nSpans, nShared, frac) =>
      assert(nSpans == spans(id).size, s"doc $id n_spans")
      val expShared = spans(id).count(s => freq(s) >= 2)
      assert(nShared == expShared, s"doc $id n_shared")
      assert(math.abs(frac - round6(
        expShared.toDouble / math.max(nSpans, 1))) < 1e-9, s"doc $id dup_frac")
    }
    assert(got.exists(_._4 > 0), "fixture's planted dups should share spans")
  }

  test("dsir_weights matches a local recompute of the bucket LM ratio") {
    import spark.implicits._
    val sources = Tables.documents(spark, sfTiny)
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val all = docs.toSeq.flatMap { case (id, t) => tokenize(t).map(tok => (id, bucket(tok))) }
    val raw = all.groupBy(_._2).map { case (b, g) => b -> g.size }
    val tgtTok = all.filter { case (id, _) => sources(id) == "src0" }
    val tgt = tgtTok.groupBy(_._2).map { case (b, g) => b -> g.size }
    val (nr, nt) = (all.size, tgtTok.size)
    val lr = raw.map { case (bk, cr) =>
      bk -> BigDecimal(round6(math.log(
        ((tgt.getOrElse(bk, 0) + 1).toDouble / (nt + 64)) /
          ((cr + 1).toDouble / (nr + 64)))))
    }
    val expected = all.groupBy(_._1).map { case (id, g) =>
      id -> g.map(x => lr(x._2)).sum.toDouble
    }
    val got = CurationRules.dsirWeights(spark, sfTiny)
      .select("doc_id", "n_tokens", "dsir_weight")
      .as[(Long, Long, Double)].collect()
    assert(got.length == docs.size)
    got.foreach { case (id, nTok, w) =>
      assert(nTok == tokenize(docs(id)).size, s"doc $id n_tokens")
      assert(math.abs(w - expected.getOrElse(id, 0.0)) < 1e-6, s"doc $id weight")
    }
  }

  test("blocklist_filter counts distinct blocked terms, repeats count once") {
    import spark.implicits._
    val blocklist = Set("slow", "dup", "spill")
    val got = CurationRules.blocklistFilter(spark, sfTiny)
      .select("doc_id", "n_blocked", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == docs.size)
    got.foreach { case (id, n, keep) =>
      val hitTypes = tokenize(docs(id)).toSet.intersect(blocklist)
      assert(n == hitTypes.size, s"doc $id n_blocked (distinct types, not occurrences)")
      assert(keep == hitTypes.isEmpty, s"doc $id keep")
    }
    assert(got.exists(!_._3), "fixture should contain blocked docs")
    // "spill" never occurs: nothing can reach the full list size of 3
    assert(got.forall(_._2 < 3), "absent term must never count")
  }

  test("quality_threshold_per_source: k-th-largest threshold, ties kept") {
    import spark.implicits._
    val bySource = Tables.documents(spark, sfTiny)
      .select("doc_id", "source").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val score = docs.map { case (id, t) =>
      val toks = tokenize(t)
      id -> round6(toks.distinct.size.toDouble / math.max(toks.size, 1))
    }
    val got = CurationRules.qualityThresholdPerSource(spark, sfTiny)
      .select("source", "n_docs", "k", "threshold", "kept")
      .as[(String, Long, Long, Double, Long)].collect()
    assert(got.length == bySource.size)
    got.foreach { case (src, nDocs, k, thr, kept) =>
      val scores = bySource(src).map(score).sorted(Ordering[Double].reverse)
      assert(nDocs == scores.size, s"$src n_docs")
      assert(k == (scores.size + 4) / 5, s"$src k = ceil(n/5)")
      assert(thr == scores(k.toInt - 1), s"$src threshold is the k-th largest score")
      assert(kept == scores.count(_ >= thr), s"$src kept includes ties")
      assert(kept >= k, s"$src kept >= k (ties only ever widen the cut)")
    }
  }
}
