package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The prefix-filtering exact Jaccard join (AllPairs/PPJoin family):
  * result equality with the inverted-join baseline, the completeness
  * theorem on a crafted worst case, and the candidate-economy
  * property that justifies it as the exact-dedup scale path.
  */
class PrefixFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filter join result equals the df-capped inverted join exactly") {
    for (dir <- Seq(sfTiny, sfSmall)) {
      val base = pairs(DedupOps.ngramJaccard(spark, dir))
      val pf = pairs(DedupOps.prefixFilterJaccard(spark, dir))
      assert(pf == base, s"result sets differ at $dir")
      assert(pf.nonEmpty, s"no near-dup pairs at $dir — fixture degenerate")
    }
  }

  test("completeness at the exact threshold: J = 0.8 pairs survive the prefix cut") {
    import spark.implicits._
    // two docs sharing exactly 8 of 10 shingles each: J = 8/12 < 0.8;
    // and two docs sharing 9 of 10: J = 9/11 < 0.8; the boundary case
    // J = 0.8 needs |A|=9,|B|=9,inter=8 (8/10 = 0.8). Build token
    // streams whose 3-gram shingle sets have that structure: doc 1
    // and doc 2 share an 11-token run (9 shingles, 8 shared after one
    // end-token differs... simpler: construct directly via distinct
    // token sentences where consecutive-3 windows are unique).
    // a1..a11 gives shingles (a1 a2 a3)..(a9 a10 a11) = 9 shingles;
    // doc B = a1..a10 b  keeps the first 8 and changes the 9th →
    // |A|=9, |B|=9, inter=8, J = 8/10 = 0.8 exactly.
    // letters only: the tokenizer is [a-z]+ (digits would split)
    val aToks = ('a' to 'k').map(c => s"t$c")
    val bToks = ('a' to 'j').map(c => s"t$c") :+ "zz"
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-pf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = pairs(DedupOps.prefixFilterJaccard(spark, dir))
    assert(got == Set((1L, 2L, 0.8)),
      s"exact-threshold pair lost or mangled: $got")
  }

  test("ppjoin equals the prefix filter and the df-capped baseline exactly") {
    for (dir <- Seq(sfTiny, sfSmall)) {
      val base = pairs(DedupOps.ngramJaccard(spark, dir))
      val pp = pairs(DedupOps.ppjoinJaccard(spark, dir))
      assert(pp == base, s"ppjoin result diverged at $dir")
      assert(pp.nonEmpty, s"no near-dup pairs at $dir")
    }
  }

  test("positional+length filters prune candidates but never results") {
    // the economy that justifies the PPJoin rung: its candidate set
    // must be a subset of the plain prefix filter's — and on the
    // fixture a strict one (some pair must actually be pruned by the
    // positional or length bound, else the rung is dead code here)
    for (dir <- Seq(sfTiny, sfSmall)) {
      val prefixCand = DedupOps.prefixFilterCandidates(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ppCand = DedupOps.ppjoinCandidates(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ppCand.subsetOf(prefixCand),
        s"ppjoin candidates not a subset at $dir")
      // every verified result pair must still be among the candidates
      val results = pairs(DedupOps.ngramJaccard(spark, dir))
        .map(p => (p._1, p._2))
      assert(results.subsetOf(ppCand),
        s"a qualifying pair was pruned at $dir — completeness broken")
    }
  }

  test("positional filter prunes low-J candidates the prefix filter keeps") {
    import spark.implicits._
    // A fixture where the prefix filter PROVABLY over-generates and
    // the positional filter provably repairs it. Two duplicated docs
    // X (×2) and Y (×2); Y = X with the last 5 of 32 tokens replaced,
    // so each side has u = 5 unique shingles of n = 30 and they share
    // 25: J = 25/35 ≈ 0.714 < 0.8. Duplication makes every SHARED
    // shingle df = 4 and every unique one df = 2, so the rarity order
    // puts the 5 unique keys first and the prefix (30 − 24 + 1 = 7
    // keys) necessarily includes 2 shared keys — and both docs draw
    // them from the SAME 25-key shared set under the same global
    // order, so the cross pairs (X, Y) enter the candidate set
    // deterministically. The positional bound then kills them: the
    // first shared key sits at rank i = j = 6, so
    // 1 + min(30−6, 30−6) = 25 < ⌈4·60/9⌉ = 27 — pruned with no set
    // lookup, while the duplicate pairs (rank-1 first shared key,
    // bound 30 ≥ 27) survive. Exactly the economy PPJoin adds.
    val xToks = ('a' to 'z').map(c => s"t$c") ++
      Seq("tza", "tzb", "tzc", "tzd", "tze", "tzf")
    val yToks = xToks.dropRight(5) ++ Seq("zaa", "zab", "zac", "zad", "zae")
    assert(xToks.length == 32 && yToks.length == 32)
    val docs = Seq(
      (1L, xToks.mkString(" ")), (2L, xToks.mkString(" ")),
      (3L, yToks.mkString(" ")), (4L, yToks.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-pos").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prefixCand = DedupOps.prefixFilterCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ppCand = DedupOps.ppjoinCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(cross.subsetOf(prefixCand),
      s"prefix filter lost the planted cross candidates: $prefixCand")
    assert(ppCand.intersect(cross).isEmpty,
      s"positional filter failed to prune the J=0.714 pairs: $ppCand")
    assert(ppCand == Set((1L, 2L), (3L, 4L)),
      s"duplicate pairs mangled: $ppCand")
    // and the verified outputs agree (both return only the J=1 pairs)
    assert(pairs(DedupOps.ppjoinJaccard(spark, dir)) ==
      pairs(DedupOps.prefixFilterJaccard(spark, dir)))
  }

  test("ppjoin keeps the exact-threshold J = 0.8 boundary pair") {
    import spark.implicits._
    // same construction as the prefix-filter boundary test: |A|=9,
    // |B|=9, inter=8 → J = 8/10 = 0.8 exactly; the positional bound
    // must not prune it (first shared key is rank 1 in both docs →
    // bound 1 + min(8, 8) = 9 ≥ ⌈4·18/9⌉ = 8)
    val aToks = ('a' to 'k').map(c => s"t$c")
    val bToks = ('a' to 'j').map(c => s"t$c") :+ "zz"
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-pp").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = pairs(DedupOps.ppjoinJaccard(spark, dir))
    assert(got == Set((1L, 2L, 0.8)),
      s"exact-threshold pair lost or mangled by ppjoin: $got")
  }

  test("asymmetric containment prefix filter equals the df-capped baseline") {
    for (dir <- Seq(sfTiny, sfSmall)) {
      val base = pairs(DedupOps.containmentPairs(spark, dir))
      val pf = pairs(DedupOps.containmentPrefixFilter(spark, dir))
      assert(pf == base, s"containment result sets differ at $dir")
      assert(pf.nonEmpty, s"no containment pairs at $dir")
    }
  }

  test("containment ppjoin equals the df-capped baseline exactly") {
    for (dir <- Seq(sfTiny, sfSmall)) {
      val base = pairs(DedupOps.containmentPairs(spark, dir))
      val pp = pairs(DedupOps.containmentPpjoin(spark, dir))
      assert(pp == base, s"containment ppjoin result diverged at $dir")
      assert(pp.nonEmpty, s"no containment pairs at $dir")
    }
  }

  test("asymmetric length+positional filters prune candidates but never results") {
    for (dir <- Seq(sfTiny, sfSmall)) {
      val prefixCand = DedupOps.containmentPrefixCandidates(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ppCand = DedupOps.containmentPpjoinCandidates(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ppCand.subsetOf(prefixCand),
        s"containment ppjoin candidates not a subset at $dir")
      val results = pairs(DedupOps.containmentPairs(spark, dir))
        .map(p => (p._1, p._2))
      assert(results.subsetOf(ppCand),
        s"a qualifying directed pair was pruned at $dir — completeness broken")
    }
  }

  test("asymmetric positional filter prunes a deep-suffix candidate; C = 0.9 boundary survives") {
    import spark.implicits._
    // Doc 1 (A): [shared window sa sb sc] + 29 boilerplate tokens →
    // 30 shingles: the shared 3-gram (df 2: docs 1 and 2 only), two
    // A-unique bridge shingles (df 1), 27 boilerplate (df 4: docs
    // 1,3,4,5). Rarity order: [bridge, bridge, shared, boiler...], so
    // A's t=0.9 prefix (30 − 27 + 1 = 4 keys) contains the shared key
    // at rank 3 → (1→2) IS a plain asymmetric-prefix candidate (and
    // passes the length filter: nb = 30 ≥ ⌈0.9·30⌉ = 27). Doc 2 (B)
    // buries the shared window at the END of 29 unique tokens, so the
    // shared key ranks LAST of B's 30 (29 df-1 keys first): the
    // positional bound 1 + min(30−3, 30−30) = 1 < 27 prunes it with
    // no set lookup — C(1→2) = 1/30 anyway. Docs 3,4,5 = boilerplate
    // only (27 shingles): C(3→1) = 27/27 = 1.0 and C(1→3) = 27/30 =
    // exactly 0.9 — the threshold boundary — whose positional bound
    // 1 + min(30−4, 27−1) = 27 ≥ 27 must survive.
    val shared = Seq("sa", "sb", "sc")
    val boiler = ('a' to 'z').map("b" + _) ++ Seq("bza", "bzb", "bzc")
    val uniq = ('a' to 'z').map("u" + _) ++ Seq("uza", "uzb", "uzc")
    assert(boiler.length == 29 && uniq.length == 29)
    val docs = Seq(
      (1L, (shared ++ boiler).mkString(" ")),
      (2L, (uniq ++ shared).mkString(" ")),
      (3L, boiler.mkString(" ")),
      (4L, boiler.mkString(" ")),
      (5L, boiler.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-cpos").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prefixCand = DedupOps.containmentPrefixCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ppCand = DedupOps.containmentPpjoinCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixCand.contains((1L, 2L)),
      s"plain prefix lost the planted deep-suffix candidate: $prefixCand")
    assert(!ppCand.contains((1L, 2L)),
      s"positional filter failed to prune the C=1/30 candidate: $ppCand")
    val expect = Set(
      (3L, 4L), (4L, 3L), (3L, 5L), (5L, 3L), (4L, 5L), (5L, 4L),
      (3L, 1L), (4L, 1L), (5L, 1L)).map(p => (p._1, p._2, 1.0)) ++
      Set((1L, 3L), (1L, 4L), (1L, 5L)).map(p => (p._1, p._2, 0.9))
    val got = pairs(DedupOps.containmentPpjoin(spark, dir))
    assert(got == expect, s"boundary containment pairs mangled: $got")
    assert(got == pairs(DedupOps.containmentPairs(spark, dir)),
      "ppjoin diverged from the baseline on the crafted fixture")
  }

  test("multi-witness filter prunes single-shared-shingle pairs the positional bound keeps") {
    import spark.implicits._
    // The dominant spurious-candidate class: two docs sharing exactly
    // ONE rare shingle that ranks early in both — the positional
    // bounds CANNOT touch it (first common key at ra=rb=3 gives bound
    // 1 + min(27, 27) = 28 ≥ T = 27), only the witness count can.
    // A = [sa sb sc] + boiler1 (29 toks shared with docs 3,4), so A's
    // 30 shingles rank: 2 df-1 bridges, the df-2 shared window, then
    // 27 df-3 boiler. B mirrors it over boiler2 (docs 5,6). The pair
    // (A→B) shares only the (sa sb sc) shingle — C = 1/30 — passes
    // length + both positional bounds, and MUST die on witnesses < 2.
    // Meanwhile C(A→3) = 27/30 = 0.9 exactly (threshold boundary,
    // witnesses = the 2 boiler keys at ext-prefix ranks 4 and 5, row
    // bounds holding with EQUALITY: ra = 3+i, rb = i, na−T = 3) must
    // survive — the same fixture exercises both edges.
    val shared = Seq("sa", "sb", "sc")
    val boiler1 = ('a' to 'z').map("b" + _) ++ Seq("bza", "bzb", "bzc")
    val boiler2 = ('a' to 'z').map("c" + _) ++ Seq("cza", "czb", "czc")
    val docs = Seq(
      (1L, (shared ++ boiler1).mkString(" ")),
      (2L, (shared ++ boiler2).mkString(" ")),
      (3L, boiler1.mkString(" ")), (4L, boiler1.mkString(" ")),
      (5L, boiler2.mkString(" ")), (6L, boiler2.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-wit").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prefixCand = DedupOps.containmentPrefixCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ppCand = DedupOps.containmentPpjoinCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixCand.contains((1L, 2L)) && prefixCand.contains((2L, 1L)),
      s"plain prefix lost the planted one-witness candidate: $prefixCand")
    assert(!ppCand.contains((1L, 2L)) && !ppCand.contains((2L, 1L)),
      s"witness filter failed to prune the C=1/30 pair: $ppCand")
    // the C = 0.9 boundary pairs survive and the rung stays exact
    val got = pairs(DedupOps.containmentPpjoin(spark, dir))
    val boundary = Set((1L, 3L, 0.9), (1L, 4L, 0.9), (2L, 5L, 0.9), (2L, 6L, 0.9))
    assert(boundary.subsetOf(got), s"C=0.9 boundary pair lost: $got")
    assert(got == pairs(DedupOps.containmentPairs(spark, dir)),
      "witness-filtered rung diverged from the baseline")
  }

  test("the prefix bag is a small fraction of the full shingle bag (candidate economy)") {
    // the economy claim behind the operator: at t = 0.8 each doc
    // contributes ~20% of its shingles as join keys, so the candidate
    // join's input bag — and with rarest-first ordering, its per-key
    // fan-out — is a fraction of the full inverted join's
    val toks = graft.text.TextOps.tokens(col("text"))
    val perDoc = graft.Tables.documents(spark, sfSmall)
      .select(size(DedupOps.shingleSet(toks)).cast("long").as("n"))
      .filter(col("n") > 0)
    val Array(full, prefix) = perDoc
      .select(sum(col("n")), sum(col("n") - expr("(4 * n + 4) div 5") + 1))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(prefix * 3 < full, s"prefix bag $prefix not ≪ full bag $full")
  }
}
