package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Exact differential check for the BPE trainer: the distributed loop
  * must produce the identical merge sequence as [[Bpe.trainLocal]]
  * over the same word counts (the iteration is not SQL-expressible,
  * so this local recompute plays the oracle's role).
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  test("distributed merge sequence equals the local recompute exactly") {
    val vocab = Tables.documents(spark, sfTiny)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Bpe.trainLocal(vocab, Bpe.Merges)
      .zipWithIndex.map { case ((a, b, f), i) => (i + 1L, a, b, f) }
    val got = Bpe.bpeMerges(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"merge sequences differ:\n got=$got\n exp=$expected")
    assert(got.size == Bpe.Merges, "fixture vocabulary exhausted early")
  }

  test("bpe_encode equals the local recompute exactly") {
    val docWords = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val vocab = docWords.groupBy(_._2).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val merges = Bpe.trainLocal(vocab, Bpe.Merges).map { case (a, b, _) => (a, b) }
    val segLen = vocab.map { case (w, _) =>
      w -> merges.foldLeft(w.map(_.toString).toVector) {
        case (v, (a, b)) => Bpe.mergeOnce(v, a, b)
      }.length.toLong
    }.toMap
    val expected = docWords.groupBy(_._1).map { case (doc, ws) =>
      (doc, ws.size.toLong,
        ws.map(_._2.length.toLong).sum,
        ws.map(w => segLen(w._2)).sum)
    }.toSet
    val got = Bpe.bpeEncode(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("bpe_fertility equals the local recompute exactly") {
    val srcWords = Tables.documents(spark, sfTiny)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val vocab = srcWords.groupBy(_._2).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val merges = Bpe.trainLocal(vocab, Bpe.Merges).map { case (a, b, _) => (a, b) }
    val segLen = vocab.map { case (w, _) =>
      w -> merges.foldLeft(w.map(_.toString).toVector) {
        case (v, (a, b)) => Bpe.mergeOnce(v, a, b)
      }.length.toLong
    }.toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = srcWords.groupBy(_._1).map { case (src, ws) =>
      val nWords = ws.size.toLong
      val nChars = ws.map(_._2.length.toLong).sum
      val nBpe = ws.map(w => segLen(w._2)).sum
      (src, nWords, nBpe, round6(nBpe.toDouble / nWords),
        round6(nChars.toDouble / nBpe))
    }.toSet
    val got = Bpe.bpeFertility(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got == expected)
    // fertility sanity: at least one token per word, no more than
    // one per character
    got.foreach { case (src, _, _, fert, cpt) =>
      assert(fert >= 1.0, s"$src fertility < 1")
      assert(cpt >= 1.0, s"$src chars/token < 1")
    }
  }

  test("mergeOnce is greedy left-to-right and non-overlapping") {
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
    assert(Bpe.mergeOnce(Vector("x"), "a", "b") == Vector("x"))
    assert(Bpe.mergeOnce(Vector.empty, "a", "b") == Vector.empty)
  }
}
