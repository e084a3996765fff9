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

  test("asymmetric containment prefix filter equals the df-capped baseline") {
    for (dir <- Seq(sfTiny, sfSmall)) {
      val base = pairs(DedupOps.containmentPairs(spark, dir))
      val pf = pairs(DedupOps.containmentPrefixFilter(spark, dir))
      assert(pf == base, s"containment result sets differ at $dir")
      assert(pf.nonEmpty, s"no containment pairs at $dir")
    }
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
