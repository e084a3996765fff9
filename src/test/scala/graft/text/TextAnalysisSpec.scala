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
}

/** Local alias so the spec reads clearly. */
private object MrJobsTokens {
  def tokenize(text: String): List[String] = graft.mr.MrJobs.tokenize(text)
}
