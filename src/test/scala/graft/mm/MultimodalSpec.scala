package graft.mm

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Pins the mapPartitions feature extractor (no SQL oracle — the fake
  * decode is JVM code) and the payload schema plumbing.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("mm_features: deterministic fake decode matches a local recompute") {
    import spark.implicits._
    val feats = MultimodalOps.mmFeatures(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getSeq[Float](3)))
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(feats.length == docs.size)
    feats.foreach { case (id, nBytes, meanByte, emb) =>
      val bytes = docs(id).getBytes("UTF-8")
      assert(nBytes == bytes.length)
      val mean = bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
      assert(math.abs(meanByte - math.round(mean * 1e6) / 1e6) < 1e-12)
      assert(emb.length == 16)
      assert(math.abs(emb.map(_.toDouble).sum - 1.0) < 1e-3,
        "histogram embedding should sum to ~1")
    }
  }

  test("payload schema: binary column + typed metadata struct") {
    val df = MultimodalOps.withPayload(Tables.documents(spark, sfTiny))
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType
    assert(meta.typeName == "struct")
    assert(df.selectExpr("meta.origin", "meta.tag", "meta.declared_size")
      .count() > 0)
  }

  test("frame sampling covers start and end of the payload") {
    import spark.implicits._
    val frames = MultimodalOps.mmFrameSample(spark, sfTiny).collect()
    val byDoc = frames.groupBy(_.getLong(0))
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
      val text = docs(id)
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val first = fs.find(_.getInt(1) == 0).get.getString(2)
      val last = fs.find(_.getInt(1) == 3).get.getString(2)
      assert(first == md5hex(text.substring(0, 32)))
      assert(last == md5hex(text.substring(text.length - 32)))
    }
  }

  test("resize keeps every 4th byte and fingerprints the downsampled payload") {
    import org.apache.spark.sql.functions.col
    val texts = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    val got = MultimodalOps.mmResize(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.map(_._1).toSet == texts.keySet)
    got.foreach { case (id, n, nr, m) =>
      val bytes = texts(id).getBytes("UTF-8")
      val small = Iterator.range(0, bytes.length, 4).map(bytes).toArray
      assert(n == bytes.length.toLong && nr == small.length.toLong, s"doc $id sizes")
      assert(m == md5hex(small), s"doc $id fingerprint")
    }
  }

  test("waveform stats match a local PCM recompute") {
    import org.apache.spark.sql.functions.col
    val texts = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = MultimodalOps.mmWaveform(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    got.foreach { case (id, n, rms, peak, silence) =>
      val amps = texts(id).getBytes("UTF-8").map(b => ((b & 0xff) - 128).toLong)
      assert(n == amps.length.toLong)
      assert(rms == round6(math.sqrt(
        amps.map(a => a * a).sum.toDouble / math.max(amps.length, 1))))
      assert(peak == (if (amps.isEmpty) 0L else amps.map(math.abs).max))
      assert(silence == round6(
        amps.count(a => math.abs(a) < 8).toDouble / math.max(amps.length, 1)))
    }
  }

  test("patch tiling matches a local strided-gather recompute") {
    import org.apache.spark.sql.functions.col
    val texts = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    val got = MultimodalOps.mmPatches(spark, sfTiny).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getDouble(3), r.getString(4)))).toMap
    val expected = texts.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val gridH = bytes.length / 16 / 8
      for (pr <- 0 until gridH; pc <- 0 until 2) yield {
        val patch = (for (r <- 0 until 8; c <- 0 until 8)
          yield bytes((pr * 8 + r) * 16 + pc * 8 + c)).toArray
        ((id, pr.toLong, pc.toLong),
          (patch.map(_ & 0xff).sum / 64.0, md5hex(patch)))
      }
    }
    assert(got == expected)
    // a doc must produce a full 2-D grid (both patch columns and
    // multiple rows), or the strided indexing is untested
    assert(got.keys.exists(_._3 == 1L), "no second patch column")
    assert(got.keys.exists(_._2 >= 2L), "no third patch row")
  }

  test("VAD segments are exactly the local maximal voiced runs") {
    import org.apache.spark.sql.functions.col
    val texts = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = texts.flatMap { case (id, text) =>
      val voiced = text.getBytes("UTF-8")
        .map(b => math.abs((b & 0xff) - 128) >= 8)
      val runs = scala.collection.mutable.Buffer[(Long, Long)]()
      var start = -1
      for (i <- 0 to voiced.length) {
        val v = i < voiced.length && voiced(i)
        if (v && start < 0) start = i
        if (!v && start >= 0) {
          if (i - start >= 4) runs += ((start.toLong, (i - start).toLong))
          start = -1
        }
      }
      runs.zipWithIndex.map { case ((st, len), k) => (id, k + 1L, st, len) }
    }.toSet
    val got = MultimodalOps.mmVadSegments(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // silence must actually split segments somewhere, or the island
    // logic degenerates to one run per payload
    assert(got.exists(_._2 >= 2L), "no payload with a second segment")
  }
}
