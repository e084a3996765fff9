package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.text.TextAnalysis

/** Round-3 pipeline operators: SCD-2 intervals, bloom-prefiltered
  * join, stratified sampling.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("scd2 intervals tile each user's timeline with no adjacent duplicates") {
    val rows = WindowOps.scd2Intervals(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, g) =>
      val sorted = g.sortBy(_._3.getTime)
      // exactly one open interval per user, and it is the last one
      assert(g.count(_._4.isEmpty) == 1, s"user $u open intervals != 1")
      assert(sorted.last._4.isEmpty, s"user $u open interval not last")
      // each interval closes exactly where the next begins
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3), s"user $u intervals don't tile")
        assert(a._2 != b._2, s"user $u adjacent intervals share status ${a._2}")
      }
    }
  }

  test("scd2 interval count equals the change-point count") {
    val events = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val expected = events.groupBy(_._1).map { case (_, g) =>
      val types = g.sortBy(e => (e._3.getTime, e._4)).map(_._2)
      1 + types.zip(types.tail).count { case (a, b) => a != b }
    }.sum
    assert(WindowOps.scd2Intervals(spark, sfSmall).count() == expected)
  }

  test("bloom prefilter join equals the plain join and actually prefilters") {
    val got = Joins.joinBloom(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val dim = Tables.customer(spark, sfSmall).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = Tables.orders(spark, sfSmall)
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == plain)
    // the sketch must reject most fact rows before the join: at 1% fpp
    // the pass-through count is ~|matching| + 1% of the rest
    val bf = dim.stat.bloomFilter("c_custkey", 100000L, 0.01)
    val mightContain = udf((k: Long) => bf.mightContain(k))
    val total = Tables.orders(spark, sfSmall).count()
    val passed = Tables.orders(spark, sfSmall)
      .filter(mightContain(col("o_custkey"))).count()
    val matching = Tables.orders(spark, sfSmall)
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(passed < total / 2, s"bloom passed $passed of $total rows")
    assert(passed >= matching, "bloom dropped a true match (impossible)")
  }

  test("repetition_ratio matches a local recompute") {
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = TextAnalysis.repetitionRatio(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val expected = docs.flatMap { case (id, text) =>
      val g3 = graft.mr.MrJobs.tokenize(text).sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toVector
      if (g3.isEmpty) None
      else Some(id -> (g3.length.toLong, g3.distinct.length.toLong,
        math.round((1d - g3.distinct.length.toDouble / g3.length) * 1e6) / 1e6))
    }
    assert(got == expected)
  }

  test("quality_filter labels agree with its own metrics") {
    val rows = TextAnalysis.qualityFilter(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getString(4)))
    assert(rows.nonEmpty)
    val reasons = rows.map(_._5).distinct.toSet
    assert(reasons.contains("ok") && reasons.size > 1,
      s"filter is degenerate: only $reasons")
    rows.foreach { case (id, nTok, rep, keep, reason) =>
      val want =
        if (nTok < 30) "too_short"
        else if (nTok > 90) "too_long"
        else if (rep > 0.02) "repetitive"
        else "ok"
      assert(reason == want, s"doc $id labeled $reason, metrics say $want")
      assert(keep == (reason == "ok"))
    }
  }

  test("decontaminate finds exactly the train/eval pairs sharing a 5-gram") {
    def shingles(text: String): Set[String] =
      graft.mr.MrJobs.tokenize(text).sliding(5).filter(_.size == 5)
        .map(_.mkString(" ")).toSet
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), shingles(r.getString(1))))
    val (ev, tr) = docs.partition(_._1 < 20)
    val expected = (for {
      (tid, ts) <- tr; (eid, es) <- ev
      n = (ts intersect es).size if n > 0
    } yield (tid, eid) -> n.toLong).toMap
    val rows = graft.dedup.DedupOps.decontaminate(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rows.map { case (k, v) => k -> v._1 } == expected)
    rows.foreach { case (_, (n, severe)) => assert(severe == (n >= 10)) }
  }

  test("curate_pipeline output satisfies every gate it claims to apply") {
    val kept = graft.dedup.DedupOps.curatePipeline(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(kept.nonEmpty)
    val keptIds = kept.map(_._1).toSet
    // never an eval doc
    assert(keptIds.forall(_ >= 20))
    // every kept doc passes the quality gate
    val quality = TextAnalysis.qualityFilter(spark, sfSmall)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(quality))
    // no kept doc is a severely contaminated one
    val severe = graft.dedup.DedupOps.decontaminate(spark, sfSmall)
      .filter(col("severe")).collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(severe).isEmpty)
    // split labels agree with the hash-split buckets
    val splits = TextAnalysis.hashSplit(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    kept.foreach { case (id, _, split) => assert(split == splits(id)) }
    // the pipeline must actually drop something at each flavor of gate
    assert(keptIds.size < 480, "no attrition — gates are vacuous")
  }

  test("window_frames: trailing-hour sum and positional values are coherent") {
    val rows = WindowOps.windowFrames(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.length == 10000)
    val events = Tables.events(spark, sfSmall)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getTimestamp(3)))
    val byUser = events.groupBy(_._2)
    val firstLast = byUser.map { case (u, g) =>
      val ordered = g.sortBy(e => (e._4.getTime, e._1)).map(_._3)
      u -> (ordered.head, ordered.last,
        if (ordered.length >= 3) Some(ordered(2)) else None)
    }
    val userOf = events.map(e => e._1 -> e._2).toMap
    rows.foreach { case (eid, hourSum, firstV, lastV, thirdV) =>
      val (f, l, t) = firstLast(userOf(eid))
      assert(firstV == f && lastV == l && thirdV == t, s"event $eid positional mismatch")
      assert(!hourSum.isNaN)
    }
  }

  test("token_entropy is bounded by ln(n_distinct) and positive for mixed shards") {
    val rows = TextAnalysis.tokenEntropy(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20) // one row per fixture source shard
    rows.foreach { case (src, nd, nt, h) =>
      assert(nd >= 1 && nt >= nd)
      assert(h >= 0.0, s"$src entropy negative")
      assert(h <= math.log(nd.toDouble) + 1e-9,
        s"$src entropy $h exceeds uniform bound ${math.log(nd.toDouble)}")
    }
  }

  test("bootstrap resample has Poisson-shaped replication and is deterministic") {
    val rows = TextAnalysis.sampleBootstrap(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sfSmall).count()
    // every kept doc contributes exactly k rows numbered 1..k
    rows.groupBy(_._1).foreach { case (id, g) =>
      val k = g.head._2
      assert(g.forall(_._2 == k))
      assert(g.map(_._3).sorted.toSeq == (1L to k), s"doc $id replicas wrong")
    }
    // total replicas ≈ n (Poisson mean 1); wide band for a 500-doc fixture
    assert(math.abs(rows.length.toDouble / nDocs - 1.0) < 0.2,
      s"${rows.length} replicas for $nDocs docs")
    assert(rows.map(_._2).max <= 6)
    // deterministic
    val again = TextAnalysis.sampleBootstrap(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet)
  }

  test("zorder interleave matches a local bit recompute") {
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val rows = ScalarOps.zorderKey(spark, sfTiny).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 100)
    rows.foreach { case (p, s, z) =>
      assert(z == morton(p % 65536, s % 65536), s"zkey wrong for ($p, $s)")
    }
    // keys are in z-order (the clustering property the layout relies on)
    val zs = rows.map(_._3)
    assert(zs.zip(zs.tail).forall { case (a, b) => a <= b })
  }

  test("stratified sample respects per-language rates and is deterministic") {
    val docs = Tables.documents(spark, sfSmall)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.sampleStratified(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // buckets within the per-lang threshold
    val rates = Map("en" -> 200L, "zh" -> 600L, "es" -> 600L,
      "de" -> 600L, "fr" -> 600L)
    kept.foreach { case (id, lang, bucket) =>
      assert(bucket < rates.getOrElse(lang, 500L), s"doc $id bucket $bucket over rate")
    }
    // per-stratum keep fraction tracks the rate (md5 is uniform; the
    // fixture strata are small, so allow a wide but meaningful band)
    kept.groupBy(_._2).foreach { case (lang, g) =>
      val frac = g.length.toDouble / docs(lang)
      val want = rates(lang) / 1000.0
      assert(math.abs(frac - want) < 0.15, s"$lang kept $frac, wanted ~$want")
    }
    // deterministic: a second run keeps the identical doc set
    val again = TextAnalysis.sampleStratified(spark, sfSmall).collect()
      .map(r => r.getLong(0)).toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("chunking tiles every document with the declared size and stride") {
    val toks = Tables.documents(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> graft.mr.MrJobs.tokenize(r.getString(1)))
      .toMap
    val chunks = TextAnalysis.chunkDocs(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, g) =>
      val n = toks(id).length
      // chunk count = ceil(n / stride), indices contiguous from 0
      assert(g.length == (n + TextAnalysis.ChunkStride - 1) / TextAnalysis.ChunkStride)
      assert(g.map(_._2).sorted.toSeq == (0L until g.length.toLong))
      g.foreach { case (_, idx, text, nTok) =>
        val start = idx.toInt * TextAnalysis.ChunkStride
        val want = toks(id).slice(start, start + TextAnalysis.ChunkSize)
        assert(text == want.mkString(" "), s"doc $id chunk $idx text mismatch")
        assert(nTok == want.length)
      }
    }
    // docs with at least ChunkStride+1 tokens produce overlapping chunks
    val full = chunks.filter(c => c._4 == TextAnalysis.ChunkSize)
    assert(full.nonEmpty, "fixture has no full-size chunk")
  }

  test("pii redaction scrubs every synthetic contact and counts each kind") {
    val rows = TextAnalysis.redactPii(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 500)
    rows.foreach { case (id, red, ne, np, nip) =>
      assert(ne >= 1 && np >= 1 && nip >= 1, s"doc $id missed a PII kind")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
      assert(!red.contains("@"), s"doc $id leaked an email")
      assert(!red.contains("+1-555-"), s"doc $id leaked a phone")
      assert(!red.contains("10.0."), s"doc $id leaked an ip")
    }
  }

  test("collocation pmi matches a local recompute") {
    val bigrams = Tables.documents(spark, sfSmall).collect()
      .flatMap(r => graft.mr.MrJobs.tokenize(r.getString(1)).sliding(2)
        .filter(_.length == 2).map(w => (w.head, w(1))))
    val cXy = bigrams.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val cX = bigrams.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val cY = bigrams.groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val n = bigrams.length.toLong
    val got = TextAnalysis.collocationPmi(spark, sfSmall).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.nonEmpty)
    // exactly the >= 5 bigrams, with the exact PMI
    assert(got.keySet == cXy.filter(_._2 >= 5).keySet)
    got.foreach { case ((w1, w2), (c, pmi)) =>
      assert(c == cXy((w1, w2)))
      val want = math.log(c.toDouble * n / (cX(w1) * cY(w2)))
      assert(math.abs(pmi - want) < 1e-6, s"($w1,$w2) pmi $pmi vs $want")
    }
  }

  test("int8 quantization covers the full range and inverts within one step") {
    val q = graft.sim.SimOps.quantizeEmbeddings(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(q.forall(r => r._3 >= -128 && r._3 <= 127), "q outside int8")
    // every dimension hits both endpoints (min→-128, max→127)
    q.groupBy(_._2).foreach { case (d, g) =>
      assert(g.map(_._3).min == -128L, s"dim $d never hits -128")
      assert(g.map(_._3).max == 127L, s"dim $d never hits 127")
    }
    // dequantized values reconstruct the original within one bin width
    val emb = Tables.embeddings(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val dims = emb.values.head.indices
    val lo = dims.map(d => emb.values.map(_(d)).min)
    val hi = dims.map(d => emb.values.map(_(d)).max)
    q.foreach { case (id, dim, qv) =>
      val d = dim.toInt
      val step = (hi(d) - lo(d)) / 255
      val deq = lo(d) + (qv + 128) * step
      assert(math.abs(deq - emb(id)(d)) <= step * 0.5 + 1e-9,
        s"vec $id dim $d dequant error > half step")
    }
  }

  test("winsorization clips into the band and flags ~5% per side") {
    val rows = Aggregates.winsorizeValues(spark, sfSmall).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, g) =>
      val n = g.length.toDouble
      // a clipped row sits exactly on the band edge it crossed
      val loEdge = g.filter(_._4).map(_._3).distinct
      val hiEdge = g.filter(_._5).map(_._3).distinct
      assert(loEdge.length == 1 && hiEdge.length == 1, s"$et band edges not unique")
      // unclipped rows keep their value (to rounding)
      g.filterNot(r => r._4 || r._5).foreach { r =>
        assert(math.abs(r._3 - r._2) < 1e-6, s"$et unclipped row moved")
      }
      // ~5% clipped per side (exact percentile; wide tolerance for ties)
      assert(math.abs(g.count(_._4) / n - 0.05) < 0.02, s"$et low clip rate off")
      assert(math.abs(g.count(_._5) / n - 0.05) < 0.02, s"$et high clip rate off")
    }
  }

  test("approx top-k words equals the exact top-10 when capacity covers the vocab") {
    val exact = Tables.documents(spark, sfSmall).collect()
      .flatMap(r => graft.mr.MrJobs.tokenize(r.getString(1)))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val got = TextAnalysis.approxTopKWords(spark, sfSmall).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 10)
    // every sketch estimate is the exact count (capacity >> vocab)
    got.foreach { case (w, c) => assert(c == exact(w), s"$w est $c != exact") }
    // the returned counts are the 10 largest (set-compare is tie-robust)
    val top10 = exact.values.toSeq.sorted.reverse.take(10)
    assert(got.map(_._2).sorted.reverse.toSeq == top10)
  }

  test("feature hashing conserves token counts and buckets stay in range") {
    val rows = TextAnalysis.featureHashing(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(r => r._2 >= 0 && r._2 < TextAnalysis.HashDim))
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    Tables.documents(spark, sfSmall).collect().foreach { r =>
      val want = graft.mr.MrJobs.tokenize(r.getString(1)).length.toLong
      assert(perDoc.getOrElse(r.getLong(0), 0L) == want,
        s"doc ${r.getLong(0)} token count not conserved")
    }
    // the engine's bucket expression matches a local md5 recompute
    def localBucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % TextAnalysis.HashDim
    }
    import spark.implicits._
    val toks = graft.mr.MrJobs.tokenize(
      Tables.documents(spark, sfSmall).limit(5).collect()
        .map(_.getString(1)).mkString(" ")).distinct
    val sparkBuckets = toks.toDF("tok")
      .select(col("tok"), TextAnalysis.hashBucket(col("tok")).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach(t => assert(sparkBuckets(t) == localBucket(t),
      s"bucket mismatch for '$t'"))
  }

  test("skew report ranks the heaviest keys with consistent shares") {
    val rows = Aggregates.skewReport(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.length == 20)
    assert(rows.map(_._5).sorted.toSeq == (1L to 20L))
    val byRank = rows.sortBy(_._5)
    byRank.zip(byRank.tail).foreach { case (a, b) => assert(a._2 >= b._2) }
    val nKeys = Tables.events(spark, sfSmall).select("user_id").distinct().count()
    rows.foreach { case (_, _, share, skew, _) =>
      assert(math.abs(skew - share * nKeys) < 1e-4, "skew != share * n_keys")
    }
  }

  test("sessionization matches a per-user gap-rule recompute") {
    val events = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_id"), col("ts")).collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        (r.getLong(0), r.getLong(1), ts.getTime / 1000 * 1000000L + ts.getNanos / 1000)
      }
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(e => (e._3, e._2)).toSeq
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._3 - prev > WindowOps.SessionGapUs) seq += 1
        prev = e._3
        e._2 -> seq
      }
    }
    val got = WindowOps.sessionizeEvents(spark, sfSmall).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == want.toMap, "session ordinals diverge from recompute")
    assert(got.values.max > 1, "no user ever starts a second session")
  }

  test("event transitions conserve adjacency counts and p sums to one per state") {
    val rows = WindowOps.eventTransitions(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val nEvents = Tables.events(spark, sfSmall).count()
    val nUsers = Tables.events(spark, sfSmall).select("user_id").distinct().count()
    // every user with n events contributes n-1 transitions
    assert(rows.map(_._3).sum == nEvents - nUsers, "transition count off")
    rows.groupBy(_._1).foreach { case (from, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-4, s"$from probs don't sum to 1")
    }
  }

  test("cdc merge applies deletes, updates, inserts, and passes keeps through") {
    val base = Tables.customer(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> (r.getString(4), r.getDouble(3))).toMap
    val rows = Relational.cdcMerge(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    val nDel = base.keys.count(_ % 10 == 0)
    val nIns = base.keys.count(_ % 10 == 4)
    assert(rows.length == base.size - nDel + nIns, "row count after merge wrong")
    rows.foreach { case (k, seg, bal, op) =>
      op match {
        case "delete" => fail(s"deleted key $k survived")
        case "keep" =>
          assert(base(k) == ((seg, bal)), s"keep row $k mutated")
        case "update" =>
          assert(k % 10 >= 1 && k % 10 <= 3)
          assert(math.abs(bal - (base(k)._2 + 100)) < 0.005, s"update $k bal wrong")
        case "insert" =>
          val orig = -k - 1L
          assert(orig % 10 == 4 && base.contains(orig), s"insert $k not from feed")
          assert(math.abs(bal - (base(orig)._2 + 100)) < 0.005)
          assert(k < 0 && !base.contains(k), s"insert key $k collides with base")
      }
    }
    // no base key marked delete leaks through under its own key
    assert(rows.forall(r => r._1 < 0 || r._1 % 10 != 0))
  }

  test("table checksum matches a local recompute and ignores row order") {
    def hex15(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val rows = Tables.customer(spark, sfSmall).collect()
      .map(r => s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}|${r.getString(4)}")
    val want = rows.map(s => hex15(s) % 2147483647L).sum
    val got = Aggregates.tableChecksum(spark, sfSmall).collect().head
    assert(got.getLong(0) == rows.length)
    assert(got.getLong(1) == want, "checksum != local recompute")
    // commutative fold: any permutation gives the same sum by construction
    assert(scala.util.Random.shuffle(rows.toSeq)
      .map(s => hex15(s) % 2147483647L).sum == want)
  }

  test("funnel stages match an exact per-user recompute") {
    val events = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        // micros, not millis: getTime truncates sub-milli precision
        (r.getLong(0), r.getString(1),
          ts.getTime / 1000 * 1000000L + ts.getNanos / 1000)
      }
    val want = events.groupBy(_._1).flatMap { case (u, g) =>
      val first = (t: String, after: Long) =>
        g.filter(e => e._2 == t && e._3 > after).map(_._3).minOption
      first("view", Long.MinValue).map { tv =>
        val tc = first("click", tv)
        val tp = tc.flatMap(t => first("purchase", t))
        u -> (1 + tc.size + tp.size)
      }
    }
    val got = Relational.funnelConversion(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getLong(4).toInt).toMap
    assert(got == want, "funnel stages diverge from recompute")
    assert(got.values.exists(_ == 3) && got.values.forall(s => s >= 1 && s <= 3))
  }

  test("oov rate matches a local recompute against the top-20 vocab") {
    val toks = Tables.documents(spark, sfSmall)
      .select(col("source"), col("text")).collect()
      .flatMap(r => graft.mr.MrJobs.tokenize(r.getString(1)).map(r.getString(0) -> _))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(20).map(_._1).toSet
    val want = toks.groupBy(_._1).map { case (src, g) =>
      src -> (g.length.toLong, g.count(t => !vocab(t._2)).toLong)
    }
    val got = TextAnalysis.oovRate(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "OOV counts diverge from recompute")
    // the cutoff is real: some mass is out of vocabulary, most is in
    assert(got.values.exists(_._2 > 0) &&
      got.values.forall { case (n, oov) => oov < n })
  }

  test("mix weights sum to 1 and upweight tail languages") {
    val rows = TextAnalysis.sourceMixWeights(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "weights don't sum to 1")
    val total = rows.map(_._2).sum.toDouble
    // the fixture lang distribution is skewed (en ≈ 44%), so the
    // rebalancing must actually move weight, not just echo shares
    rows.foreach { case (lang, n, w, epochs) =>
      val p = n / total
      // temperature T=2 pulls every weight toward uniform: tail langs
      // sit above their natural share, head langs below
      if (p < 1.0 / rows.length) assert(w > p, s"$lang tail not upweighted")
      if (p > 1.0 / rows.length) assert(w < p, s"$lang head not damped")
      assert(math.abs(epochs - w * total / n) < 1e-4, s"$lang epochs wrong")
    }
    assert(rows.exists { case (_, n, w, _) => w < n / total - 1e-3 },
      "no head language was actually damped")
  }

  test("temperature sampler realizes the computed per-language keep rates") {
    val wts = TextAnalysis.sourceMixWeights(spark, sfSmall).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val maxW = wts.values.max
    val docs = Tables.documents(spark, sfSmall).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.sampleTemperature(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.map(_._1).distinct.length == kept.length, "duplicate docs")
    val byLang = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    docs.foreach { case (lang, n) =>
      val rate = math.floor(wts(lang) / maxW * 1000) / 1000.0
      val got = byLang.getOrElse(lang, 0L).toDouble / n
      // md5 buckets are uniform; 64+ docs per lang at sf0.01 → loose band
      assert(math.abs(got - rate) < 0.2, s"$lang kept $got, wanted ~$rate")
    }
    // the max-weight (head) language keeps everything; some tail
    // language is genuinely downsampled
    val maxLang = wts.maxBy(_._2)._1
    assert(byLang(maxLang) == docs(maxLang), "max-weight lang was sampled")
    assert(docs.exists { case (l, n) => byLang.getOrElse(l, 0L) < n },
      "sampler dropped nothing — degenerate mixture")
  }

  test("perplexity score matches a local unigram-LM recompute") {
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000L
    }
    val docs = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), graft.mr.MrJobs.tokenize(r.getString(1))))
    val tc = docs.filter(d => bucket(d._1) < 800).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = tc.values.sum
    val v = tc.size.toLong
    val got = TextAnalysis.perplexityScore(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getString(3)))
      .toMap
    docs.filter(_._2.nonEmpty).foreach { case (id, toks) =>
      val nll = toks.map(t =>
        -math.log((tc.getOrElse(t, 0L) + 1).toDouble / (n + v))).sum / toks.length
      val (gn, gnll, band) = got(id)
      assert(gn == toks.length, s"doc $id token count")
      // accumulation order differs; rounded values agree to the ulp band
      assert(math.abs(gnll - nll) < 1e-6, s"doc $id nll $gnll vs $nll")
      val wantBand =
        if (gnll < 3.40) "head" else if (gnll < 3.41) "middle" else "tail"
      assert(band == wantBand, s"doc $id band")
    }
    // the banding must actually separate the corpus
    assert(got.values.map(_._3).toSet.size == 3, "degenerate banding")
  }

  test("dup_count agrees with the verified pair list and covers the corpus") {
    val pairs = graft.dedup.DedupOps.verifiedPairs(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = graft.dedup.DedupOps.dupCount(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == Tables.documents(spark, sfSmall).count(),
      "every doc must carry an annotation")
    got.foreach { case (id, c) =>
      assert(c == want.getOrElse(id, 0L), s"doc $id count $c")
    }
    assert(got.values.exists(_ > 0), "fixture has planted near-dups")
    assert(got.values.count(_ == 0) > got.size / 2, "most docs unique")
  }

  test("anomaly z-scores match a local median/MAD recompute") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    val events = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = events.groupBy(_._2).view.mapValues(_.map(_._3).toSeq).toMap
    val got = Aggregates.anomalyZscore(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6)))
      .toMap
    assert(got.size == events.length, "every event must be scored")
    events.foreach { case (eid, uid, v) =>
      val med = r6(medianOf(byUser(uid)))
      val mad = r6(medianOf(byUser(uid).map(x => math.abs(x - med))))
      val (gmed, gmad, gz, flag) = got(eid)
      assert(math.abs(gmed - med) < 1e-9, s"event $eid median")
      assert(math.abs(gmad - mad) < 1e-9, s"event $eid MAD")
      if (mad > 0) {
        val z = r6((v - med) / (1.4826 * mad))
        assert(gz.exists(g => math.abs(g - z) < 1e-9), s"event $eid z")
        assert(flag == (math.abs(z) > 3), s"event $eid flag")
      } else assert(gz.isEmpty && !flag, s"event $eid null-MAD handling")
    }
    assert(got.values.exists(_._4), "no anomaly flagged on the fixture")
    assert(got.values.count(_._4) < events.length / 10, "flags not rare")
  }

  test("rolling actives match a local DAU/WAU recompute") {
    val events = Tables.events(spark, sfTiny)
      .select(to_date(col("ts")).as("d"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val du = events.distinct
    val days = du.map(_._1).distinct
    val got = WindowOps.rollingActives(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.size == days.length, "one row per observed day")
    days.foreach { day =>
      val dau = du.count(_._1 == day).toLong
      val wau = du.filter { case (d, _) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._2).distinct.length.toLong
      val (gd, gw, stick) = got(day.toString)
      assert(gd == dau, s"$day dau $gd != $dau")
      assert(gw == wau, s"$day wau $gw != $wau")
      assert(math.abs(stick - dau.toDouble / wau) < 1e-6, s"$day stickiness")
      assert(gw >= gd, s"$day wau < dau (impossible)")
    }
    // the window is real: wau must exceed dau somewhere
    assert(got.values.exists { case (d, w, _) => w > d }, "wau degenerate")
  }

  test("fill_gaps emits a dense user x day grid conserving event counts") {
    val rows = WindowOps.fillGaps(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = rows.map(_._1).distinct
    val days = rows.map(_._2).distinct
    assert(rows.length == users.length * days.length, "grid not dense")
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    // zero-filled days exist, and totals match the raw event count
    assert(rows.exists(_._3 == 0L), "no gap was filled")
    assert(rows.map(_._3).sum == Tables.events(spark, sfTiny).count())
  }

  test("customer_rfm scores match their own metrics and cover all bands") {
    val rows = Relational.customerRfm(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).distinct.length == rows.length, "one row per customer")
    rows.foreach { case (c, rec, freq, mon, rs, fs, ms) =>
      assert(rs == (if (rec <= 120) 3 else if (rec <= 270) 2 else 1), s"cust $c r")
      assert(fs == (if (freq >= 12) 3 else if (freq >= 9) 2 else 1), s"cust $c f")
      assert(ms == (if (mon >= 2800000d) 3 else if (mon >= 2000000d) 2 else 1),
        s"cust $c m")
    }
    // thresholds are calibrated: every band of every score occurs
    for ((get, nm) <- Seq[((Long, Long, Long, Double, Long, Long, Long)) => Long](
        _._5, _._6, _._7).zip(Seq("r", "f", "m")))
      assert(rows.map(get).distinct.sorted.toSeq == Seq(1L, 2L, 3L),
        s"$nm-score bands degenerate")
  }

  test("price histogram conserves rows and its shares sum to one") {
    val rows = Aggregates.histogramPrices(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = Tables.lineitem(spark, sfSmall).count()
    assert(rows.map(_._2).sum == total, "histogram loses rows")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares don't sum to 1")
    // bins are aligned to the declared width and non-overlapping
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (lo, _, _) => assert(lo % 5000 == 0, s"bin $lo misaligned") }
  }

  test("last-touch attribution matches a per-user scan recompute") {
    val events = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        (r.getLong(0), r.getLong(1),
          ts.getTime / 1000 * 1000000L + ts.getNanos / 1000, r.getString(3))
      }
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(e => (e._3, e._2)).toSeq
      var lastTouch: Option[(Long, String)] = None
      sorted.flatMap { e =>
        val out = if (e._4 == "purchase") Some(e._2 -> lastTouch) else None
        if (e._4 == "view" || e._4 == "click") lastTouch = Some((e._2, e._4))
        out
      }
    }.toMap
    val got = graft.ops.WindowOps.attributionLastTouch(spark, sfSmall).collect()
      .map { r =>
        val attr =
          if (r.isNullAt(2)) None else Some((r.getLong(2), r.getString(3)))
        r.getLong(0) -> attr
      }.toMap
    assert(got == want, "attributed touchpoints diverge from scan recompute")
    assert(got.values.exists(_.isDefined), "no purchase ever attributed")
  }

  test("ewma smoothing matches a per-user exact-decimal recompute") {
    val events = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        (r.getLong(0), r.getLong(1),
          ts.getTime / 1000 * 1000000L + ts.getNanos / 1000, r.getDouble(3))
      }
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(e => (e._3, e._2)).toVector
      sorted.indices.map { i =>
        val lo = math.max(0, i - 7)
        val terms = (lo to i).map { j =>
          val w = BigDecimal(0.5).pow(i - j)
          (BigDecimal(sorted(j)._4).setScale(2, BigDecimal.RoundingMode.HALF_UP) * w, w)
        }
        sorted(i)._2 -> (terms.map(_._1).sum.toDouble / terms.map(_._2).sum.toDouble)
      }
    }.toMap
    val got = graft.ops.WindowOps.ewmaSmooth(spark, sfSmall).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, v) =>
      assert(v == want(id), s"event $id: $v vs ${want(id)}")
    }
  }

  test("quality constraints: temporal rule fires, structural rules hold, counts check") {
    val rows = Aggregates.qualityConstraints(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nL = Tables.lineitem(spark, sfSmall).count()
    val nO = Tables.orders(spark, sfSmall).count()
    assert(rows("lineitem_quantity_range") == ((nL, 0L)))
    assert(rows("lineitem_discount_range") == ((nL, 0L)))
    assert(rows("orders_pk_unique") == ((nO, 0L)))
    assert(rows("lineitem_fk_orders")._2 == 0L)
    // the fixture generates l_shipdate independent of o_orderdate, so
    // the temporal-consistency rule must catch a large slice
    val (shipChecked, shipViol) = rows("lineitem_ships_after_order")
    assert(shipChecked == nL && shipViol > nL / 4,
      s"expected the temporal rule to fire broadly, got $shipViol / $shipChecked")
    assert(rows.size == 9 && rows.values.forall(v => v._2 <= v._1))
  }

  test("trending top-k matches a local sliding-window leaderboard") {
    val events = Tables.events(spark, sfSmall)
      .select(col("ts"), col("event_type")).collect()
      .map { r =>
        val ts = r.getTimestamp(0)
        (ts.getTime / 1000 * 1000000L + ts.getNanos / 1000, r.getString(1))
      }
    val slotUs = 30L * 60 * 1000000
    val counts = events
      .flatMap { case (us, ty) =>
        val b = math.floorDiv(us, slotUs) * slotUs
        Seq((b, ty), (b - slotUs, ty))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = counts.toSeq
      .map { case ((ws, ty), n) => (ws, ty, n) }
      .groupBy(_._1).toSeq.flatMap { case (ws, g) =>
        g.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, ty, n), i) => (ws, ty, n, i + 1L) }
      }.toSet
    val got = graft.stream.StreamOps.trendingTopk(spark, sfSmall).collect()
      .map { r =>
        val ts = r.getTimestamp(0)
        (ts.getTime / 1000 * 1000000L + ts.getNanos / 1000,
          r.getString(1), r.getLong(2), r.getLong(3))
      }.toSet
    assert(got == want, "leaderboard diverges from local sliding recompute")
  }

  test("session stats agree with the sessionize labels they roll up") {
    val labels = WindowOps.sessionizeEvents(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val wantCounts = labels.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = WindowOps.sessionStats(spark, sfSmall).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == wantCounts.keySet, "session key sets differ")
    got.foreach { case (k, (n, dur)) =>
      assert(n == wantCounts(k), s"session $k count")
      assert(dur >= 0, s"session $k negative duration")
      if (n == 1) assert(dur == 0L, s"1-event session $k must have zero duration")
    }
    assert(got.values.map(_._1).sum == labels.length.toLong, "events lost in rollup")
  }

  test("asof nearest picks the closer click on both sides, ties to the earlier") {
    val events = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value")).collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        (r.getLong(0), r.getLong(1),
          ts.getTime / 1000 * 1000000L + ts.getNanos / 1000,
          r.getString(3), r.getDouble(4))
      }
    val clicksByUser = events.filter(_._4 == "click").groupBy(_._1)
    val want = events.filter(_._4 == "purchase").map { p =>
      val cands = clicksByUser.getOrElse(p._1, Array.empty)
      if (cands.isEmpty) p._2 -> None
      else {
        val best = cands.minBy(c => (math.abs(c._3 - p._3),
          if (c._3 <= p._3) 0 else 1)) // tie at equal distance -> prev
        p._2 -> Some((best._3, best._5, if (best._3 <= p._3) "prev" else "next"))
      }
    }.toMap
    val got = graft.ops.AsOf.asofNearest(spark, sfSmall).collect()
      .map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some((r.getString(1), r.getDouble(2), r.getString(3))))
      }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, exp) =>
      (exp, got(id)) match {
        case (None, None) =>
        case (Some((ts, v, dir)), Some((gts, gv, gdir))) =>
          assert(gv == v && gdir == dir, s"purchase $id: ($gv,$gdir) vs ($v,$dir)")
          // timestamp round-trips through the same micro format
          val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
          fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
          assert(gts.startsWith(fmt.format(new java.util.Date(ts / 1000))),
            s"purchase $id ts $gts vs $ts")
        case other => fail(s"purchase $id mismatch: $other")
      }
    }
  }

  test("evolved-schema read null-fills exactly the absent generation columns") {
    val rows = graft.sources.FileSources.evolvedEvents(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val legacy = rows.filter(_._1 == "legacy")
    assert(legacy.length == 1, "legacy batch collapsed to one group")
    // every legacy row carried a value; no current row did
    assert(legacy.head._2 == legacy.head._3, "legacy rows lost their value column")
    val current = rows.filterNot(_._1 == "legacy")
    assert(current.nonEmpty && current.forall(_._3 == 0L),
      "value column leaked into the value-less generation")
    val total = Tables.events(spark, sfSmall).count()
    assert(rows.map(_._2).sum == total, "schema merge dropped rows")
  }

  test("mv_incremental: merged delta state equals the full recompute") {
    val got = Relational.mvIncremental(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // full recompute straight from the fixture — the identity the
    // incremental maintenance must preserve
    val full = Tables.orders(spark, sfSmall)
      .join(Tables.customer(spark, sfSmall),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == full, s"incremental view diverged: $got vs $full")
    // the delta actually carries mass — keys ≡ 0 (mod 10) exist, so
    // the merge is exercised, not vacuous
    val deltaCnt = Tables.orders(spark, sfSmall)
      .filter(pmod(col("o_orderkey"), lit(10L)) === 0).count()
    assert(deltaCnt > 0, "delta partition empty — identity untested")
  }

  test("trimmed mean drops exactly the tails and matches a local recompute") {
    val events = Tables.events(spark, sfSmall)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def q(sorted: Array[Double], p: Double): Double = {
      val idx = (sorted.length - 1) * p
      val lo = idx.floor.toInt
      val g = idx - lo
      if (lo + 1 < sorted.length) sorted(lo) * (1 - g) + sorted(lo + 1) * g
      else sorted(lo)
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = events.groupBy(_._1).map { case (typ, g) =>
      val vs = g.map(_._2)
      val sorted = vs.sorted
      val (lo, hi) = (q(sorted, 0.1), q(sorted, 0.9))
      val kept = vs.filter(v => v >= lo && v <= hi)
      val keptSum = kept.map(v => BigDecimal(v).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      (typ, vs.length.toLong, kept.length.toLong,
        round6(keptSum / kept.length), round6(lo), round6(hi))
    }.toSet
    val got = Aggregates.trimmedMean(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got == expected)
    // the trim must bite both tails: kept mass ≈ 80% of each type
    got.foreach { case (typ, n, k, _, _, _) =>
      val frac = k.toDouble / n
      assert(frac > 0.75 && frac < 0.85, s"$typ kept $frac of its mass")
    }
  }

  test("seasonality profile: exact cells, per-type shares sum to one") {
    val events = Tables.events(spark, sfSmall)
      .select(col("event_type"), dayofweek(col("ts")) - 1,
        col("value").cast("decimal(18,2)"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1).toLong), r.getDecimal(2)))
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byType = events.groupBy(_._1._1).view.mapValues(_.length).toMap
    val expected = events.groupBy(_._1).map { case ((typ, dow), g) =>
      (typ, dow, g.length.toLong,
        round6(g.length.toDouble / byType(typ)),
        g.map(t => BigDecimal(t._2)).sum.toDouble)
    }.toSet
    val got = Aggregates.seasonalityProfile(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got == expected)
    // shares within a type must account for the whole week
    got.groupBy(_._1).foreach { case (typ, cells) =>
      val sum = cells.toSeq.map(_._4).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"$typ shares sum to $sum")
      assert(cells.map(_._2) == (0L to 6L).toSet, s"$typ missing weekdays")
    }
  }

  test("next-event examples match a per-user sliding recompute") {
    val events = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val k = graft.ops.WindowOps.NextEventContext
    val expected = events.groupBy(_._1).flatMap { case (uid, g) =>
      val ordered = g.sortBy(e => (e._4, e._2))
      ordered.sliding(k + 1).filter(_.length == k + 1).map { w =>
        (uid, w.last._2, w.init.map(_._3).mkString(">"), w.last._3)
      }
    }.toSet
    val got = graft.ops.WindowOps.nextEventExamples(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == expected)
    // every user with > k events contributes n − k examples
    val perUser = events.groupBy(_._1).view.mapValues(_.length)
    assert(got.size == perUser.values.map(n => math.max(n - k, 0)).sum)
  }
}
