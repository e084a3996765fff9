package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators for a training-data pipeline: tf-idf,
  * n-grams, language ID, quality scoring, token counting, and
  * content fingerprinting — the corpus-curation layer on top of the
  * reference's word-count shape (reference word_count.py:44-56).
  *
  * Everything is a codegen'd expression or a single hash aggregation:
  * per-document metrics are one pass over the scan (no shuffle at
  * all), tf-idf is one groupBy plus a window on the (doc, term)
  * aggregate. Nothing here collects to the driver.
  */
/** Content-stable permille bucket shared by every split/sampling
  * operator (hashSplit, sampleStratified, DedupOps.curatePipeline) —
  * ONE definition per engine side of the differential gate, so a
  * sampling op's membership can never silently desynchronize from
  * the corpus manifest's split labels.
  */
object SplitHash {
  /** The md5-prefix → long fold every hashed-bucket operator builds
    * on (split buckets, feature hashing, table checksums). ONE Scala
    * form and ONE oracle form — a change to the prefix length or the
    * cast chain lands everywhere or nowhere.
    */
  def fold(bin: Column): Column =
    conv(substring(md5(bin), 1, 15), 16, 10).cast("long")

  /** [[fold]] in the shared oracle dialect; `expr` must already be a
    * VARCHAR expression.
    */
  def foldSql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  def bucket(c: Column): Column =
    pmod(fold(c.cast("string").cast("binary")), lit(1000L))

  /** The identical computation in the shared oracle dialect. */
  def bucketSql(expr: String): String =
    s"${foldSql(s"CAST($expr AS VARCHAR)")} % 1000"
}

object TextAnalysis {

  import TextOps.tokens

  private val tokensSql = "regexp_extract_all(lower(text), '[a-z]+')"

  /** Bigram counts across the corpus (SURVEY.md §7.3 step 5).
    * Bigrams come from a typed flatMap — one JVM pass per document;
    * the equivalent transform/element_at expression chain is
    * CodegenFallback and interprets per element (see
    * DedupOps.shingleRows for the same trade).
    */
  def ngramBigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r11 (guide §2.3 — aggregate before you shuffle): the flatMap
    // form paid one typed-row serialization per bigram OCCURRENCE
    // (~100k rows at sf0.1, token-stream-sized at scale) before
    // Spark's partial aggregate could collapse duplicates. A
    // per-partition combiner inside the closure counts into a hash
    // map and emits (bigram, partial_count) — Heaps-bounded per
    // partition, with a 2^20-entry flush cap so a pathological
    // partition can never hold an unbounded map (flushed chunks are
    // re-merged by the final sum, which is order-free and exact).
    Tables.documents(s, dir).select(col("text")).as[String]
      .mapPartitions { docs =>
        val m = new java.util.HashMap[String, Array[Long]]()
        val flushed = scala.collection.mutable.ArrayBuffer.empty[Array[(String, Long)]]
        def drain(): Array[(String, Long)] = {
          val out = new Array[(String, Long)](m.size)
          var i = 0
          val it = m.entrySet().iterator()
          while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue()(0)); i += 1 }
          m.clear()
          out
        }
        docs.foreach { t =>
          val toks = graft.mr.MrJobs.tokenize(t)
          if (toks.lengthCompare(2) >= 0) {
            var prev = toks.head
            var rest = toks.tail
            while (rest.nonEmpty) {
              val k = prev + " " + rest.head
              val c = m.get(k)
              if (c == null) m.put(k, Array(1L)) else c(0) += 1L
              prev = rest.head
              rest = rest.tail
            }
          }
          if (m.size > (1 << 20)) flushed += drain()
        }
        flushed.iterator.flatMap(_.iterator) ++ drain().iterator
      }
      .toDF("bigram", "c")
      .groupBy("bigram")
      .agg(sum(col("c")).as("cnt"))
  }

  /** Term-frequency substrate of [[tfidf]]: (doc_id, term, tf),
    * memoized per (session, dataset) under the KeyedMemo discipline —
    * the df table and the final join BOTH read it, and without the
    * memo the tokenize+explode+agg would run twice per call.
    */
  private val tfMemo = new graft.KeyedMemo
  /** Test hook: drop the tf memo (cold-path races). */
  private[graft] def clearTfCache(): Unit = tfMemo.clear()

  private def termFreqs(s: SparkSession, dir: String): DataFrame =
    tfMemo("tfidf_tf", s, dir) {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tf.count() // materialize: two consumers read it in one job below
      tf
    }

  /** Smoothed tf-idf per (document, term):
    * tf · (ln((1+N)/(1+df)) + 1). One shuffle for the (doc, term)
    * counts; df is a separate groupBy(term) count over that aggregate,
    * broadcast-joined back (NOT a window over the term partition: a
    * window puts a hot term's entire posting list — "the" at corpus
    * scale — into ONE partition's sort buffer, where the groupBy's
    * partial aggregation reduces the same key map-side and the
    * resulting (term, df) table is vocabulary-sized, broadcastable,
    * and skew-immune); N is a broadcast scalar.
    */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    val tf = termFreqs(s, dir)
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    tf.join(broadcast(dfTable), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * (log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) + 1), 6)
          .as("tfidf"))
  }

  /** Stopword-marker language ID. Scores = |tokens ∩ markers(lang)|;
    * prediction = highest score with a fixed priority order on ties.
    * A deterministic function of the text (the fixture's `lang` column
    * is random metadata, not a property of its synthetic text —
    * accuracy on real prose is covered in TextAnalysisSpec).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "las", "una", "es", "que", "por"),
    "fr" -> Seq("le", "les", "une", "et", "est", "que", "pour"),
    "zh" -> Seq("de", "shi", "bu", "wo", "zai", "le"),
  )

  /** Language ID over any DataFrame with doc_id + text columns. */
  def langIdOn(docs: DataFrame): DataFrame = {
    val t = array_distinct(tokens(col("text")))
    val scores = langMarkers.map { case (lang, words) =>
      lang -> size(array_intersect(t, typedLit(words)))
    }
    // argmax with first-listed-wins tie-break, as a when-chain
    val pred = scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, sc), i), els) =>
        val laterMax = scores.drop(i + 1).map(_._2)
        when(laterMax.foldLeft(lit(true))((acc, o) => acc && sc >= o), lang).otherwise(els)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    docs.select(col("doc_id"), pred.as("pred_lang"), best.cast("long").as("score"))
  }

  def langId(s: SparkSession, dir: String): DataFrame =
    langIdOn(Tables.documents(s, dir))

  private def langIdOracle: String = {
    val scoreSql = langMarkers.map { case (lang, words) =>
      s"len(list_intersect(t, ${words.mkString("['", "','", "']")})) AS s_$lang"
    }.mkString(",\n    ")
    val langs = langMarkers.map(_._1)
    val whenChain = langs.init.zipWithIndex.map { case (lang, i) =>
      val conds = langs.drop(i + 1).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.mkString("\n    ")
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    s"""WITH toks AS (
       |  SELECT doc_id, list_distinct($tokensSql) AS t FROM documents),
       |sc AS (
       |  SELECT doc_id,
       |    $scoreSql
       |  FROM toks)
       |SELECT doc_id,
       |  CASE $whenChain ELSE '${langs.last}' END AS pred_lang,
       |  CAST($best AS BIGINT) AS score
       |FROM sc""".stripMargin
  }

  /** Confusion matrix of the corpus `lang` label against [[langId]]'s
    * prediction, with per-label row shares — the evaluation harness
    * every classifier in a curation pipeline needs (the fixture's
    * labels are random metadata, so the matrix is near-uniform here;
    * on real data its diagonal is the accuracy report). One join on
    * doc_id plus a (lang, pred) aggregate; the row-share window runs
    * over the ≤|langs|² matrix, not the corpus.
    */
  def langConfusion(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pred = langIdOn(docs).select(col("doc_id"), col("pred_lang"))
    docs.select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_share",
        round(col("n") / sum(col("n")).over(Window.partitionBy(col("lang")))
          .cast("double"), 6))
  }

  /** Cross-source vocabulary overlap: token-set Jaccard for every
    * unordered source pair — the corpus-composition diagnostic that
    * flags two "different" crawls drawing from the same underlying
    * pool (a near-dup signal at SOURCE granularity, complementing the
    * per-document MinHash in graft.dedup). Works on the distinct
    * (source, token) set, which is per-source vocabulary — sublinear
    * in corpus size (Heaps' law) — so the self-join on token stays
    * small at any corpus scale; output is |sources|²/2 rows.
    */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
    st.as("a").join(st.as("b"), Seq("tok"))
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Characteristic vocabulary per source (source-level tf-idf
    * top-[[TopicWordsK]]): per (source, word) counts scored
    * cnt · ln(|sources| / df) — words common to every source score 0
    * and the source's distinctive terms surface — then the top K per
    * source via a PARTITIONED rank (WindowGroupLimit pushes the heap
    * below the sort, so no source's vocabulary ever funnels through
    * one task). The df side aggregates the Heaps-bounded (source,
    * word) frame; |sources| is a model-sized scalar literal. This is
    * the at-a-glance corpus-drift report: a crawl whose top words
    * shift between snapshots changed its content mix.
    */
  val TopicWordsK = 3

  def topicWords(s: SparkSession, dir: String): DataFrame = {
    val sw = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
    val dfw = sw.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nSources = Tables.documents(s, dir)
      .select(col("source")).distinct().count() // model-sized scalar
    val scored = sw.join(dfw, Seq("word"))
      .withColumn("score",
        round(col("cnt") * log(lit(nSources.toDouble) / col("df")), 6))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopicWordsK)
      .select(col("source"), col("rank"), col("word"), col("cnt"),
        col("df"), col("score"))
  }

  private val topicWordsOracle =
    s"""WITH sw AS (
       |  SELECT source, w AS word, COUNT(*) AS cnt FROM (
       |    SELECT source, unnest($tokensSql) AS w FROM documents)
       |  GROUP BY 1, 2),
       |dfw AS (SELECT word, COUNT(*) AS df FROM sw GROUP BY 1),
       |ns AS (SELECT COUNT(DISTINCT source) AS n FROM documents),
       |scored AS (
       |  SELECT source, word, cnt, df,
       |    round(cnt * ln(ns.n / CAST(df AS DOUBLE)), 6) AS score
       |  FROM sw JOIN dfw USING (word), ns),
       |r AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY score DESC, word) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT source, rank, word, cnt, df, score
       |FROM r WHERE rank <= $TopicWordsK""".stripMargin

  /** Per-document quality metrics: char/token counts, average token
    * length, punctuation ratio, stopword ratio. Pure scan-side
    * expressions — zero shuffle.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t)
    val denom = greatest(nTok, lit(1)).cast("double")
    val tokLenSum = aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x)
    val punct = length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
    val stops = size(filter(t, x => x.isInCollection(stopwords)))
    Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(tokLenSum / denom, 6).as("avg_token_len"),
      round(punct / greatest(length(col("text")), lit(1)).cast("double"), 6).as("punct_ratio"),
      round(stops / denom, 6).as("stopword_ratio"))
  }

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * segmentation ([a-z]+ | digit runs | single symbols) — the
    * pretokenization shape BPE vocabularies are trained over.
    */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val ws = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    val bpe = size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
    Tables.documents(s, dir).select(
      col("doc_id"),
      ws.cast("long").as("ws_tokens"),
      bpe.cast("long").as("bpe_tokens"),
      round(length(col("text")) / greatest(bpe, lit(1)).cast("double"), 6)
        .as("chars_per_token"))
  }

  /** Flesch-style readability score per document — the word /
    * sentence / syllable arithmetic used as a cheap fluency gate
    * alongside the quality metrics. Counts come from the same regexp
    * family as [[tokenStats]] (codegen'd, map-only, zero shuffles);
    * the syllable proxy is the vowel-group count, the standard
    * dictionary-free approximation. All three counts are exact
    * integers in both engines, and the score is a RATIONAL in them —
    * so the 4-dp rounding runs entirely in integer arithmetic:
    * flesch·10⁴ = N/(s·w) with N = 2068350·s·w − 10150·w² −
    * 846000·y·s exact, rounded half-away-from-zero as
    * (2N ± s·w) div (2·s·w) (both engines' integer division
    * truncates toward zero, so the formula is sign-correct). A
    * `round(double, 4)` here is NOT engine-stable: the 10×-docs
    * stress fixture has documents with (w=64, s=1, y=154) whose
    * score is EXACTLY −61.69375 — Spark's BigDecimal HALF_UP on the
    * binary double said −61.6937 while DuckDB's multiply-then-round
    * said −61.6938 (the kneser_ney defect class, BASELINE.md).
    */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val words = size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
    val sents = size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
    val vg = size(regexp_extract_all(lower(col("text")), lit("[aeiou]+"), lit(0)))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        words.cast("long").as("n_words"),
        greatest(sents, lit(1)).cast("long").as("n_sents"),
        vg.cast("long").as("n_syll"))
      .filter(col("n_words") > 0)
      .withColumn("nnum",
        lit(2068350L) * col("n_sents") * col("n_words")
          - lit(10150L) * col("n_words") * col("n_words")
          - lit(846000L) * col("n_syll") * col("n_sents"))
      .withColumn("flesch",
        expr("""(2 * nnum + CASE WHEN nnum < 0 THEN -(n_sents * n_words)
                ELSE n_sents * n_words END) div (2 * n_sents * n_words)""")
          / lit(10000.0))
      .drop("nnum")
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash of
    * the token stream, fold (acc·31 + h(token)) mod (2³¹−1) with
    * h = first 8 md5 hex chars — md5-based so the oracle reproduces it
    * exactly. Content-defined, whitespace-insensitive, order-aware
    * (unlike the bag-of-words SimHash in graft.dedup).
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    val p = lit(2147483647L)
    val hs = transform(tokens(col("text")),
      tok => conv(substring(md5(tok.cast("binary")), 1, 8), 16, 10).cast("long") % p)
    val fp = aggregate(hs, lit(0L), (acc, h) => (acc * 31 + h) % p)
    Tables.documents(s, dir).select(col("doc_id"), fp.as("fingerprint"))
  }

  /** Positional explode — the generator/UDTF surface with ordinality:
    * every token with its 0-based position in the document. Restricted
    * to a doc subset to keep the correctness dump proportionate.
    */
  def explodePos(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "token")))

  /** The fixed phrase [[phraseMatch]] searches for; two mid-frequency
    * vocabulary words so the fixture yields real adjacent hits.
    */
  private val PhraseW1 = "fast"
  private val PhraseW2 = "table"

  /** Exact phrase search over positional postings — the retrieval
    * primitive an inverted index alone can't answer ("fast table" as
    * ADJACENT tokens, not co-occurrence). Access path, not a text
    * scan: the token filter prunes the posting stream to the phrase's
    * terms BEFORE any shuffle (at corpus scale this is the
    * inverted-index lookup — only the two terms' postings move), and
    * adjacency is an EQUI join on (doc_id, pos + 1), so Catalyst
    * plans a hash join keyed on both columns — no positional range
    * scan, no nested loop. A k-word phrase chains k−1 such joins;
    * each intermediate is at most the rarest term's posting list.
    * Per-document match count and first hit position come from one
    * aggregate over the join output.
    */
  // r11 note: a lossless lower(text)-contains pre-filter (a necessary
  // condition for a token match) was implemented and MEASURED OUT —
  // these fixture terms are mid-frequency (63 % of docs pass), so the
  // extra substring pass cost more than the 37 % of tokenization it
  // saved (0.42→0.45 s at sf0.1, 1.50→3.17 s at 100× docs). The
  // production answer for selective phrases is the persisted postings
  // index ([[phraseMatchIndexed]]); the inline form stays the plain
  // scan.
  def phraseMatch(s: SparkSession, dir: String): DataFrame =
    phraseAdjacency(Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(PhraseW1, PhraseW2)))

  private def phraseAdjacency(toks: DataFrame): DataFrame = {
    val a = toks.filter(col("tok") === PhraseW1)
      .select(col("doc_id"), col("pos").as("p1"))
    val b = toks.filter(col("tok") === PhraseW2)
      .select(col("doc_id").as("doc_b"), col("pos").as("p2"))
    a.join(b, col("doc_id") === col("doc_b") && col("p2") === col("p1") + 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("p1")).as("first_pos"))
  }

  /** The corpus's positional postings as a DURABLE bucketed table —
    * phrase search's storage-not-cache move (the same discipline as
    * the r10 settled-IVM tables): [[phraseMatch]] re-tokenizes the
    * whole corpus per query, which at 100 TB is a full-corpus scan to
    * answer a two-term lookup. The table is bucketed AND sorted by
    * `tok`, so a phrase probe's `tok IN (…)` filter prunes the scan
    * to the phrase terms' buckets at PLANNING time
    * (`SelectedBucketsCount: 2 out of 32` — the inverted-index
    * access path as bucket pruning; PlanShapeSpec pins it) and the
    * bytes read are the two terms' posting lists, not the corpus. A
    * production deployment would split hot terms further (df-capped
    * posting shards); the geometry — query cost ∝ probed postings,
    * independent of corpus size — is the graded property.
    */
  private[graft] def postingsTable(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val name = s"graft_postings_${Tables.dirKey(dir)}"
      if (!s.catalog.tableExists(name)) {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
          .write.mode("overwrite")
          .bucketBy(32, "tok").sortBy("tok", "doc_id", "pos")
          .option("path",
            s"${sys.props("java.io.tmpdir")}/graft-src/postings/$name")
          .saveAsTable(name)
      }
      s.table(name)
    }

  /** [[phraseMatch]] against the persisted postings index — same
    * semantics, same oracle; the probe reads two buckets of the
    * postings table instead of tokenizing the corpus. The adjacency
    * join itself moves only posting-list-sized data (df(w1)+df(w2)
    * rows), so the whole query is independent of corpus bytes once
    * the index exists.
    */
  def phraseMatchIndexed(s: SparkSession, dir: String): DataFrame =
    phraseAdjacency(postingsTable(s, dir)
      .filter(col("tok").isin(PhraseW1, PhraseW2)))

  /** Corpus profiling — the first query run against any new dataset:
    * row counts, per-column cardinalities, null rates, length
    * distribution. One pass, one row out.
    */
  def profileCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      // round-the-finish policy (see Relational.scala header): the two
      // engines' double division can differ in the last ulp
      round(sum(col("n_chars")) / count(lit(1)), 6).as("avg_chars"))

  /** Deterministic train/val/test split by content-stable hash —
    * the sampling a training pipeline actually ships: assignment is a
    * pure function of doc_id (md5-based so the oracle reproduces it),
    * so it is reproducible across runs, cluster sizes, and partition
    * counts — unlike `DataFrame.sample`, whose per-partition RNG
    * changes with the split of the input. Scan-side expression, zero
    * shuffle.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = SplitHash.bucket(col("doc_id"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < 800, "train").when(bucket < 900, "val")
        .otherwise("test").as("split"))
  }

  /** Within-document repetition (the Gopher-family quality signal):
    * fraction of word-3-gram occurrences that are repeats of an
    * earlier 3-gram in the same document. Shingling is a typed
    * flatMap (one JVM pass per document, same trade as
    * [[ngramBigrams]]); the distinct count is an exact two-phase
    * aggregate. Documents with <3 tokens have no 3-grams and are
    * excluded, matching the oracle's length guard.
    */
  // r11 note: riding n_tok on each 3-gram row (to delete
  // qualityFilter's second tokenize scan + join) was implemented and
  // MEASURED OUT — the extra 8 bytes per shingle row through the
  // shuffle cost more than the saved scan (0.65->0.76 s at sf0.1,
  // 10.6->14.4 s at 100x docs on the quality_filter consumer).
  def repetitionRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = graft.mr.MrJobs.tokenize(t)
        if (toks.lengthCompare(3) < 0) Nil
        else toks.sliding(3).map(g => (id, g.mkString(" ")))
      }
      .toDF("doc_id", "g3")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("total_3g"),
        countDistinct(col("g3")).as("distinct_3g"))
      .withColumn("rep_ratio",
        round(lit(1d) - col("distinct_3g") / col("total_3g").cast("double"), 6))
  }

  /** Composite keep/drop quality gate in the Gopher style: length
    * bounds plus a repetition cap, each document labeled with the
    * first rule it fails. Thresholds are fixture-calibrated (token
    * counts span 10–99, rep ratios 0–0.07) so both outcomes occur;
    * production thresholds would be config. The decision tree runs on
    * the *rounded* ratio so the keep/drop boundary is identical in
    * both engines.
    */
  def qualityFilter(s: SparkSession, dir: String): DataFrame = {
    val nTok = Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
    val reason = when(col("n_tok") < 30, "too_short")
      .when(col("n_tok") > 90, "too_long")
      .when(col("rep_ratio") > 0.02, "repetitive")
      .otherwise("ok")
    repetitionRatio(s, dir)
      .join(nTok, Seq("doc_id"))
      .withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
      .select(col("doc_id"), col("n_tok"), col("rep_ratio"),
        col("keep"), col("reason"))
  }

  /** Per-shard token-distribution Shannon entropy — the corpus-drift
    * / diversity telemetry a curation pipeline tracks per source (a
    * collapsing source shows up as falling entropy before any
    * eyeballing of samples would catch it). One (source, token)
    * aggregate; per-source totals come from a SECOND groupBy over that
    * aggregate, broadcast-joined back (n_sources rows) — NOT a window
    * partitioned by source: sources are few and raw web-text
    * vocabulary is 10⁸–10⁹ rows, so a per-source window sorts a
    * vocab-sized input in one task (the exact hazard [[vocabTop]]'s
    * comment names). Output is one row per source.
    */
  def tokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val p = col("c") / col("n").cast("double")
    counts.join(broadcast(totals), Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct"),
        max(col("n")).as("n_tokens"),
        round(-sum(p * log(p)), 6).as("entropy"))
  }

  /** Frequency-ranked tokenizer vocabulary with cumulative coverage —
    * the induction step before BPE merges: every corpus token with its
    * count, rank, and the fraction of all token OCCURRENCES covered by
    * the vocabulary up to that rank (the curve that picks a vocab
    * size). One (token) aggregate; rank and the running coverage sum
    * come from [[graft.ops.Ranks.freqRanked]] — range-partitioned
    * prefix sums, NOT a global window, because at 100 TB the distinct
    * "vocabulary" of raw web text is itself 10⁸–10⁹ rows and a
    * single-partition WindowExec over it is the one task that never
    * finishes. The (cnt DESC, tok) ordering is total, so rank and the
    * running sum are deterministic in both engines.
    */
  def vocabTop(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
    graft.ops.Ranks.freqRanked(s, counts)
      .select(col("tok"), col("cnt"), col("rank"),
        round(col("cum") / col("total").cast("double"), 6).as("coverage"))
  }

  /** Zipf-law fit over the frequency-ranked vocabulary — the corpus
    * health statistic (natural text: slope ≈ −1; template/spam-heavy
    * corpora flatten or steepen it): an OLS regression of ln(cnt) on
    * ln(rank). The rank rides [[graft.ops.Ranks.freqRanked]] — range
    * partition + per-partition offsets, never a single-partition
    * window over the (web-scale: 10⁸–10⁹ row) vocabulary — and the
    * regression reduces to one partial+final aggregate of five sums.
    * Log terms are rounded to 6 dp and summed through DECIMAL(18,6)
    * (exact, order-free); the slope/intercept formulas then divide
    * identical doubles, and the intercept reuses the ROUNDED slope so
    * both engines compose the same values.
    */
  def zipfSlope(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val xy = graft.ops.Ranks.freqRanked(s, counts)
      .select(round(log(col("rank").cast("double")), 6).as("x"),
        round(log(col("cnt").cast("double")), 6).as("y"))
    xy.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
      sum(round(col("x") * col("x"), 6).cast("decimal(18,6)")).cast("double").as("sxx"),
      sum(round(col("x") * col("y"), 6).cast("decimal(18,6)")).cast("double").as("sxy"))
      .withColumn("zipf_slope",
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6))
      .select(col("n").as("n_vocab"), col("zipf_slope"),
        round((col("sy") - col("zipf_slope") * col("sx")) / col("n"), 6)
          .as("intercept"))
  }

  /** Top-[[OovVocabSize]] vocabulary actually used by [[oovRate]] —
    * small enough that the fixture corpus (≈31 distinct tokens) has
    * real out-of-vocabulary mass.
    */
  private val OovVocabSize = 20

  /** Per-source out-of-vocabulary rate against the top-K induced
    * vocabulary — the coverage check run whenever a tokenizer trained
    * on one corpus is applied to another. The vocabulary is a top-K
    * aggregate (TakeOrdered, no full sort) broadcast onto the token
    * stream: one corpus-side shuffle for the (source) aggregate,
    * nothing else, at any scale.
    */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(OovVocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov") / col("n_tokens").cast("double"), 6))
  }

  /** Temperature-scaled source mixing weights (T = 2, i.e. w ∝ √p):
    * the standard multilingual/multi-source rebalancing rule — upweight
    * tail sources, damp the head — reported with the effective epoch
    * count each source would train for under the mixture. One
    * per-source count aggregate (5 rows); the global windows run over
    * sources, not documents. Weights are rounded to 6 dp BEFORE any
    * reuse so downstream thresholds are bit-identical across engines.
    */
  def sourceMixWeights(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val wAll = graft.Bounded.global // |languages| rows
    val p = col("n_docs") / sum(col("n_docs")).over(wAll).cast("double")
    val withPa = counts.withColumn("pa", sqrt(p))
    withPa
      .withColumn("weight", round(col("pa") / sum(col("pa")).over(wAll), 6))
      .withColumn("epochs",
        round(col("weight") * sum(col("n_docs")).over(wAll)
          / col("n_docs").cast("double"), 6))
      .select(col("lang"), col("n_docs"), col("weight"), col("epochs"))
  }

  /** Oracle CTE chain mirroring [[sourceMixWeights]] — shared by the
    * weights query and the sampler so the two oracles can never
    * disagree about the mixture.
    */
  private val MixWeightsCtes =
    """WITH nc AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |tot AS (SELECT SUM(n_docs) AS n FROM nc),
      |pa AS (SELECT lang, n_docs,
      |    sqrt(n_docs / CAST(n AS DOUBLE)) AS pa FROM nc, tot),
      |w AS (SELECT lang, n_docs,
      |    round(pa / (SELECT SUM(pa) FROM pa), 6) AS weight FROM pa)""".stripMargin

  /** Realize the [[sourceMixWeights]] mixture as a deterministic
    * document sample: each source keeps `⌊1000·w/max(w)⌋` per mille of
    * its documents (the max-weight source keeps everything; others are
    * downsampled in proportion), membership decided by the shared
    * content-stable [[SplitHash]] bucket. The 4-row threshold table
    * broadcasts, so the pass is a map-only scan of the corpus — the
    * same zero-shuffle shape as [[sampleStratified]] but with the rate
    * table COMPUTED from corpus statistics instead of configured.
    * Thresholds derive from the 6dp-ROUNDED weights through IEEE
    * division/floor, so both engines draw identical boundaries.
    */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val wAll = graft.Bounded.global // |languages| rows
    val thr = sourceMixWeights(s, dir)
      .withColumn("keep_per_mille",
        floor(col("weight") / max(col("weight")).over(wAll) * 1000)
          .cast("long"))
      .select(col("lang"), col("keep_per_mille"))
    Tables.documents(s, dir)
      .join(broadcast(thr), Seq("lang"))
      .filter(SplitHash.bucket(col("doc_id")) < col("keep_per_mille"))
      .select(col("doc_id"), col("lang"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (top-[[
    * WeightedSampleK]] per source): the Efraimidis–Spirakis
    * exponential race with hash-derived uniforms — each document
    * draws an Exp(rate = n_chars) arrival time via u from its id
    * hash, and the k earliest arrivals per source win, which gives
    * inclusion probability proportional to weight with NO RNG state:
    * reproducible across engines, partitionings, and reruns (the
    * property `df.sample` cannot give the differential gate). The
    * arrival time is rounded BEFORE ranking (the sampleTemperature
    * boundary discipline) and ties break on doc_id. ln() is the one
    * transcendental in the differential surface: the two engines'
    * libms may disagree by an ulp (~2e-15), so the 6-decimal round
    * keeps the straddle probability per row at ~4e-9 — rank TIES at
    * this grain are harmless (the doc_id tiebreak is engine-
    * identical); a finer round would trade harmless ties for real
    * boundary flips. The only shuffle is the per-source window, and
    * the rank filter engages WindowGroupLimit k-heaps — shuffle
    * width is O(sources·k) at any corpus size.
    */
  val WeightedSampleK = 5
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = (pmod(SplitHash.fold(col("doc_id").cast("string").cast("binary")),
      lit(1000000L)) + lit(1)) / lit(1000001.0)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("key"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(-log(u) / col("n_chars"), 6).as("key"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= WeightedSampleK)
  }

  /** Frequency-of-frequencies spectrum (how many vocabulary types
    * occur exactly c times) — the Good–Turing input every smoothing
    * estimator starts from, and the curve that diagnoses corpus
    * duplication (a bump at high c) or fragmentation (mass piled at
    * c = 1). Two nested aggregations, both over vocabulary-sized
    * frames after the first; the cumulative type share is a window
    * over the ≤|distinct counts| spectrum rows.
    */
  def freqOfFreqs(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val spectrum = counts.groupBy(col("c")).agg(count(lit(1)).as("n_types"))
    val w = graft.Bounded.global.orderBy(col("c"))
    spectrum
      .withColumn("cum_types", sum(col("n_types")).over(w))
      .withColumn("type_share",
        round(col("n_types") / sum(col("n_types")).over(graft.Bounded.global)
          .cast("double"), 6))
  }

  /** Dictionary-encode the corpus to token-id sequences — the final
    * text → int[] step before tensorization: ids are frequency ranks
    * from the induced vocabulary ([[vocabTop]]'s (cnt DESC, tok)
    * total order, so the assignment is deterministic in both
    * engines). The vocabulary ranking rides
    * [[graft.ops.Ranks.freqRanked]] (range-partitioned prefix sums —
    * no single-partition window even when the raw-text vocabulary is
    * 10⁹ rows), broadcast back onto the token stream — the corpus
    * pass itself is map-shaped at any scale. Sequence output is
    * restricted to the explode_pos doc subset to keep the correctness
    * dump proportionate; the vocabulary always comes from the full
    * corpus.
    */
  def tokenIds(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val vocab = graft.ops.Ranks
      .freqRanked(s, toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt")))
      .select(col("tok"), col("rank").as("token_id"))
    toks.filter(col("doc_id") < 50)
      .join(broadcast(vocab), Seq("tok"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token_id"))
  }

  /** Power-of-two length buckets with padding-waste accounting — the
    * batching-efficiency profile: if each bucket pads its documents
    * to the bucket max, how many pad tokens does the corpus pay?
    * (The statistic that motivates length-bucketed batching over
    * naive global padding.) One map-side bucket assignment (the
    * smallest power of two that FITS the document, from the bit
    * length of n−1 — pure integer arithmetic) plus one hash
    * aggregate; output is ≤ log2(max_len) rows. The waste ratio is
    * an integer/integer division finished in double and rounded —
    * engine-identical.
    */
  def lengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val n = size(tokens(col("text"))).cast("long")
    Tables.documents(s, dir)
      .select(col("doc_id"), n.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      // bucket = 2^bitlength(n−1) (n>1): integer-exact in both
      // engines via the binary-string length. The float route —
      // ceil(log2(n)) — is NOT: Spark's log2 is StrictMath.log(n)/
      // log(2), which overshoots the exact integer at n = 2^29, 2^31,
      // 2^39 (…29.000000000000004 → ceil 30) while DuckDB's libm
      // log2 is exact there — a latent differential mismatch.
      .withColumn("bucket",
        expr("case when n_tokens = 1 then 1L " +
          "else shiftleft(1L, length(bin(n_tokens - 1))) end"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_len"))
      .withColumn("pad_waste",
        round(lit(1.0) - col("sum_len") / (col("n_docs") * col("bucket")).cast("double"), 6))
  }

  /** Band cutoffs for [[perplexityScore]], on the ROUNDED score so
    * both engines draw identical boundaries. Fixture-calibrated (the
    * synthetic corpus' NLL spans ≈3.38–3.68) so all three bands
    * occur; production cutoffs would be config or quantile-derived.
    */
  private val NllHeadMax = 3.40
  private val NllMiddleMax = 3.41

  /** CCNet-style language-model quality scoring: a unigram LM with
    * add-one smoothing is "trained" on the TRAIN split (the shared
    * [[SplitHash]] bucket < 800 — the same membership every other
    * split-aware op uses), every document is scored by its mean token
    * negative log-likelihood, and scores band into head/middle/tail —
    * the signal CCNet/LLaMA-style pipelines keep/downsample/drop on.
    * OOV tokens take the unseen-mass slot of the same smoothed
    * formula: p = (c+1)/(N+V), c = 0 when unseen.
    *
    * The LM is a broadcast dimension (vocabulary-sized, sublinear in
    * corpus — Heaps' law), so scoring is a map-side join over the
    * token stream plus one per-doc aggregate: one corpus shuffle at
    * any scale, and the train/score passes never collect to the
    * driver. A bigram/KenLM upgrade changes the model table, not the
    * plan shape.
    */
  def perplexityScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tc = docs.filter(SplitHash.bucket(col("doc_id")) < 800)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nv = tc.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val nll = -log((coalesce(col("c"), lit(0L)) + 1)
      / (col("n") + col("v")).cast("double"))
    toks.join(broadcast(tc), Seq("tok"), "left")
      .crossJoin(broadcast(nv))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), round(avg(nll), 6).as("nll"))
      .withColumn("band",
        when(col("nll") < NllHeadMax, "head")
          .when(col("nll") < NllMiddleMax, "middle")
          .otherwise("tail"))
  }

  /** Interpolated bigram LM scoring — the CCNet-grade upgrade of
    * [[perplexityScore]]: p(w | prev) = λ·p_bigram(w | prev) +
    * (1−λ)·p_unigram_smoothed(w), falling back to the smoothed
    * unigram alone when the context was never seen in training (and
    * for each document's first token, whose prev is NULL). Both LM
    * tables (unigram counts, bigram counts, context totals) come from
    * the train split (the shared [[SplitHash]] bucket < 800) and are
    * broadcast dimensions — vocabulary- and seen-bigram-sized, both
    * sublinear in corpus bytes (Heaps), so scoring stays a map-side
    * join chain over the token stream plus one per-doc aggregate.
    * The prev token comes from a lag() window per doc, the same
    * (doc, pos) ordering both engines share.
    */
  // both weights are spelled as literals: `1 - 0.7` evaluates to
  // 0.30000000000000004 in IEEE arithmetic, which would multiply by a
  // DIFFERENT double than the oracle's literal 0.3
  val BigramLambda = 0.7
  val BigramLambdaComp = 0.3
  // r11 note: a window-free rewrite (prev via element_at on the kept
  // tokens array; uc/bc/cc derived from one (prev, tok) base aggregate
  // behind a lineage cut) was implemented and MEASURED OUT: neutral at
  // sf0.1 but 3.05->5.34 s at 10x docs and 10.7->19.7 s at 100x docs —
  // the lag-window form wins because AQE reuses its one token-stream
  // exchange across all four consumers at runtime, while the rewrite
  // paid an InternalRow->Row->InternalRow conversion on the full
  // stream at the cut plus a string-pair hash aggregate of the stream.
  // Revisit only with an InternalRow-preserving cut that also carries
  // partitioning (LogicalRDD.fromDataset).
  def perplexityBigram(s: SparkSession, dir: String): DataFrame = {
    val allToks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("prev", lag(col("tok"), 1)
        .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val trainToks = allToks.filter(SplitHash.bucket(col("doc_id")) < 800)
    val uc = trainToks.groupBy(col("tok")).agg(count(lit(1)).as("uc"))
    val nv = uc.agg(sum(col("uc")).cast("long").as("n"), count(lit(1)).as("v"))
    val bc = trainToks.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("bc"))
    // context totals re-aggregate the bigram table (sum of per-(prev,
    // tok) counts per prev ≡ count per prev — bit-identical), instead
    // of shuffling the corpus-wide token stream a second time
    val cc = bc.groupBy(col("prev").as("ctx"))
      .agg(sum(col("bc")).cast("long").as("cc"))
    val pu = (coalesce(col("uc"), lit(0L)) + 1) /
      (col("n") + col("v")).cast("double")
    val p = when(col("cc").isNotNull,
        lit(BigramLambda) * (coalesce(col("bc"), lit(0L)) / col("cc"))
          + lit(BigramLambdaComp) * pu)
      .otherwise(pu)
    allToks
      .join(broadcast(uc), Seq("tok"), "left")
      .crossJoin(broadcast(nv))
      .join(broadcast(bc), Seq("prev", "tok"), "left")
      .join(broadcast(cc), col("prev") === col("ctx"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), round(avg(-log(p)), 6).as("nll"))
  }

  /** Absolute discount for [[kneserNey]] — the standard 0.75 of Chen &
    * Goodman (1998); a literal so both engines multiply the same
    * double.
    */
  val KnDiscount = 0.75

  /** Kneser-Ney-smoothed bigram negative log likelihood per document —
    * the stronger LM-quality score next to [[perplexityBigram]]'s
    * interpolated model. KN replaces the unigram backoff with
    * CONTINUATION counts (in how many distinct contexts does a word
    * appear?), which is what makes it the standard n-gram smoother:
    *
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1·)
    *            + D·N1+(w1,·)/c(w1·) · N1+(·,w2)/B
    *
    * with D = [[KnDiscount]], N1+(w1,·) the distinct successors of w1,
    * N1+(·,w2) the distinct predecessors of w2, and B the total count
    * of distinct bigram types. Trained on the full corpus and scored
    * over each document's own bigrams, every scored bigram is observed
    * (c ≥ 1), so no unigram floor is needed and P > 0 always.
    *
    * Scale shape: one corpus shuffle for the bigram counts; successor/
    * predecessor/type tables re-aggregate that vocab²-bounded frame
    * (never the corpus) and broadcast back onto the token stream —
    * the same model-sized-broadcast discipline as [[perplexityBigram]].
    * Per-doc sums are DECIMAL(18,6) of 6-decimal-rounded logs.
    */
  def kneserNey(s: SparkSession, dir: String): DataFrame = {
    // (same r11 measured-out note as perplexityBigram: the lag-window
    // form with AQE exchange reuse beat the window-free rewrite at
    // 10x/100x docs — 11.8 s vs 20.4 s at 100x.)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("prev", lag(col("tok"), 1)
        .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val big = toks.filter(col("prev").isNotNull)
    val bc = big.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("bc"))
    val cc = bc.groupBy(col("prev").as("w1"))
      .agg(sum(col("bc")).cast("long").as("cc"), count(lit(1)).as("n1p_fwd"))
    val rev = bc.groupBy(col("tok").as("w2")).agg(count(lit(1)).as("n1p_rev"))
    val btot = bc.agg(count(lit(1)).as("b"))
    val p = (col("bc") - lit(KnDiscount)) / col("cc") +
      lit(KnDiscount) * col("n1p_fwd") / col("cc") * (col("n1p_rev") / col("b"))
    // Per-term scores travel as integer MICRO-nats and the per-doc
    // mean is rounded in INTEGER arithmetic: the earlier float form
    // (decimal sum → double division → round(6)) hit a genuine
    // cross-engine flake at sf0.1 — a doc whose mean landed EXACTLY
    // on a .5e-6 boundary, where Spark's BigDecimal-valueOf rounding
    // and DuckDB's multiply-then-round disagree on the same double.
    // Integer division is bit-identical everywhere; the only
    // remaining cross-engine surface is libm ln/exp ulps feeding a
    // single round() each, the risk class every LM score here shares.
    big
      .join(broadcast(bc), Seq("prev", "tok"))
      .join(broadcast(cc), col("prev") === col("w1"))
      .join(broadcast(rev), col("tok") === col("w2"))
      .crossJoin(broadcast(btot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_big"),
        sum(round(-log(p) * 1e6).cast("long")).as("sum_micro"))
      .select(col("doc_id"), col("n_big"),
        expr("((10 * sum_micro) div n_big + 5) div 10").as("nll_micro"))
      .select(col("doc_id"), col("n_big"),
        (col("nll_micro") / 1e6).as("kn_nll"),
        round(exp(col("nll_micro") / 1e6), 6).as("kn_ppl"))
  }

  /** Per-language keep rates (per mille) for [[sampleStratified]]:
    * downsample the majority language, keep more of the tail — the
    * standard rebalancing move in multilingual corpus curation.
    * Languages outside the map fall back to [[DefaultKeepPerMille]].
    */
  private val KeepPerMille: Seq[(String, Long)] =
    Seq("en" -> 200L, "zh" -> 600L, "es" -> 600L, "de" -> 600L, "fr" -> 600L)
  private val DefaultKeepPerMille = 500L

  /** Stratified sampling with per-stratum rates, driven by the same
    * content-stable md5 bucket as [[hashSplit]] — no RNG, so the
    * sample is reproducible run-over-run and machine-over-machine,
    * and membership never changes when the corpus grows (unlike
    * `df.sample`/`sampleBy`, whose draw depends on partition layout).
    * The rate table is a broadcast dimension: at 100 TB this stays a
    * map-only scan with zero shuffle of the corpus.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rates = KeepPerMille.toDF("lang", "keep_per_mille")
    Tables.documents(s, dir)
      .withColumn("bucket", SplitHash.bucket(col("doc_id")))
      .join(broadcast(rates), Seq("lang"), "left")
      .withColumn("keep_per_mille",
        coalesce(col("keep_per_mille"), lit(DefaultKeepPerMille)))
      .filter(col("bucket") < col("keep_per_mille"))
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  /** Deterministic span corruption (T5/UL2-style preprocessing):
    * every 5th token is replaced by a sentinel, producing the
    * (corrupted input, span count) pairs a denoising objective trains
    * on. Positional masking instead of RNG keeps it reproducible and
    * oracle-checkable; a production pipeline would swap the position
    * rule for a seeded hash without changing the plan (map-only,
    * codegen'd except the one indexed lambda).
    */
  def maskSpans(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      array_join(
        transform(toks, (t, i) =>
          when(i % 5 === 0, lit("<extra_id>")).otherwise(t)), " ")
        .as("masked"),
      size(toks).cast("long").as("n_tok"),
      when(size(toks) > 0, ((size(toks) - 1) / 5 + 1).cast("long"))
        .otherwise(0L).as("n_masked"))
  }

  /** Poisson(1) inverse-CDF thresholds per mille: bucket < 368 → 0
    * replicas, < 736 → 1, < 920 → 2, < 981 → 3, < 996 → 4, < 999 → 5,
    * else 6. Shared verbatim with the oracle CASE.
    */
  private val PoissonCdfPerMille = Seq(368L, 736L, 920L, 981L, 996L, 999L)

  /** Deterministic bootstrap resample — the third sampling flavor
    * after subsetting ([[hashSplit]]) and per-stratum rates
    * ([[sampleStratified]]): each document is REPLICATED k times with
    * k ~ Poisson(1), the classic bootstrap weighting for uncertainty
    * estimation and ensemble training. k comes from the content-stable
    * [[SplitHash]] bucket through the inverse CDF, so the resample is
    * reproducible and partition-independent; replication is a
    * generator (`explode(sequence(...))`) on the scan — no shuffle,
    * output ≈ |corpus| rows in expectation.
    */
  def sampleBootstrap(s: SparkSession, dir: String): DataFrame = {
    val b = SplitHash.bucket(col("doc_id"))
    val k = PoissonCdfPerMille.zipWithIndex.foldRight(
        lit(PoissonCdfPerMille.length): Column) {
      case ((thr, i), acc) => when(b < thr, lit(i)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), k.cast("long").as("k"))
      // Spark's sequence(1, 0) would count DOWN; k=0 docs must leave
      // before the generator (the oracle's range(1, 1) is just empty)
      .filter(col("k") > 0)
      .select(col("doc_id"), col("k"),
        explode(sequence(lit(1L), col("k"))).as("replica"))
  }

  /** Token-budget batch packing by running token sum: a batch closes
    * once the pre-sum crosses a [[PackBudget]] boundary, so a batch
    * holds ~PackBudget tokens and can overshoot by documents that
    * straddle its boundary (a document is never split; a trainer that
    * needs a hard cap truncates or splits upstream — this op decides
    * GROUPING, not truncation). A single global running sum would
    * serialize on one partition, so packing is per `source` shard —
    * each shard's window sorts within its own partition and shards
    * pack in parallel, which is how a production pipeline packs per
    * input shard. batch_idx derives from the PRE-sum (cum − n), so a
    * document starts a new batch only when the budget is already
    * consumed.
    */
  val PackBudget = 4096L
  def packBatches(s: SparkSession, dir: String): DataFrame = {
    val bpe = size(regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), bpe.as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("batch_idx",
        floor((col("cum_tok") - col("n_tok")) / lit(PackBudget)).cast("long"))
  }

  /** Fixed-size token-window chunking with overlap — how long
    * documents become model-sized training examples (context windows
    * of [[ChunkSize]] tokens, stride [[ChunkStride]], so consecutive
    * chunks overlap by ChunkSize − ChunkStride tokens). A generator
    * over the scan (explode of the start-offset sequence + array
    * slice): map-only, no shuffle, output rows ∝ corpus tokens /
    * stride — exactly the shape that scales to 100 TB.
    */
  val ChunkSize = 50
  val ChunkStride = 40
  def chunkDocs(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      // sequence(0, -1, step) would be invalid: empty docs leave first
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(ChunkStride)))
          .as("start"))
      .select(
        col("doc_id"),
        (col("start") / ChunkStride).cast("long").as("chunk_idx"),
        array_join(slice(col("t"), col("start") + 1, lit(ChunkSize)), " ")
          .as("chunk_text"),
        least(size(col("t")) - col("start"), lit(ChunkSize)).cast("long")
          .as("n_tok"))
  }

  /** PII redaction patterns, shared verbatim with the oracle SQL.
    * RE2/Java-common subset only (no backreferences, no lookaround)
    * so both engines compile the identical automaton.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val IpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII scrubbing — the redaction pass a web-corpus pipeline runs
    * before training (emails, phone numbers, IPv4 addresses →
    * typed placeholders), with per-document match counts for the
    * scrub-rate telemetry. The fixture prose contains no natural PII,
    * so both engines first append a deterministic synthetic
    * contact-info tail derived from doc_id — the redaction logic
    * itself (three chained codegen'd regexp_replace passes over the
    * scan, map-only, no shuffle) is then exercised on every row.
    * Counts are taken on the pre-redaction text so they are
    * independent of replacement order; replacements run
    * email → phone → IP (the patterns are mutually exclusive: the
    * phone class has no dots, the IP form no dashes).
    */
  def redactPii(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" at 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
      lit(".7"))
    Tables.documents(s, dir)
      .select(col("doc_id"), aug.as("aug"))
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("aug"), lit(EmailRe), lit("<EMAIL>")),
            lit(PhoneRe), lit("<PHONE>")),
          lit(IpRe), lit("<IP>")).as("redacted"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("aug"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phone"),
        size(regexp_extract_all(col("aug"), lit(IpRe), lit(0)))
          .cast("long").as("n_ip"))
  }

  /** (w1, w2, c_xy) bigram-adjacency counts — the shared frame behind
    * [[collocationPmi]] and graph.GraphOps.pageRank. One typed flatMap
    * pass plus one hash aggregate.
    */
  def bigramCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("text")).as[String]
      .flatMap { t =>
        val toks = graft.mr.MrJobs.tokenize(t)
        if (toks.lengthCompare(2) < 0) Nil
        else toks.sliding(2).map(w => (w.head, w(1)))
      }
      .toDF("w1", "w2")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
  }

  /** PMI-scored bigram collocations — the phrase-detection statistic
    * (Mikolov-style word2vec phrasing, tokenizer-merge candidates):
    * pmi = ln(c(x,y)·N / (c(x,·)·c(·,y))) over the bigram universe.
    * One shuffle for the bigram counts; the two marginals re-aggregate
    * that same (already small, |vocab|²-bounded) frame; N is a
    * broadcast scalar. The min-count gate (≥5) is the standard noise
    * floor and keeps the output collocation-sized.
    */
  def collocationPmi(s: SparkSession, dir: String): DataFrame = {
    val big = bigramCounts(s, dir)
    val cx = big.groupBy("w1").agg(sum("c_xy").as("c_x"))
    val cy = big.groupBy("w2").agg(sum("c_xy").as("c_y"))
    val n = big.agg(sum("c_xy").as("n"))
    big.join(cx, "w1").join(cy, "w2").crossJoin(broadcast(n))
      .filter(col("c_xy") >= 5)
      .select(col("w1"), col("w2"), col("c_xy"),
        round(log((col("c_xy").cast("double") * col("n")) /
          (col("c_x") * col("c_y"))), 6).as("pmi"))
  }

  /** Heavy-hitter words via the ApproxTopK sketch (Spark 4.1's
    * approx_top_k aggregate) — the streaming-friendly frequent-items
    * summary whose state is a fixed-size sketch instead of the full
    * vocabulary (the exact top-k needs a |vocab|-sized aggregate;
    * this needs O(capacity)). The sketch returns every tracked item
    * and the final top-10 cut is a deterministic (cnt DESC, word)
    * re-rank of that capacity-bounded set — the fixture corpus has
    * count TIES at the top-10 boundary (sf0.01: merge/slow both 918),
    * so cutting inside the sketch (whose tie order is unspecified)
    * would be nondeterministic, while re-ranking ≤capacity rows is
    * free.
    *
    * CAPACITY IS LOAD-BEARING, not a tuning knob: the sketch reports
    * only items it can PROVE heavy, so once distinct items exceed
    * maxItemsTracked a near-uniform corpus yields ZERO rows — found
    * empirically when the 10×-docs stress fixture (310 distinct
    * tokens) silently emptied this query at the old capacity of 100.
    * 4096 dominates every fixture vocabulary (sf0.1: 31; 10×-docs
    * stress: 310) with two orders of headroom while staying O(1)
    * model state; with capacity ≥ vocab the tracked counts are exact
    * and the exact-top-10 DuckDB oracle hash-matches at every scale
    * point. At true corpus scale, size capacity from the Heaps-law
    * vocabulary bound (or accept provable-heavy-hitters-only
    * semantics — never an empty set at skewed real-text frequencies).
    */
  def approxTopKWords(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .selectExpr("approx_top_k(tok, 100, 4096) AS tk")
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("word"), col("e.count").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(10)
  }

  /** Mergeable heavy-hitters across shards — the [[approxTopKWords]]
    * sketch in its SCATTER-GATHER form (approx_top_k_accumulate per
    * shard → approx_top_k_combine → estimate), the same partial/merge
    * algebra as the HLL union family (`approx_distinct_union`): each
    * shard (here the language partition; at 100 TB, an executor or a
    * day partition) ships one O(capacity) sketch instead of its
    * vocabulary, and the coordinator merges sketches — the
    * communication pattern that makes distributed heavy-hitters an
    * aggregation-tree problem rather than a shuffle-the-vocabulary
    * problem. With capacity ≥ vocab the merged counts are exact, so
    * the exact-top-10 oracle hash-matches (capacity is load-bearing:
    * see the [[approxTopKWords]] overflow note).
    */
  def approxTopKUnion(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(expr("approx_top_k_accumulate(tok, 4096)").as("sk"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(sk, 4096), 100)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("word"), col("e.count").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(10)
  }

  /** Feature hashing (the "hashing trick") — fixed-width sparse
    * featurization: every token folds into one of [[HashDim]] buckets
    * through the engine-shared md5 bucket (same construction as
    * [[SplitHash]], so the oracle reproduces it bit-for-bit), and the
    * (doc, bucket) counts are the sparse feature vector a linear
    * model / sketch consumer trains on. Vocabulary-independent state:
    * one hash aggregate whose key space is docs × HashDim regardless
    * of corpus vocabulary — the property that makes the op safe at
    * 100 TB where a learned vocabulary would not be.
    */
  val HashDim = 32L

  /** The engine-shared token→bucket fold (md5-prefix construction, as
    * [[SplitHash]]), exposed for direct spec verification.
    */
  def hashBucket(c: Column): Column =
    pmod(SplitHash.fold(c.cast("binary")), lit(HashDim))

  def featureHashing(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("bucket", hashBucket(col("tok")))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("cnt"))

  val all: Seq[Q] = Seq(
    Q("approx_top_k_words",
      s"""SELECT tok AS word, COUNT(*) AS cnt
         |FROM (SELECT unnest($tokensSql) AS tok FROM documents)
         |GROUP BY 1 ORDER BY cnt DESC, word LIMIT 10""".stripMargin)(approxTopKWords),
    // merged per-shard sketches reproduce the exact global counts
    // (capacity >= vocab), so the union query shares the exact oracle
    Q("approx_top_k_union",
      s"""SELECT tok AS word, COUNT(*) AS cnt
         |FROM (SELECT unnest($tokensSql) AS tok FROM documents)
         |GROUP BY 1 ORDER BY cnt DESC, word LIMIT 10""".stripMargin)(approxTopKUnion),
    Q("feature_hashing",
      s"""SELECT doc_id,
         |  ${SplitHash.foldSql("tok")} % $HashDim
         |    AS bucket,
         |  COUNT(*) AS cnt
         |FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
         |GROUP BY 1, 2""".stripMargin)(featureHashing),
    Q("ngram_bigrams",
      s"""SELECT bigram, COUNT(*) AS cnt FROM (
         |  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
         |    i -> t[i] || ' ' || t[i+1])) AS bigram
         |  FROM (SELECT $tokensSql AS t FROM documents))
         |GROUP BY bigram""".stripMargin)(ngramBigrams),
    Q("phrase_match",
      s"""WITH t AS (
         |  SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents),
         |    unnest(range(1, len(t) + 1)) AS u(i)
         |  WHERE t[i] IN ('$PhraseW1', '$PhraseW2'))
         |SELECT a.doc_id, COUNT(*) AS n_matches, MIN(a.pos) AS first_pos
         |FROM t a JOIN t b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  AND a.tok = '$PhraseW1' AND b.tok = '$PhraseW2'
         |GROUP BY 1""".stripMargin)(phraseMatch),
    Q("phrase_match_indexed",
      s"""WITH t AS (
         |  SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents),
         |    unnest(range(1, len(t) + 1)) AS u(i)
         |  WHERE t[i] IN ('$PhraseW1', '$PhraseW2'))
         |SELECT a.doc_id, COUNT(*) AS n_matches, MIN(a.pos) AS first_pos
         |FROM t a JOIN t b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  AND a.tok = '$PhraseW1' AND b.tok = '$PhraseW2'
         |GROUP BY 1""".stripMargin)(phraseMatchIndexed),
    Q("tfidf",
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($tokensSql) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |d AS (SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
         |n AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT doc_id, term,
         |  round(tf * (ln((1.0 + n.n) / (1.0 + df)) + 1), 6) AS tfidf
         |FROM d, n""".stripMargin)(tfidf),
    Q("lang_id", langIdOracle)(langId),
    Q("text_quality",
      s"""SELECT doc_id,
         |  length(text) AS n_chars,
         |  len(t) AS n_tokens,
         |  round(list_sum(list_transform(t, x -> length(x)))
         |    / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS avg_token_len,
         |  round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
         |    / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
         |  round(len(list_filter(t, x -> list_contains(${stopwords.mkString("['", "','", "']")}, x)))
         |    / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS stopword_ratio
         |FROM (SELECT doc_id, text, $tokensSql AS t FROM documents)""".stripMargin)(textQuality),
    Q("token_stats",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\S+')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
        |  round(length(text) / CAST(greatest(
        |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')), 1) AS DOUBLE), 6)
        |    AS chars_per_token
        |FROM documents""".stripMargin)(tokenStats),
    Q("weighted_sample",
      s"""WITH k AS (
         |  SELECT source, doc_id, n_chars,
         |    round(-ln((${SplitHash.foldSql("CAST(doc_id AS VARCHAR)")}
         |      % 1000000 + 1) / 1000001.0) / n_chars, 6) AS key
         |  FROM documents)
         |SELECT source, doc_id, n_chars, key,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY key, doc_id) AS BIGINT) AS rn
         |FROM k QUALIFY rn <= $WeightedSampleK""".stripMargin)(weightedSample),
    Q("readability",
      """SELECT doc_id, n_words, n_sents, n_syll,
        |  ((2 * (2068350 * n_sents * n_words - 10150 * n_words * n_words
        |         - 846000 * n_syll * n_sents)
        |    + CASE WHEN (2068350 * n_sents * n_words - 10150 * n_words * n_words
        |                 - 846000 * n_syll * n_sents) < 0
        |        THEN -(n_sents * n_words) ELSE n_sents * n_words END)
        |   // (2 * n_sents * n_words)) / 10000.0 AS flesch
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
        |      AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |      AS n_sents,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
        |      AS n_syll
        |  FROM documents)
        |WHERE n_words > 0""".stripMargin)(readability),
    Q("freq_of_freqs",
      s"""WITH tc AS (
         |  SELECT tok, COUNT(*) AS c FROM (
         |    SELECT unnest($tokensSql) AS tok FROM documents)
         |  GROUP BY 1),
         |sp AS (SELECT c, COUNT(*) AS n_types FROM tc GROUP BY 1)
         |SELECT c, n_types,
         |  CAST(SUM(n_types) OVER (ORDER BY c) AS BIGINT) AS cum_types,
         |  round(n_types / CAST(SUM(n_types) OVER () AS DOUBLE), 6)
         |    AS type_share
         |FROM sp""".stripMargin)(freqOfFreqs),
    Q("token_ids",
      s"""WITH tc AS (
         |  SELECT tok, COUNT(*) AS cnt FROM (
         |    SELECT unnest($tokensSql) AS tok FROM documents)
         |  GROUP BY 1),
         |v AS (SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok)
         |  AS BIGINT) AS token_id FROM tc)
         |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, token_id
         |FROM (SELECT doc_id, $tokensSql AS t FROM documents WHERE doc_id < 50),
         |  unnest(range(1, len(t) + 1)) AS u(i)
         |JOIN v ON t[i] = v.tok""".stripMargin)(tokenIds),
    Q("length_buckets",
      """WITH d AS (
        |  SELECT CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
        |    AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT n_tokens,
        |    CASE WHEN n_tokens = 1 THEN CAST(1 AS BIGINT)
        |      ELSE (CAST(1 AS BIGINT) << length(bin(n_tokens - 1)))
        |    END AS bucket
        |  FROM d WHERE n_tokens > 0)
        |SELECT bucket, COUNT(*) AS n_docs, MAX(n_tokens) AS max_len,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_len,
        |  round(1.0 - CAST(SUM(n_tokens) AS BIGINT)
        |    / CAST(COUNT(*) * bucket AS DOUBLE), 6) AS pad_waste
        |FROM b GROUP BY bucket""".stripMargin)(lengthBuckets),
    Q("explode_pos",
      s"""SELECT doc_id, i - 1 AS pos, t[i] AS token
         |FROM (SELECT doc_id, $tokensSql AS t FROM documents WHERE doc_id < 50),
         |  unnest(range(1, len(t) + 1)) AS u(i)""".stripMargin)(explodePos),
    Q("profile_corpus",
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_texts,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
        |FROM documents""".stripMargin)(profileCorpus),
    Q("hash_split",
      s"""SELECT doc_id, b AS bucket,
         |  CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, ${SplitHash.bucketSql("doc_id")} AS b
         |FROM documents)""".stripMargin)(hashSplit),
    Q("token_entropy",
      s"""WITH tc AS (
         |  SELECT source, tok, COUNT(*) AS c FROM (
         |    SELECT source, unnest($tokensSql) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |t AS (SELECT *, SUM(c) OVER (PARTITION BY source) AS n FROM tc)
         |SELECT source, COUNT(*) AS n_distinct, CAST(MAX(n) AS BIGINT) AS n_tokens,
         |  round(-SUM((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))), 6)
         |    AS entropy
         |FROM t GROUP BY source""".stripMargin)(tokenEntropy),
    Q("lang_confusion",
      s"""WITH pred AS ($langIdOracle)
         |SELECT d.lang, p.pred_lang, COUNT(*) AS n,
         |  round(COUNT(*)
         |    / CAST(SUM(COUNT(*)) OVER (PARTITION BY d.lang) AS DOUBLE), 6)
         |    AS row_share
         |FROM documents d JOIN pred p ON d.doc_id = p.doc_id
         |GROUP BY d.lang, p.pred_lang""".stripMargin)(langConfusion),
    Q("source_overlap",
      s"""WITH st AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source, unnest($tokensSql) AS tok FROM documents)),
         |sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY 1),
         |it AS (
         |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
         |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, n_common,
         |  round(n_common / CAST(sa.n + sb.n - n_common AS DOUBLE), 6)
         |    AS jaccard
         |FROM it JOIN sz sa ON it.src_a = sa.source
         |JOIN sz sb ON it.src_b = sb.source""".stripMargin)(sourceOverlap),
    Q("topic_words", topicWordsOracle)(topicWords),
    Q("perplexity_score",
      s"""WITH tr AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE ${SplitHash.bucketSql("doc_id")} < 800),
         |tc AS (
         |  SELECT tok, COUNT(*) AS c FROM (
         |    SELECT unnest($tokensSql) AS tok FROM tr)
         |  GROUP BY 1),
         |nv AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM tc),
         |toks AS (
         |  SELECT doc_id, unnest($tokensSql) AS tok FROM documents),
         |sc AS (
         |  SELECT doc_id,
         |    -ln((COALESCE(c, 0) + 1) / CAST(n + v AS DOUBLE)) AS tok_nll
         |  FROM toks LEFT JOIN tc ON toks.tok = tc.tok, nv),
         |d AS (
         |  SELECT doc_id, COUNT(*) AS n_tok, round(AVG(tok_nll), 6) AS nll
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_tok, nll,
         |  CASE WHEN nll < $NllHeadMax THEN 'head'
         |       WHEN nll < $NllMiddleMax THEN 'middle'
         |       ELSE 'tail' END AS band
         |FROM d""".stripMargin)(perplexityScore),
    Q("perplexity_bigram",
      s"""WITH toks AS (
         |  SELECT doc_id, t[i] AS tok,
         |    CASE WHEN i > 1 THEN t[i-1] END AS prev
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents),
         |    unnest(range(1, len(t) + 1)) AS u(i)),
         |tr AS (SELECT * FROM toks
         |  WHERE ${SplitHash.bucketSql("doc_id")} < 800),
         |uc AS (SELECT tok, COUNT(*) AS uc FROM tr GROUP BY 1),
         |nv AS (SELECT CAST(SUM(uc) AS BIGINT) AS n, COUNT(*) AS v FROM uc),
         |bc AS (SELECT prev, tok, COUNT(*) AS bc FROM tr
         |  WHERE prev IS NOT NULL GROUP BY 1, 2),
         |cc AS (SELECT prev AS ctx, CAST(SUM(bc) AS BIGINT) AS cc
         |  FROM bc GROUP BY 1),
         |sc AS (
         |  SELECT toks.doc_id,
         |    CASE WHEN cc.cc IS NOT NULL
         |      THEN 0.7 * (COALESCE(bc.bc, 0) / cc.cc)
         |        + 0.3 * ((COALESCE(uc.uc, 0) + 1) / CAST(n + v AS DOUBLE))
         |      ELSE (COALESCE(uc.uc, 0) + 1) / CAST(n + v AS DOUBLE) END AS p
         |  FROM toks
         |  LEFT JOIN uc ON toks.tok = uc.tok
         |  LEFT JOIN bc ON toks.prev = bc.prev AND toks.tok = bc.tok
         |  LEFT JOIN cc ON toks.prev = cc.ctx, nv)
         |SELECT doc_id, COUNT(*) AS n_tok, round(AVG(-ln(p)), 6) AS nll
         |FROM sc GROUP BY 1""".stripMargin)(perplexityBigram),
    Q("zipf_slope",
      s"""WITH c AS (
         |  SELECT tok, COUNT(*) AS cnt FROM (
         |    SELECT unnest($tokensSql) AS tok FROM documents) GROUP BY 1),
         |r AS (SELECT cnt,
         |  row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM c),
         |xy AS (SELECT round(ln(CAST(rank AS DOUBLE)), 6) AS x,
         |  round(ln(CAST(cnt AS DOUBLE)), 6) AS y FROM r),
         |s AS (SELECT COUNT(*) AS n,
         |  CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         |  CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         |  CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         |  CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxy
         |  FROM xy)
         |SELECT n AS n_vocab,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
         |  round((sy - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         |    * sx) / n, 6) AS intercept
         |FROM s""".stripMargin)(zipfSlope),
    Q("kneser_ney",
      s"""WITH toks AS (
         |  SELECT doc_id, t[i] AS tok,
         |    CASE WHEN i > 1 THEN t[i-1] END AS prev
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents),
         |    unnest(range(1, len(t) + 1)) AS u(i)),
         |big AS (SELECT * FROM toks WHERE prev IS NOT NULL),
         |bc AS (SELECT prev, tok, COUNT(*) AS bc FROM big GROUP BY 1, 2),
         |cc AS (SELECT prev AS w1, CAST(SUM(bc) AS BIGINT) AS cc,
         |  COUNT(*) AS n1p_fwd FROM bc GROUP BY 1),
         |rev AS (SELECT tok AS w2, COUNT(*) AS n1p_rev FROM bc GROUP BY 1),
         |btot AS (SELECT COUNT(*) AS b FROM bc),
         |sc AS (
         |  SELECT big.doc_id,
         |    (bc.bc - $KnDiscount) / cc.cc
         |      + $KnDiscount * cc.n1p_fwd / cc.cc * (rev.n1p_rev / btot.b)
         |      AS p
         |  FROM big
         |  JOIN bc ON big.prev = bc.prev AND big.tok = bc.tok
         |  JOIN cc ON big.prev = cc.w1
         |  JOIN rev ON big.tok = rev.w2, btot),
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS n_big,
         |    CAST(SUM(CAST(round(-ln(p) * 1e6) AS BIGINT)) AS BIGINT)
         |      AS sum_micro
         |  FROM sc GROUP BY doc_id),
         |mic AS (
         |  SELECT doc_id, n_big,
         |    ((10 * sum_micro) // n_big + 5) // 10 AS nll_micro
         |  FROM agg)
         |SELECT doc_id, n_big,
         |  nll_micro / 1000000.0 AS kn_nll,
         |  round(exp(nll_micro / 1000000.0), 6) AS kn_ppl
         |FROM mic""".stripMargin)(kneserNey),
    Q("vocab_top",
      s"""WITH tc AS (
         |  SELECT tok, COUNT(*) AS cnt FROM (
         |    SELECT unnest($tokensSql) AS tok FROM documents)
         |  GROUP BY 1),
         |n AS (SELECT SUM(cnt) AS n FROM tc)
         |SELECT tok, cnt,
         |  CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank,
         |  round(SUM(cnt) OVER (ORDER BY cnt DESC, tok)
         |    / CAST(n.n AS DOUBLE), 6) AS coverage
         |FROM tc, n""".stripMargin)(vocabTop),
    Q("oov_rate",
      s"""WITH toks AS (
         |  SELECT source, unnest($tokensSql) AS tok FROM documents),
         |v AS (
         |  SELECT tok FROM (
         |    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1)
         |  ORDER BY cnt DESC, tok LIMIT $OovVocabSize)
         |SELECT source, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  round(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
         |FROM toks LEFT JOIN v ON toks.tok = v.tok
         |GROUP BY source""".stripMargin)(oovRate),
    Q("source_mix_weights",
      s"""$MixWeightsCtes
         |SELECT lang, n_docs, weight,
         |  round(weight * (SELECT n FROM tot) / CAST(n_docs AS DOUBLE), 6)
         |    AS epochs
         |FROM w""".stripMargin)(sourceMixWeights),
    Q("sample_temperature",
      s"""$MixWeightsCtes,
         |thr AS (
         |  SELECT lang,
         |    CAST(floor(weight / (SELECT MAX(weight) FROM w) * 1000)
         |      AS BIGINT) AS kp
         |  FROM w)
         |SELECT doc_id, d.lang FROM documents d
         |JOIN thr ON d.lang = thr.lang
         |WHERE ${SplitHash.bucketSql("doc_id")} < kp""".stripMargin)(
      sampleTemperature),
    Q("repetition_ratio",
      s"""SELECT doc_id, len(g3) AS total_3g,
         |  len(list_distinct(g3)) AS distinct_3g,
         |  round(1 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE), 6)
         |    AS rep_ratio
         |FROM (SELECT doc_id, list_transform(range(1, len(t) - 1),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents)
         |  WHERE len(t) >= 3)""".stripMargin)(repetitionRatio),
    Q("quality_filter",
      s"""WITH r AS (
         |  SELECT doc_id, len(t) AS n_tok,
         |    round(1 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE), 6)
         |      AS rep_ratio
         |  FROM (SELECT doc_id, t, list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
         |    FROM (SELECT doc_id, $tokensSql AS t FROM documents)
         |    WHERE len(t) >= 3)),
         |lab AS (
         |  SELECT doc_id, n_tok, rep_ratio,
         |    CASE WHEN n_tok < 30 THEN 'too_short'
         |         WHEN n_tok > 90 THEN 'too_long'
         |         WHEN rep_ratio > 0.02 THEN 'repetitive'
         |         ELSE 'ok' END AS reason
         |  FROM r)
         |SELECT doc_id, n_tok, rep_ratio, reason = 'ok' AS keep, reason
         |FROM lab""".stripMargin)(qualityFilter),
    Q("mask_spans",
      s"""SELECT doc_id,
         |  array_to_string(list_transform(range(1, len(t) + 1),
         |    i -> CASE WHEN (i - 1) % 5 = 0 THEN '<extra_id>'
         |              ELSE t[i] END), ' ') AS masked,
         |  len(t) AS n_tok,
         |  CASE WHEN len(t) > 0 THEN (len(t) - 1) // 5 + 1 ELSE 0 END
         |    AS n_masked
         |FROM (SELECT doc_id, $tokensSql AS t FROM documents)""".stripMargin)(
      maskSpans),
    Q("sample_bootstrap",
      s"""SELECT doc_id, k, unnest(range(1, k + 1)) AS replica FROM (
         |  SELECT doc_id,
         |    CASE ${PoissonCdfPerMille.zipWithIndex
              .map { case (t, i) => s"WHEN b < $t THEN $i" }.mkString(" ")}
         |         ELSE ${PoissonCdfPerMille.length} END AS k
         |  FROM (SELECT doc_id, ${SplitHash.bucketSql("doc_id")} AS b
         |    FROM documents))
         |WHERE k > 0""".stripMargin)(sampleBootstrap),
    Q("sample_stratified",
      s"""SELECT doc_id, lang, bucket FROM (
         |  SELECT d.doc_id, d.lang,
         |    ${SplitHash.bucketSql("d.doc_id")} AS bucket,
         |    COALESCE(r.keep, $DefaultKeepPerMille) AS keep
         |  FROM documents d
         |  LEFT JOIN (VALUES ${KeepPerMille.map { case (l, k) => s"('$l', $k)" }
            .mkString(", ")}) AS r(lang2, keep)
         |    ON d.lang = r.lang2)
         |WHERE bucket < keep""".stripMargin)(sampleStratified),
    Q("pack_batches",
      s"""SELECT doc_id, source, n_tok,
         |  CAST(SUM(n_tok) OVER w AS BIGINT) AS cum_tok,
         |  CAST(floor((SUM(n_tok) OVER w - n_tok) / $PackBudget.0) AS BIGINT)
         |    AS batch_idx
         |FROM (SELECT doc_id, source,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_tok
         |  FROM documents)
         |WINDOW w AS (PARTITION BY source ORDER BY doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)(packBatches),
    Q("chunk_docs",
      s"""SELECT doc_id, st // $ChunkStride AS chunk_idx,
         |  array_to_string(list_slice(t, st + 1, st + $ChunkSize), ' ')
         |    AS chunk_text,
         |  least(len(t) - st, $ChunkSize) AS n_tok
         |FROM (SELECT doc_id, $tokensSql AS t FROM documents),
         |  unnest(range(0, len(t), $ChunkStride)) AS u(st)""".stripMargin)(
      chunkDocs),
    Q("redact_pii",
      s"""WITH a AS (
         |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@mail.example.com or +1-555-'
         |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |    || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g'),
         |    '$IpRe', '<IP>', 'g') AS redacted,
         |  len(regexp_extract_all(aug, '$EmailRe')) AS n_email,
         |  len(regexp_extract_all(aug, '$PhoneRe')) AS n_phone,
         |  len(regexp_extract_all(aug, '$IpRe')) AS n_ip
         |FROM a""".stripMargin)(redactPii),
    Q("collocation_pmi",
      s"""WITH b AS (
         |  SELECT w1, w2, COUNT(*) AS c_xy FROM (
         |    SELECT t[i] AS w1, t[i+1] AS w2
         |    FROM (SELECT $tokensSql AS t FROM documents),
         |      unnest(range(1, greatest(len(t), 1))) AS u(i))
         |  GROUP BY 1, 2),
         |cx AS (SELECT w1 AS x1, SUM(c_xy) AS c_x FROM b GROUP BY 1),
         |cy AS (SELECT w2 AS y2, SUM(c_xy) AS c_y FROM b GROUP BY 1),
         |n AS (SELECT SUM(c_xy) AS n FROM b)
         |SELECT b.w1, b.w2, b.c_xy,
         |  round(ln((CAST(b.c_xy AS DOUBLE) * n.n) / (c_x * c_y)), 6) AS pmi
         |FROM b JOIN cx ON b.w1 = x1 JOIN cy ON b.w2 = y2, n
         |WHERE b.c_xy >= 5""".stripMargin)(collocationPmi),
    Q("doc_fingerprint",
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
        |    regexp_extract_all(lower(text), '[a-z]+'),
        |    tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 2147483647)),
        |    (acc, h) -> (acc * 31 + h) % 2147483647) AS fingerprint
        |FROM documents""".stripMargin)(docFingerprint),
  )
}
