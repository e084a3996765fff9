package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** BPE merge training — the tokenizer-training loop itself, the step
  * upstream of every token-counting operator here: learn the top
  * [[Bpe.Merges]] byte-pair merges from the corpus by repeatedly
  * merging the most frequent adjacent symbol pair.
  *
  * The scale structure is what matters: the corpus collapses to the
  * DISTINCT word vocabulary with counts FIRST (one aggregation —
  * tokenizer training is vocab-sized, never corpus-sized), then each
  * round is ONE job: a map-side explode of the current segmentation's
  * adjacent symbol pairs weighted by word count (the segmentation is
  * re-derived per word from the merges learned so far — a model-sized
  * closure — see [[bpeMerges]]), then one tiny aggregation picking
  * the argmax pair (driver receives ONE row — the kmeansIterate
  * discipline, a scalar not a collect). Only the (word, count)
  * vocabulary is ever cached.
  *
  * Iterative — but with a FIXED round count, so the loop unrolls into
  * [[Merges]] chained SQL CTEs and the DuckDB gate can replay
  * training exactly (see [[replayCtes]]): each round recomputes pair
  * counts, picks the same (freq DESC, left, right) argmax, and
  * applies the merge via string `replace` over a delimited symbol
  * string, whose leftmost-nonoverlapping semantics equal
  * [[mergeOnce]]'s greedy scan. BpeSpec additionally recomputes the
  * merge sequence locally and asserts equality — the same check,
  * without SQL in the loop.
  */
object Bpe {

  val Merges = 8

  /** One greedy left-to-right merge pass (standard BPE apply). */
  def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The same training loop over an in-memory vocabulary — the spec's
    * oracle, and the single definition both paths share.
    */
  def trainLocal(vocab: Seq[(String, Long)], k: Int): Seq[(String, String, Long)] = {
    var segs = vocab.map { case (w, c) => (w.map(_.toString).toVector, c) }
    (1 to k).flatMap { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (syms, c) =>
        syms.indices.dropRight(1).foreach { i =>
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + c
        }
      }
      if (counts.isEmpty) Nil
      else {
        val ((a, b), f) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        segs = segs.map { case (syms, c) => (mergeOnce(syms, a, b), c) }
        Seq((a, b, f))
      }
    }
  }

  /** Distributed training: vocabulary from the corpus, then
    * [[Merges]] rounds of argmax-pair selection.
    *
    * The vocabulary (word, count) is cached ONCE; each round's single
    * job re-derives the current segmentation on the executor by
    * applying the merges learned SO FAR (a ≤[[Merges]]-entry model
    * riding the task closure) to the raw word — identical to
    * maintaining a cached generation per round (generation k IS
    * "apply merge k to generation k−1", so replaying the list from
    * the base segmentation is the same function), but with none of
    * the per-round cache churn the previous shape paid: no
    * generation-sized typed cache swap, no materialization job per
    * round, no Vector[String] frames pinning executor memory across
    * rounds (the round-8 heap lesson: persisted object bags are what
    * a 2 GiB executor collects against). Re-applying r−1 merges per
    * word is O([[Merges]]²) string scans over a vocab-sized frame —
    * model-sized arithmetic, invisible next to one job's scheduling.
    */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NO vocab repartition (tried, measured, REVERTED in r12): at
    // fixture scale the per-round replay is too small for the extra
    // exchange to pay (1.68→1.90 s), and at 100× docs the vocabulary
    // is millions of rows whose re-shuffle costs 2.6 s outright
    // (6.10→8.70 s) — the aggregate's own partitioning is already
    // right at every scale.
    val vocab = Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .cache()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    val applied = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (r <- 1 to Merges) {
      val model = applied.toArray // snapshot: the closure must not share the buffer
      val best = vocab
        .flatMap { case (w, c) =>
          var syms = w.map(_.toString).toVector
          model.foreach { case (a, b) => syms = mergeOnce(syms, a, b) }
          syms.indices.dropRight(1).map(i => ((syms(i), syms(i + 1)), c))
        }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups(_ + _)
        .map { case ((a, b), f) => (a, b, f) }
        .toDF("a", "b", "f")
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect() // exactly ONE row per round — a scalar, not data
      best.headOption.foreach { case (a, b, f) =>
        merges += ((r, a, b, f))
        applied += ((a, b))
      }
    }
    vocab.unpersist()
    merges.result().toDF("rank", "left", "right", "freq")
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), col("freq"))
  }

  /** Apply the trained merge table to the corpus: per document, the
    * symbol count before (characters of its words) and after the
    * [[Merges]] merges — the "how much does this tokenizer compress
    * my corpus" statistic every tokenizer change is judged by. The
    * merge table is collected ([[Merges]] rows — a model, not data)
    * and applied to the DISTINCT word vocabulary (vocab-sized work,
    * exactly as in training), which joins back onto per-document word
    * counts — the corpus text itself is never re-segmented row by
    * row. Like training, the merge loop is not SQL-expressible;
    * BpeSpec recomputes the encoding locally and asserts exact
    * equality.
    */
  /** Trained merge table per (session, dataset) — the verifiedPairs
    * discipline from graft.dedup: encoding must not re-run the
    * training loop when both execute in one session, and entries of
    * stopped sessions are evicted so a session-cycling JVM never pins
    * dead plans. `bpe_merges` itself never reads this cache — it is
    * the thing being measured.
    */
  private val mergeCache =
    scala.collection.mutable.Map[(SparkSession, String), Array[(String, String)]]()

  /** Test hook: drop the memo so a spec can race the cold-miss path. */
  private[graft] def clearMergeCache(): Unit =
    synchronized { mergeCache.clear() }
  private def trainedMerges(s: SparkSession, dir: String): Array[(String, String)] = {
    val key = (s, dir)
    // lock only around map access, never around the multi-job training
    // run — a concurrent caller for another (session, dir) must train
    // independently, not queue behind this one's Spark jobs. The race
    // window means two callers may train the same key once each; the
    // result is deterministic, so last-publish-wins is harmless.
    val hit = synchronized {
      mergeCache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      mergeCache.get(key)
    }
    hit.getOrElse {
      import s.implicits._
      val trained = bpeMerges(s, dir).select(col("left"), col("right"))
        .as[(String, String)].collect()
      synchronized { mergeCache.getOrElseUpdate(key, trained) }
    }
  }

  /** The distinct vocabulary of `grouped` (any frame with a word
    * column `w`) segmented by the trained merge model:
    * (w, n_chars, n_syms). ONE segmentation path for every consumer
    * ([[bpeEncode]], [[bpeFertility]]) so the symbol framing can
    * never drift between them.
    */
  private def segmentedVocab(
      s: SparkSession, dir: String, grouped: DataFrame): DataFrame = {
    import s.implicits._
    val merges = trainedMerges(s, dir)
    grouped.select(col("w")).distinct()
      .as[String]
      .map { w =>
        val syms = merges.foldLeft(w.map(_.toString).toVector) {
          case (v, (a, b)) => mergeOnce(v, a, b)
        }
        (w, w.length.toLong, syms.length.toLong)
      }
      .toDF("w", "n_chars", "n_syms")
  }

  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val perDocWord = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
    perDocWord.join(segmentedVocab(s, dir, perDocWord), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_chars")).as("n_char_tokens"),
        sum(col("cnt") * col("n_syms")).as("n_bpe_tokens"))
  }

  /** Tokenizer fertility per source — the cross-corpus health metric
    * for a trained tokenizer (fertility = BPE tokens per word;
    * chars-per-token = the compression it buys): a tokenizer trained
    * on one distribution "shatters" text from another, and this is
    * the report that catches it per source before training does.
    * Same vocab-sized segmentation as [[bpeEncode]] (shared
    * [[trainedMerges]] memo — the train loop runs once per session);
    * the per-source rollup is one aggregate over (doc, word) counts
    * joined to the segmented vocabulary. Ratios are single IEEE
    * divisions of exact longs, rounded identically in both engines.
    */
  def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    val perSrcWord = Tables.documents(s, dir)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
    perSrcWord.join(segmentedVocab(s, dir, perSrcWord), Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_chars")).as("n_chars"),
        sum(col("cnt") * col("n_syms")).as("n_bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_chars") / col("n_bpe_tokens").cast("double"), 6)
          .as("chars_per_token"))
  }

  /** The segmented-vocabulary CTE shared by the encode and fertility
    * oracles (the SQL twin of [[segmentedVocab]]).
    */
  private def encCteSql: String =
    s"""enc AS (
       |  SELECT w, CAST(length(w) AS BIGINT) AS n_chars,
       |    CAST(len(string_split(trim(s, '|'), '||')) AS BIGINT) AS n_syms
       |  FROM seg$Merges)""".stripMargin

  private def fertilityOracle: String =
    s"""WITH $replayCtes,
       |$encCteSql,
       |psw AS (
       |  SELECT source, w, COUNT(*) AS cnt FROM (
       |    SELECT source, unnest($tokensSql) AS w FROM documents)
       |  GROUP BY 1, 2)
       |SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_words,
       |  CAST(SUM(cnt * n_syms) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(SUM(cnt * n_syms) AS BIGINT)
       |    / CAST(SUM(cnt) AS DOUBLE), 6) AS fertility,
       |  round(CAST(SUM(cnt * n_chars) AS BIGINT)
       |    / CAST(SUM(cnt * n_syms) AS DOUBLE), 6) AS chars_per_token
       |FROM psw JOIN enc USING (w) GROUP BY 1""".stripMargin

  private val tokensSql = "regexp_extract_all(lower(text), '[a-z]+')"

  /** DuckDB replay of the training loop, unrolled to [[Merges]] CTE
    * rounds. Word segmentations travel as delimited strings
    * (`|a||b||c|`): the pair (a,b) matches only as `|a||b|` — the
    * doubled inner delimiter means a symbol boundary can never be
    * consumed by one match and still start the next, and the outer
    * sentinels anchor whole symbols (`xa|b` can't match `a|b`) — so
    * SQL `replace`'s leftmost-nonoverlapping scan IS [[mergeOnce]]'s
    * greedy merge. Each round: recount adjacent pairs weighted by
    * word count, pick the (f DESC, a, b) argmax (the Spark side's
    * exact ordering), apply it. The `~` coalesce makes an empty round
    * (no pairs left) replay as a no-op, matching the Scala loop's
    * empty-guard. The whole replay is vocabulary-sized, like training
    * itself. Every CTE is MATERIALIZED: DuckDB inlines CTEs by
    * default, and each round references its predecessor from several
    * places, so an inlined chain re-expands exponentially in the
    * round count — materialization makes the replay linear, one
    * vocab-sized table per round.
    */
  private def replayCtes: String = {
    val steps = (1 to Merges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT t[i] AS a, t[i+1] AS b, CAST(SUM(c) AS BIGINT) AS f
         |  FROM (SELECT string_split(trim(s, '|'), '||') AS t, c FROM seg${k - 1}),
         |    unnest(range(1, len(t))) AS u(i)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT a, b, f FROM p$k ORDER BY f DESC, a, b LIMIT 1),
         |seg$k AS MATERIALIZED (
         |  SELECT w,
         |    replace(s,
         |      COALESCE((SELECT '|' || a || '||' || b || '|' FROM m$k), '~'),
         |      COALESCE((SELECT '|' || a || b || '|' FROM m$k), '~')) AS s,
         |    c
         |  FROM seg${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""words AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
       |    SELECT unnest($tokensSql) AS w FROM documents) GROUP BY 1),
       |seg0 AS MATERIALIZED (
       |  SELECT w, '|' || array_to_string(string_split(w, ''), '||') || '|' AS s, c
       |  FROM words),
       |$steps""".stripMargin
  }

  private def mergesOracle: String = {
    val rows = (1 to Merges).map { k =>
      s"SELECT CAST($k AS BIGINT) AS rank, a AS \"left\", b AS \"right\", f AS freq FROM m$k"
    }.mkString("\nUNION ALL ")
    s"WITH $replayCtes\n$rows"
  }

  private def encodeOracle: String =
    s"""WITH $replayCtes,
       |$encCteSql,
       |pdw AS (
       |  SELECT doc_id, w, COUNT(*) AS cnt FROM (
       |    SELECT doc_id, unnest($tokensSql) AS w FROM documents)
       |  GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
       |  CAST(SUM(cnt * n_chars) AS BIGINT) AS n_char_tokens,
       |  CAST(SUM(cnt * n_syms) AS BIGINT) AS n_bpe_tokens
       |FROM pdw JOIN enc USING (w) GROUP BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("bpe_merges", mergesOracle)(bpeMerges),
    Q("bpe_fertility", fertilityOracle)(bpeFertility),
    Q("bpe_encode", encodeOracle)(bpeEncode))
}
