package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.vecDot

/** Clustering primitives over the embeddings table — the distributed
  * building blocks of cluster-based corpus curation (cluster the
  * corpus, then sample/filter per cluster), a standard step in
  * training-data pipelines. The reference has no ML surface; these
  * extend the engine the way its MapReduce users would have had to
  * hand-write (reference worker.py:129-145 map/reduce pairs).
  *
  * Scale design — the key property of all three queries is that the
  * model state (K centroids, K·dim floats) is tiny while the data is
  * not, so centroids travel to the data as *literals in the plan*:
  *  - [[kmeansAssign]] is a pure map over the corpus — no join, no
  *    shuffle, whole-stage codegen'd via [[graft.functions.DotProductFloat]].
  *    At 100 TB this is embarrassingly parallel over parquet splits.
  *  - [[kmeansUpdate]] (one Lloyd step) adds a single partial+final
  *    aggregation on (cluster, dim) — K·dim groups, map-side combine.
  *  - [[diversitySample]] adds a per-cluster top-N window — k rows
  *    survive per cluster past the rank filter, never a global sort.
  *
  * Centroid seeding is deterministic (vec_id < K, the same convention
  * as SimOps.cosineTopkIvf) so the DuckDB oracle can replicate the
  * whole computation; a k-means++ refinement would change only the
  * seed set, not the plan shape. All similarity arithmetic stays
  * in-plan (centroid norms are sqrt(vec_dot(lit, lit)), evaluated by
  * the same sequential double fold as the oracle's list_sum), so the
  * assignment argmax is bit-identical between engines, not merely
  * close.
  */
object ClusterOps {

  private val K = 16
  private val TopPerCluster = 10

  /** Deterministic centroid seeds, collected once per query build.
    * This is model state, not data (K·dim = 1024 floats); shipping it
    * to the driver and back into the plan as literals is the same
    * move as broadcasting a trained model, and keeps the assignment
    * map-only. Zero vectors are excluded on both sides (cosine is
    * undefined), mirroring the oracle's `WHERE nrm > 0`.
    */
  private def centroidSeeds(s: SparkSession, dir: String): Seq[(Int, Seq[Float])] =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < K)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1)))
      .filter { case (_, v) => v.exists(_ != 0f) }
      .sortBy(_._1)
      .toSeq

  /** Corpus rows with the in-plan norm, zero vectors dropped. */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    withNorm(Tables.embeddings(s, dir))
  }

  /** Cosine similarity of the embedding column to one centroid
    * literal. The centroid's own norm is computed in-plan from the
    * literal (constant-folded once), not on the driver, so the
    * double-fold order matches the oracle exactly.
    */
  private def simTo(cent: Seq[Float]): Column = {
    val c = typedLit(cent)
    vecDot(col("embedding"), c) / (col("nrm") * sqrt(vecDot(c, c)))
  }

  /** Assignment of every vector in `vectors` (vec_id, embedding, nrm
    * columns; zero vectors pre-filtered) to the nearest of `cents`,
    * with unrounded similarity. Pure column expressions over the
    * input frame — no join, no shuffle, no state — so the SAME
    * transform scores a batch corpus or a `readStream` of arriving
    * embeddings (pinned by ClusterOpsSpec's streaming test). argmax =
    * first maximum in centroid order (array_position finds the first
    * match), i.e. ties break toward the lowest cent_id, the same as
    * the oracle's ORDER BY cs DESC, cent_id. Long ids so `cluster`
    * matches the oracle's BIGINT cent_id.
    */
  def assignFrame(vectors: DataFrame, cents: Seq[(Long, Seq[Float])]): DataFrame = {
    // No centroids → no assignments. Without this, array_max over an
    // empty sims array yields null clusters for EVERY row (the oracle
    // returns zero rows) and downstream getLong(0) on the null
    // cluster crashes the Lloyd update.
    if (cents.isEmpty)
      return vectors.filter(lit(false))
        .select(col("vec_id"), col("embedding"),
          lit(null).cast("long").as("cluster"),
          lit(null).cast("double").as("cs"))
    val sims = array(cents.map { case (_, v) => simTo(v) }: _*)
    val ids = typedLit(cents.map(_._1))
    vectors
      .withColumn("sims", sims)
      .withColumn("best", array_max(col("sims")))
      .select(col("vec_id"), col("embedding"),
        element_at(ids, array_position(col("sims"), col("best")).cast("int"))
          .as("cluster"),
        col("best").as("cs"))
  }

  /** Adds the in-plan norm and drops zero vectors — the shape
    * [[assignFrame]] expects; works on batch and streaming frames.
    */
  def withNorm(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), col("embedding"),
        sqrt(vecDot(col("embedding"), col("embedding"))).as("nrm"))
      .filter(col("nrm") > 0)

  private def assignWith(
      s: SparkSession, dir: String, cents: Seq[(Long, Seq[Float])]): DataFrame =
    assignFrame(corpus(s, dir), cents)

  private def assigned(s: SparkSession, dir: String): DataFrame =
    assignWith(s, dir, centroidSeeds(s, dir).map { case (i, v) => (i.toLong, v) })

  /** Assign every vector to its nearest centroid (spherical k-means
    * E-step). Map-only: no shuffle anywhere in the plan.
    */
  def kmeansAssign(s: SparkSession, dir: String): DataFrame =
    assigned(s, dir)
      .select(col("vec_id"), col("cluster"), round(col("cs"), 6).as("sim"))

  /** One Lloyd M-step: per-cluster mean of each embedding dimension.
    * The output is (cluster, dim, n, centroid_val) rows — scalar
    * columns, not an array, so the result is driver-sortable and
    * SQL-comparable (the mm_features lesson). One shuffle, K·dim
    * groups, partial aggregation map-side.
    */
  def kmeansUpdate(s: SparkSession, dir: String): DataFrame =
    assigned(s, dir)
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("dim", col("dim").cast("long"))
      .groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("v").cast("double")), 6).as("centroid_val"))

  /** Recompute centroids from an assignment as float-quantized means:
    * per-(cluster, dim) double mean, rounded to 6 decimals, cast to
    * float. The quantization is the cross-engine determinism trick —
    * double summation order differs between engines in the last ulp,
    * and 1e-6 rounding followed by an IEEE float cast erases it on
    * both sides, so iterated assignments can't drift apart. The
    * collect ships K·dim floats of *model state* to the driver (the
    * standard k-means driver loop — data never leaves the cluster).
    * All-zero centroids (collapsed empty-ish clusters) are dropped,
    * matching the oracle's nrm > 0 guard.
    */
  private def meansOf(assignment: DataFrame): Seq[(Long, Seq[Float])] =
    assignment
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(round(avg(col("v").cast("double")), 6).cast("float").as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getFloat(2)))
      .groupBy(_._1)
      .map { case (c, g) => (c, g.sortBy(_._2).map(_._3).toSeq) }
      .toSeq
      .filter { case (_, v) => v.exists(_ != 0f) }
      .sortBy(_._1)

  /** Three full Lloyd rounds (seed-assign → re-center → assign,
    * twice) — the distributed training loop: per round, one map-only
    * assignment pass over the corpus plus one K·dim-group aggregation
    * for the new centroids; the driver holds only the model. Output
    * is the final assignment. The oracle unrolls the same two
    * re-center steps in SQL, float-quantized identically.
    */
  def kmeansIterate(s: SparkSession, dir: String): DataFrame = {
    var a = assigned(s, dir)
    for (_ <- 1 to 2) a = assignWith(s, dir, meansOf(a))
    a.select(col("vec_id"), col("cluster"), round(col("cs"), 6).as("sim"))
  }

  private val NAnchors = 10
  private val NNegatives = 3

  /** Contrastive triplet mining — the training-pair construction for
    * embedding models: for each anchor (vec_id < [[NAnchors]]), the
    * positive is its nearest cosine neighbor and the negatives are
    * the [[NNegatives]] lowest-id vectors from OTHER k-means clusters
    * (cluster membership as the "semantically different" signal —
    * cheap hard-ish negatives, the standard in-batch-alternative).
    * Deterministic throughout, so the whole mining pipeline is under
    * the differential gate. The positive search is the brute-force
    * correctness baseline; at corpus scale the candidate set would
    * come from SimOps' LSH buckets with identical downstream shape.
    */
  def contrastiveTriplets(s: SparkSession, dir: String): DataFrame = {
    val a = assigned(s, dir).select(
      col("vec_id"), col("embedding"), col("cluster"),
      sqrt(vecDot(col("embedding"), col("embedding"))).as("nrm"))
    val anchors = a.filter(col("vec_id") < NAnchors)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("va"),
        col("nrm").as("nrma"), col("cluster").as("ca"))
    // positive: top-1 cosine neighbor over the corpus
    val cand = a.select(col("vec_id").as("neighbor_id"), col("embedding").as("vc"),
      col("nrm").as("nrmc"))
    val wPos = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cs").desc, col("neighbor_id"))
    val positives = anchors.join(cand, col("neighbor_id") =!= col("anchor_id"))
      .withColumn("cs", vecDot(col("va"), col("vc")) / (col("nrma") * col("nrmc")))
      .withColumn("rn", row_number().over(wPos))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("ca"),
        col("neighbor_id").as("positive_id"), round(col("cs"), 6).as("pos_cos"))
    // negatives: lowest-id members of other clusters, mined equi-style.
    // A direct `cluster <> ca` join would be a nested-loop broadcast of
    // the whole corpus; instead each cluster's lowest-NNegatives ids
    // (a WindowGroupLimit — partial per partition, K·NNegatives rows
    // total) fan out to the K−1 exclusion keys they can serve, the
    // `<>` becomes a filter on that tiny frame, and the anchor join is
    // a broadcast HASH join on the exclusion key. Same result: every
    // global lowest-3-outside-ca id is also in its own cluster's
    // lowest 3, and the anchor's own row sits in ca so the
    // neg_id ≠ anchor_id guard can never bite.
    val wClust = Window.partitionBy(col("cn")).orderBy(col("neg_id"))
    val negCand = a.select(col("vec_id").as("neg_id"), col("cluster").as("cn"))
      .withColumn("crn", row_number().over(wClust))
      .filter(col("crn") <= NNegatives)
      .withColumn("excl", explode(sequence(lit(0L), lit((K - 1).toLong))))
      .filter(col("excl") =!= col("cn"))
    val wNeg = Window.partitionBy(col("anchor_id")).orderBy(col("neg_id"))
    positives.join(negCand, col("excl") === col("ca"))
      .withColumn("neg_rank", row_number().over(wNeg))
      .filter(col("neg_rank") <= NNegatives)
      .select(col("anchor_id"), col("positive_id"), col("pos_cos"),
        col("neg_id"), col("neg_rank"))
  }

  private val SemTau = 0.45

  /** SemDeDup (Abbas et al. 2023): semantic near-duplicate removal
    * scoped WITHIN k-means clusters — assign every embedding to its
    * centroid, compare pairs only inside a cluster, and mark the
    * higher vec_id of any pair with cosine ≥ [[SemTau]] as a
    * duplicate (the keeper is the lowest id, the engine's standard
    * canonical rule). The cluster scoping is the entire scale story:
    * the pair join is an equi-join on the cluster id, so candidate
    * cost is Σ|cluster|² rather than the |corpus|² of
    * DedupOps.embeddingNeardup — with K proportional to corpus size,
    * cluster populations stay bounded and so does the per-key work.
    * Threshold uses the same unrounded in-plan cosine as the
    * brute-force baseline (bit-identical folds on both engines).
    */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    val a = assigned(s, dir)
    val l = a.select(col("cluster"), col("vec_id").as("vec_a"),
      col("embedding").as("va"))
      .withColumn("nrma", sqrt(vecDot(col("va"), col("va"))))
    val r = a.select(col("cluster"), col("vec_id").as("vec_b"),
      col("embedding").as("vb"))
      .withColumn("nrmb", sqrt(vecDot(col("vb"), col("vb"))))
    val dup = l.join(r, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("c", vecDot(col("va"), col("vb")) / (col("nrma") * col("nrmb")))
      .filter(col("c") >= SemTau)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    a.select(col("vec_id"), col("cluster"))
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
  }

  /** Cluster-stratified top-N selection — the curation move "keep the
    * N best documents of every cluster" that balances a corpus across
    * semantic regions. Quality here is the integer n_chars (with
    * doc_id as tiebreak) so ranking is exactly reproducible; any
    * scoring column drops in. documents and embeddings share the id
    * space (doc_id = vec_id) by fixture construction.
    */
  def diversitySample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    assigned(s, dir)
      .join(Tables.documents(s, dir), col("doc_id") === col("vec_id"))
      .select(col("cluster"), col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopPerCluster)
  }

  // ---- oracle SQL --------------------------------------------------

  /** Norms + assignment CTEs, shared verbatim across the oracles —
    * the same structure as SimOps' IVF oracle, which the gate already
    * proves bit-compatible with vec_dot's fold.
    */
  private val assignCte =
    s"""n AS (
       |  SELECT * FROM (
       |    SELECT vec_id, embedding AS v,
       |      sqrt(list_sum(list_transform(embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |    FROM embeddings) WHERE nrm > 0),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS vcent, nrm AS nrmcent
       |  FROM n WHERE vec_id < $K),
       |simc AS (
       |  SELECT n.vec_id, cents.cent_id,
       |    list_sum(list_transform(range(1, len(n.v) + 1),
       |      i -> CAST(n.v[i] AS DOUBLE) * CAST(cents.vcent[i] AS DOUBLE)))
       |      / (n.nrm * cents.nrmcent) AS cs
       |  FROM n, cents),
       |assign AS (
       |  SELECT vec_id, cent_id AS cluster, cs FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cs DESC, cent_id) AS arn FROM simc)
       |  WHERE arn = 1)""".stripMargin

  /** One unrolled Lloyd step in SQL: means of the previous assignment
    * (float-quantized exactly like [[meansOf]]), re-normed, and a
    * fresh argmax assignment. Names the produced CTEs m/c/simc/a<i>.
    */
  private def iterCte(i: Int, prev: String): String =
    s"""m$i AS (
       |  SELECT pa.cluster, i,
       |    CAST(round(avg(CAST(e.embedding[i] AS DOUBLE)), 6) AS FLOAT) AS m
       |  FROM $prev pa
       |  JOIN embeddings e ON e.vec_id = pa.vec_id,
       |    unnest(range(1, len(e.embedding) + 1)) AS u(i)
       |  GROUP BY 1, 2),
       |c$i AS (
       |  SELECT * FROM (
       |    SELECT cent_id, vcent,
       |      sqrt(list_sum(list_transform(vcent,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrmcent
       |    FROM (SELECT cluster AS cent_id, list(m ORDER BY i) AS vcent
       |      FROM m$i GROUP BY cluster))
       |  WHERE nrmcent > 0),
       |simc$i AS (
       |  SELECT n.vec_id, c$i.cent_id,
       |    list_sum(list_transform(range(1, len(n.v) + 1),
       |      j -> CAST(n.v[j] AS DOUBLE) * CAST(c$i.vcent[j] AS DOUBLE)))
       |      / (n.nrm * c$i.nrmcent) AS cs
       |  FROM n, c$i),
       |a$i AS (
       |  SELECT vec_id, cent_id AS cluster, cs FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cs DESC, cent_id) AS rn FROM simc$i)
       |  WHERE rn = 1)""".stripMargin

  val all: Seq[Q] = Seq(
    Q("contrastive_triplets",
      s"""WITH $assignCte,
         |anch AS (
         |  SELECT n.vec_id AS anchor_id, n.v AS va, n.nrm AS nrma,
         |    a.cluster AS ca
         |  FROM n JOIN assign a ON a.vec_id = n.vec_id
         |  WHERE n.vec_id < $NAnchors),
         |posc AS (
         |  SELECT anch.anchor_id, anch.ca, c.vec_id AS neighbor_id,
         |    list_sum(list_transform(range(1, len(anch.va) + 1),
         |      j -> CAST(anch.va[j] AS DOUBLE) * CAST(c.v[j] AS DOUBLE)))
         |      / (anch.nrma * c.nrm) AS cs2
         |  FROM anch JOIN n c ON c.vec_id <> anch.anchor_id),
         |pos AS (
         |  SELECT anchor_id, ca, neighbor_id AS positive_id,
         |    round(cs2, 6) AS pos_cos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY anchor_id
         |      ORDER BY cs2 DESC, neighbor_id) AS rn FROM posc)
         |  WHERE rn = 1)
         |SELECT anchor_id, positive_id, pos_cos, neg_id, neg_rank FROM (
         |  SELECT p.anchor_id, p.positive_id, p.pos_cos,
         |    o.vec_id AS neg_id,
         |    row_number() OVER (PARTITION BY p.anchor_id
         |      ORDER BY o.vec_id) AS neg_rank
         |  FROM pos p JOIN assign o
         |    ON o.cluster <> p.ca AND o.vec_id <> p.anchor_id)
         |WHERE neg_rank <= $NNegatives""".stripMargin)(contrastiveTriplets),
    Q("kmeans_iterate",
      s"""WITH $assignCte,
         |${iterCte(1, "assign")},
         |${iterCte(2, "a1")}
         |SELECT vec_id, cluster, round(cs, 6) AS sim FROM a2""".stripMargin)(
      kmeansIterate),
    Q("kmeans_assign",
      s"""WITH $assignCte
         |SELECT vec_id, cluster, round(cs, 6) AS sim FROM assign""".stripMargin)(
      kmeansAssign),
    Q("kmeans_update",
      s"""WITH $assignCte
         |SELECT a.cluster, i - 1 AS dim, COUNT(*) AS n,
         |  round(avg(CAST(e.embedding[i] AS DOUBLE)), 6) AS centroid_val
         |FROM assign a
         |JOIN embeddings e ON e.vec_id = a.vec_id,
         |  unnest(range(1, len(e.embedding) + 1)) AS u(i)
         |GROUP BY 1, 2""".stripMargin)(kmeansUpdate),
    Q("diversity_sample",
      s"""WITH $assignCte
         |SELECT cluster, doc_id, lang, n_chars, rn FROM (
         |  SELECT a.cluster, d.doc_id, d.lang, d.n_chars,
         |    row_number() OVER (PARTITION BY a.cluster
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |  FROM assign a JOIN documents d ON d.doc_id = a.vec_id)
         |WHERE rn <= $TopPerCluster""".stripMargin)(diversitySample),
    Q("semdedup",
      s"""WITH $assignCte,
         |dup AS (
         |  SELECT DISTINCT y.vec_id FROM assign x
         |  JOIN assign y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |  JOIN n na ON na.vec_id = x.vec_id
         |  JOIN n nb ON nb.vec_id = y.vec_id
         |  WHERE list_sum(list_transform(range(1, len(na.v) + 1),
         |      i -> CAST(na.v[i] AS DOUBLE) * CAST(nb.v[i] AS DOUBLE)))
         |    / (na.nrm * nb.nrm) >= $SemTau)
         |SELECT a.vec_id, a.cluster,
         |  (d.vec_id IS NOT NULL) AS is_dup
         |FROM assign a LEFT JOIN dup d ON a.vec_id = d.vec_id""".stripMargin)(
      semDedup),
  )
}
