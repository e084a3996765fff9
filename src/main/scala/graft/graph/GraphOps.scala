package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.text.TextAnalysis

/** Link-analysis operators over graphs derived from the fixture
  * corpus. The reference has no graph surface at all (its only
  * iterative structure is the MapReduce job loop, reference
  * master.py:284-326); these exist because corpus curation uses link
  * analysis for source weighting, and they exercise the iterative
  * dataflow shape (like ml.ClusterOps.kmeansIterate and
  * dedup.DedupOps.dedupClusters) on a third algorithm family.
  *
  * Scale shape: one shuffle builds the weighted edge list; each
  * PageRank round is one equi-join of the rank vector with the edges
  * plus one hash aggregate — the textbook distributed PageRank plan.
  * Nothing is collected but the node count (model-sized scalar, the
  * same trade as ClusterOps.meansOf).
  */
object GraphOps {

  val Damping = 0.85
  val Iters = 3
  private val tokensSql = "regexp_extract_all(lower(text), '[a-z]+')"

  /** Weighted word-adjacency edges: wt(u→v) = c(u,v) / c(u,·).
    * Long/long division — both engines produce the identical double.
    */
  private def edges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramCounts(s, dir)
      .withColumn("wt", col("c_xy") /
        sum(col("c_xy")).over(Window.partitionBy(col("w1"))))
      .select(col("w1"), col("w2"), col("wt"))

  /** [[Iters]] rounds of damped PageRank over the bigram graph,
    * initialized uniform. Ranks are quantized to 6 decimals each
    * round — the same cross-engine float policy as kmeansIterate's
    * centroid means, so the DuckDB-unrolled oracle stays bit-stable
    * against summation-order ulps. Dangling mass is dropped (the
    * standard simplified variant), identically on both sides.
    */
  /** Keyed result memo — one materialized (vocab-sized) frame per
    * (operator, session, dataset). Shared by [[pageRank]],
    * [[graphBfs]], and [[graphCommunities]] — every iterative
    * operator here must end its loop with a `cache()`d result
    * (lineage truncation). Locking discipline lives in
    * [[graft.KeyedMemo]] (one copy JVM-wide, not per-module).
    */
  private val memo = new graft.KeyedMemo

  /** Test hook: drop the memo so a spec can race the cold-miss path. */
  private[graft] def clearResultCache(): Unit = memo.clear()

  def pageRank(s: SparkSession, dir: String): DataFrame =
    memo("pagerank", s, dir)(pageRankUncached(s, dir))

  private def pageRankUncached(s: SparkSession, dir: String): DataFrame = {
    val ew = edges(s, dir).cache()
    val nodes = ew.select(col("w1").as("node"))
      .union(ew.select(col("w2").as("node"))).distinct().cache()
    val n = nodes.count().toDouble // model-sized scalar, not data
    if (n == 0) { // ANSI divide would fault on 1/0 at constant folding
      ew.unpersist(); nodes.unpersist()
      return nodes.select(col("node"), lit(0d).as("pr"))
    }
    var pr = nodes.withColumn("pr", round(lit(1.0) / n, 6))
    for (_ <- 1 to Iters) {
      val mass = ew.join(pr, col("w1") === col("node"))
        .select(col("w2").as("node"), (col("pr") * col("wt")).as("m"))
        .groupBy("node").agg(sum("m").as("mass"))
      pr = nodes.join(mass, Seq("node"), "left")
        .select(col("node"),
          round(lit(1 - Damping) / n +
            lit(Damping) * coalesce(col("mass"), lit(0.0)), 6).as("pr"))
    }
    // materialize the (vocab-sized) result, then release the loop
    // inputs — the same cache discipline as dedupClusters: nothing
    // bigger than the model survives the call
    val out = pr.cache()
    out.count()
    ew.unpersist()
    nodes.unpersist()
    out
  }

  /** Per-node triangle count and local clustering coefficient over
    * the undirected bigram co-occurrence graph — the community
    * structure statistic source-graph analyses use to separate
    * template/boilerplate clusters (dense, high clustering) from
    * organic text (sparse). Edges are canonicalized a < b once; the
    * triangle enumeration is the textbook two-join plan on ordered
    * edges (a<b<c), so each triangle is produced exactly once and
    * the join fan-out is bounded by the degree distribution, never
    * all-pairs. At 100 TB-scale graphs the same plan reads with the
    * edge list hash-partitioned on the join key each hop.
    */
  /** Canonicalized (a < b, distinct, self-loop-free) undirected edge
    * set of the bigram graph — ONE builder for every graph operator,
    * so tokenization/canonicalization can never drift between them.
    */
  private def canonicalEdges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramCounts(s, dir)
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .distinct()

  /** [[canonicalEdges]] symmetrized to (src, dst) — the traversal
    * form [[graphBfs]] and [[graphCommunities]] join against.
    */
  private def undirectedEdges(s: SparkSession, dir: String): DataFrame = {
    val e = canonicalEdges(s, dir)
    e.union(e.select(col("b"), col("a"))).toDF("src", "dst")
  }

  /** The bg/e/ed CTE prelude shared by every graph oracle. */
  private val edgesCteSql =
    s"""bg AS (
       |  SELECT t[i] AS w1, t[i+1] AS w2
       |  FROM (SELECT $tokensSql AS t FROM documents),
       |    unnest(range(1, greatest(len(t), 1))) AS u(i)),
       |e AS (
       |  SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
       |  FROM bg WHERE w1 <> w2),
       |ed AS (SELECT a AS src, b AS dst FROM e
       |       UNION ALL SELECT b, a FROM e)""".stripMargin

  def triangleStats(s: SparkSession, dir: String): DataFrame = {
    val e = canonicalEdges(s, dir)
    val tri = e.toDF("a", "b")
      .join(e.toDF("b", "c"), Seq("b"))
      .join(e.toDF("a", "c"), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
    val triPerNode = tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          round(lit(2) * col("n_tri") /
            (col("degree") * (col("degree") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)))
  }

  /** Hop distance from the corpus' most frequent word — [[BfsHops]]
    * rounds of distributed BFS (min-plus label propagation) over the
    * undirected bigram graph: the bounded-radius traversal behind
    * "context neighborhood" expansion in retrieval and taxonomy
    * induction. The seed is chosen deterministically (max count, ties
    * to the lexicographic min — a TakeOrdered-1 scalar, model-sized);
    * each round is one equi-join of the frontier with the edge list
    * plus one min-aggregate — the same per-round plan as [[pageRank]],
    * and the hop cap bounds the work exactly like an iteration cap.
    * Output: every node within [[BfsHops]] hops with its exact
    * distance (unreached nodes are absent, not ∞ — at corpus scale
    * the reached set is the small side).
    */
  val BfsHops = 3

  def graphBfs(s: SparkSession, dir: String): DataFrame =
    memo("bfs", s, dir) {
      val edges = undirectedEdges(s, dir).cache()
      val seed = graft.text.TextOps.wordCount(s, dir)
        .orderBy(col("cnt").desc, col("word")).limit(1)
        .select(col("word").as("node"), lit(0L).as("dist"))
      var dist = seed
      for (_ <- 1 to BfsHops) {
        val next = edges.join(dist, col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
        dist = dist.union(next).groupBy(col("node"))
          .agg(min(col("dist")).as("dist"))
      }
      val out = dist.cache()
      out.count() // materialize before releasing the edge cache
      edges.unpersist()
      out
    }

  /** One unrolled BFS round in the oracle dialect. */
  private def bfsIter(i: Int, prev: String): String =
    s"""d$i AS (
       |  SELECT node, MIN(dist) AS dist FROM (
       |    SELECT node, dist FROM $prev
       |    UNION ALL
       |    SELECT ed.dst AS node, $prev.dist + 1 AS dist
       |    FROM ed JOIN $prev ON ed.src = $prev.node)
       |  GROUP BY 1)""".stripMargin

  private val bfsOracle =
    s"""WITH $edgesCteSql,
       |wc AS (SELECT w AS word, COUNT(*) AS cnt FROM (
       |  SELECT unnest($tokensSql) AS w FROM documents) GROUP BY 1),
       |d0 AS (
       |  SELECT word AS node, CAST(0 AS BIGINT) AS dist FROM wc
       |  ORDER BY cnt DESC, word LIMIT 1),
       |${(1 to BfsHops).map(i => bfsIter(i, s"d${i - 1}")).mkString(",\n")}
       |SELECT node, dist FROM d$BfsHops""".stripMargin

  /** Community detection by [[LpaRounds]] rounds of SYNCHRONOUS label
    * propagation over the undirected bigram graph: each round every
    * node adopts its neighbors' most frequent label (ties to the
    * lexicographic minimum — the determinism rule that makes the
    * unrolled oracle replay exact; asynchronous LPA is
    * order-dependent and untestable). Round 1 degenerates to
    * min-neighbor (all labels distinct); by round 2 dense
    * neighborhoods have converged on shared hubs — the
    * boilerplate-vs-organic clustering signal at corpus scale.
    * Each round is one equi-join of the label vector with the edge
    * list, one (node, label) count aggregate, and one per-node
    * ranked pick (partitioned window, degree-bounded frames) — the
    * [[pageRank]] round shape with an argmax instead of a sum.
    */
  val LpaRounds = 2

  def graphCommunities(s: SparkSession, dir: String): DataFrame = {
    memo("lpa", s, dir) {
      val edges = undirectedEdges(s, dir).cache()
      var lab = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (_ <- 1 to LpaRounds) {
        val counts = edges
          .join(lab.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
          .groupBy(col("src"), col("label"))
          .agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("src")).orderBy(col("c").desc, col("label"))
        lab = counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("src").as("node"), col("label"))
      }
      val out = lab.cache()
      out.count() // materialize before releasing the edge cache
      edges.unpersist()
      out
    }
  }

  /** One unrolled synchronous-LPA round in the oracle dialect. */
  private def lpaIter(i: Int, prev: String): String =
    s"""c$i AS (
       |  SELECT ed.src, $prev.label, COUNT(*) AS c
       |  FROM ed JOIN $prev ON ed.dst = $prev.node
       |  GROUP BY 1, 2),
       |l$i AS (
       |  SELECT src AS node, label FROM (
       |    SELECT src, label,
       |      row_number() OVER (PARTITION BY src ORDER BY c DESC, label)
       |        AS rn
       |    FROM c$i)
       |  WHERE rn = 1)""".stripMargin

  private val lpaOracle =
    s"""WITH $edgesCteSql,
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed),
       |${(1 to LpaRounds).map(i => lpaIter(i, s"l${i - 1}")).mkString(",\n")}
       |SELECT node, label FROM l$LpaRounds""".stripMargin

  private val triangleOracle =
    s"""WITH $edgesCteSql,
       |tri AS (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM e e1
       |  JOIN e e2 ON e1.b = e2.a
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |tpn AS (
       |  SELECT node, COUNT(*) AS n_tri FROM (
       |    SELECT a AS node FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri)
       |  GROUP BY 1),
       |deg AS (
       |  SELECT node, COUNT(*) AS degree FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
       |  GROUP BY 1)
       |SELECT deg.node, degree, coalesce(n_tri, 0) AS n_tri,
       |  CASE WHEN degree >= 2
       |    THEN round(2 * coalesce(n_tri, 0)
       |      / CAST(degree * (degree - 1) AS DOUBLE), 6)
       |    ELSE 0.0 END AS clustering
       |FROM deg LEFT JOIN tpn ON deg.node = tpn.node""".stripMargin

  /** One unrolled PageRank round in the oracle dialect. */
  private def prIter(i: Int, prev: String): String =
    s"""p$i AS (
       |  SELECT nodes.node,
       |    round(CAST(${1 - Damping} AS DOUBLE) / nn.n
       |      + $Damping * COALESCE(m.mass, CAST(0 AS DOUBLE)), 6) AS pr
       |  FROM nodes
       |  LEFT JOIN (
       |    SELECT ew.w2 AS node, SUM($prev.pr * ew.wt) AS mass
       |    FROM ew JOIN $prev ON ew.w1 = $prev.node GROUP BY 1) m
       |    ON nodes.node = m.node, nn)""".stripMargin

  val all: Seq[Q] = Seq(
    Q("pagerank_words",
      s"""WITH e AS (
         |  SELECT t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT $tokensSql AS t FROM documents),
         |    unnest(range(1, greatest(len(t), 1))) AS u(i)),
         |ec AS (SELECT w1, w2, COUNT(*) AS c FROM e GROUP BY 1, 2),
         |ew AS (SELECT w1, w2,
         |  c / CAST(SUM(c) OVER (PARTITION BY w1) AS DOUBLE) AS wt FROM ec),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT w1 AS node FROM ec UNION ALL SELECT w2 FROM ec)),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |p0 AS (SELECT node,
         |  round(CAST(1 AS DOUBLE) / nn.n, 6) AS pr FROM nodes, nn),
         |${prIter(1, "p0")},
         |${prIter(2, "p1")},
         |${prIter(3, "p2")}
         |SELECT node, pr FROM p3""".stripMargin)(pageRank),
    Q("graph_triangles", triangleOracle)(triangleStats),
    Q("graph_bfs", bfsOracle)(graphBfs),
    Q("graph_communities", lpaOracle)(graphCommunities),
  )
}
