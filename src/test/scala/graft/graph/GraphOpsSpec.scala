package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** PageRank against an exact local recompute using the identical
  * per-round 6-decimal quantization.
  */
class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pagerank matches a local recompute and conserves damped mass") {
    val bigrams = Tables.documents(spark, sfSmall).collect()
      .flatMap(r => graft.mr.MrJobs.tokenize(r.getString(1)).sliding(2)
        .filter(_.length == 2).map(w => (w.head, w(1))))
    val cnt = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val outSum = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = (bigrams.map(_._1) ++ bigrams.map(_._2)).distinct
    val n = nodes.length.toDouble
    var pr = nodes.map(_ -> round6(1.0 / n)).toMap
    for (_ <- 1 to GraphOps.Iters) {
      val mass = cnt.toSeq
        .map { case ((u, v), c) => v -> pr(u) * (c.toDouble / outSum(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = nodes.map(w => w -> round6(
        (1 - GraphOps.Damping) / n +
          GraphOps.Damping * mass.getOrElse(w, 0.0))).toMap
    }
    val got = GraphOps.pageRank(spark, sfSmall).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == pr.keySet)
    got.foreach { case (w, p) =>
      // summation order may differ pre-quantization; one last-place
      // wobble of the 6th decimal is the only allowed divergence
      assert(math.abs(p - pr(w)) <= 1e-6 + 1e-9, s"$w: $p vs ${pr(w)}")
    }
    // total rank stays within (1-d, 1]: damping floor plus lost
    // dangling mass below, full conservation above
    val total = got.values.sum
    assert(total <= 1.0 + 1e-4 && total > 1 - GraphOps.Damping)
    // ranks differentiate (a uniform fixpoint would signal a bug)
    assert(got.values.toSeq.distinct.length > 1)
  }

  test("triangle stats match a brute-force local enumeration") {
    val edges = Tables.documents(spark, sfSmall).collect()
      .flatMap(r => graft.mr.MrJobs.tokenize(r.getString(1)).sliding(2)
        .filter(_.length == 2).map(w => (w.head, w(1))))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map[String, Long]()
    for {
      (a, b) <- edges
      c <- adj(a).intersect(adj(b)) if b < c
    } Seq(a, b, c).foreach(n => triPerNode(n) = triPerNode.getOrElse(n, 0L) + 1)
    val got = GraphOps.triangleStats(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == adj.keySet)
    got.foreach { case (node, deg, tri, cc) =>
      assert(deg == adj(node).size.toLong, s"$node degree")
      assert(tri == triPerNode.getOrElse(node, 0L), s"$node triangles")
      val want = if (deg >= 2) round6(2.0 * tri / (deg * (deg - 1))) else 0.0
      assert(math.abs(cc - want) <= 1e-9, s"$node clustering $cc vs $want")
    }
  }

  test("BFS distances equal a local breadth-first search from the same seed") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfTiny)
      .select(col("text")).collect().map(_.getString(0))
    val tokenized = docs.map(graft.mr.MrJobs.tokenize)
    val edges = tokenized.flatMap(_.sliding(2).collect {
      case Seq(a, b) if a != b => Set(a, b)
    }).distinct
    val adj = scala.collection.mutable.Map[String, Set[String]]()
      .withDefaultValue(Set.empty)
    edges.foreach { e =>
      val Seq(a, b) = e.toSeq.sorted
      adj(a) += b; adj(b) += a
    }
    val counts = tokenized.flatten.groupBy(identity).view.mapValues(_.length)
    val seed = counts.toSeq.minBy { case (w, c) => (-c, w) }._1
    var dist = Map(seed -> 0L)
    for (d <- 1 to GraphOps.BfsHops) {
      val frontier = dist.collect { case (n, dd) if dd == d - 1 => n }
      frontier.flatMap(adj).foreach { n =>
        if (!dist.contains(n)) dist += n -> d.toLong
      }
    }
    val got = GraphOps.graphBfs(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == dist)
    assert(got(seed) == 0L)
    // propagation must go beyond the direct neighborhood, or the
    // iterated min-plus rounds are vacuous
    assert(got.values.max >= 2L, "BFS never left the seed's neighborhood")
  }

  test("label propagation equals a local synchronous 2-round replay") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfTiny)
      .select(col("text")).collect().map(_.getString(0))
    val adj = scala.collection.mutable.Map[String, Set[String]]()
      .withDefaultValue(Set.empty)
    docs.map(graft.mr.MrJobs.tokenize).foreach(_.sliding(2).foreach {
      case Seq(a, b) if a != b => adj(a) += b; adj(b) += a
      case _ =>
    })
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to GraphOps.LpaRounds) {
      labels = adj.keys.map { n =>
        val freq = adj(n).toSeq.map(labels).groupBy(identity)
          .map { case (l, g) => (l, g.size) }
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val got = GraphOps.graphCommunities(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == labels)
    // a real community must form: some label shared by ≥ 3 nodes
    val sizes = got.values.groupBy(identity).map(_._2.size)
    assert(sizes.max >= 3, "no multi-node community after 2 rounds")
  }
}
