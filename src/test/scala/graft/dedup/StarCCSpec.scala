package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Star-contraction connected components (large-star/small-star):
  * equality with the min-label fixpoint, a union-find differential on
  * random graphs, and the logarithmic-round property on a path graph
  * — the diameter-killer that motivates the algorithm at 100 TB.
  */
class StarCCSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("star contraction equals min-label components on the fixture pairs") {
    val pairs = DedupOps.verifiedPairs(spark, sfSmall)
      .select(col("doc_a"), col("doc_b"))
    val minLabel = labelsOf(DedupOps.connectedComponents(pairs))
    val star = labelsOf(DedupOps.connectedComponentsStar(pairs))
    assert(star == minLabel)
    assert(star.nonEmpty)
  }

  test("star contraction equals union-find on random graphs (3 seeds)") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 400).map(_ =>
        (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
        .filter(e => e._1 != e._2)
      val expect = unionFind(edges)
      val got = labelsOf(DedupOps.connectedComponentsStar(
        edges.toDF("a", "b")))
      assert(got == expect, s"seed=$seed")
    }
  }

  test("incremental cluster maintenance equals the one-shot clustering") {
    for (dir <- Seq(sfTiny, sfSmall)) {
      val full = labelsOf(DedupOps.dedupClusters(spark, dir))
      val incr = labelsOf(DedupOps.dedupClustersIncremental(spark, dir))
      assert(incr == full, s"incremental diverged from full recompute at $dir")
      // r10: the DURABLE star-table variant must produce the same labels
      val durable = labelsOf(DedupOps.dedupClustersIncrementalDurable(spark, dir))
      assert(durable == full,
        s"durable star-table maintenance diverged from full recompute at $dir")
      // the split must actually exercise the merge: some pair crosses
      // the old/new boundary, else the test proves nothing
      val pairs = DedupOps.verifiedPairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.exists { case (a, b) =>
        (a % 10 == DedupOps.IncBatchMod) != (b % 10 == DedupOps.IncBatchMod) },
        s"no old-new crossing pair at $dir — split degenerate")
    }
  }

  test("path graph: star contraction needs O(log n) rounds where min-label needs O(n)") {
    // a 256-node path has diameter 255: min-label propagation would
    // need ~255 rounds; star contraction must collapse it in under 12
    val path = (0L until 255L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = DedupOps.starContraction(path)
    val got = labelsOf(labels)
    assert(got == (0L to 255L).map(_ -> 0L).toMap,
      "path did not collapse to a single component rooted at 0")
    assert(rounds <= 12,
      s"expected logarithmic convergence, took $rounds rounds")
    labels.unpersist()
  }

  test("checkpointed contraction produces identical labels on a deep path") {
    // the production lineage-truncation path: every 2nd round runs a
    // reliable checkpoint() instead of cache(), cutting RDD lineage
    // (the per-round LogicalRDD rebuild bounds only the SQL tree) —
    // the shape a fault-tolerant 100 TB run needs so a lost executor
    // replays at most checkpointInterval rounds, not the whole loop
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val path = (0L until 255L).map(i => (i, i + 1)).toDF("a", "b")
    val plain = labelsOf(DedupOps.connectedComponentsStar(path))
    val ckpt = labelsOf(DedupOps.connectedComponentsStar(path, checkpointInterval = 2))
    assert(ckpt == plain, "checkpointing changed the component labels")
    assert(ckpt == (0L to 255L).map(_ -> 0L).toMap)
  }
}
