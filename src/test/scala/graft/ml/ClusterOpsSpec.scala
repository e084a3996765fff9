package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class ClusterOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("assignFrame with no centroids returns an empty typed frame, not null clusters") {
    val vecs = ClusterOps.withNorm(Tables.embeddings(spark, sfTiny))
    val out = ClusterOps.assignFrame(vecs, Nil)
    assert(out.columns.toSeq == Seq("vec_id", "embedding", "cluster", "cs"))
    assert(out.count() == 0)
  }

  test("kmeans_assign covers every nonzero vector exactly once") {
    val assign = ClusterOps.kmeansAssign(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nonzero = Tables.embeddings(spark, sfSmall)
      .filter(exists(col("embedding"), _ =!= 0f)).count()
    assert(assign.length == nonzero)
    assert(assign.map(_._1).distinct.length == assign.length)
    assert(assign.forall { case (_, c, _) => c >= 0 && c < 16 })
    assert(assign.forall { case (_, _, s) => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9 })
  }

  test("centroid seed vectors assign to themselves with similarity 1") {
    val self = ClusterOps.kmeansAssign(spark, sfSmall)
      .filter(col("vec_id") < 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(self.nonEmpty)
    self.foreach { case (id, cluster, sim) =>
      assert(cluster == id, s"seed $id landed in cluster $cluster")
      assert(math.abs(sim - 1.0) < 1e-6)
    }
  }

  test("kmeans_update yields one mean per (cluster, dim) and conserves counts") {
    val up = ClusterOps.kmeansUpdate(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dims = up.map(_._2).distinct
    assert(dims.length == 64 && dims.min == 0 && dims.max == 63)
    // every present cluster reports all 64 dims with a consistent size
    up.groupBy(_._1).foreach { case (c, g) =>
      assert(g.length == 64, s"cluster $c has ${g.length} dims")
      assert(g.map(_._3).distinct.length == 1, s"cluster $c sizes disagree")
    }
    // per-dim totals equal the assigned-vector count
    val assigned = ClusterOps.kmeansAssign(spark, sfSmall).count()
    up.groupBy(_._2).foreach { case (d, g) =>
      assert(g.map(_._3).sum == assigned, s"dim $d count total off")
    }
  }

  test("kmeans_iterate improves the clustering objective over the seed assignment") {
    def meanSim(rows: Array[(Long, Long, Double)]): Double =
      rows.map(_._3).sum / rows.length
    val seed = ClusterOps.kmeansAssign(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val iterated = ClusterOps.kmeansIterate(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // same coverage: every nonzero vector still assigned exactly once
    assert(iterated.map(_._1).sorted.toSeq == seed.map(_._1).sorted.toSeq)
    // Lloyd steps cannot worsen the spherical objective (mean cosine
    // to centroid); 1e-3 slack for the float quantization of means
    assert(meanSim(iterated) >= meanSim(seed) - 1e-3,
      s"objective got worse: ${meanSim(seed)} -> ${meanSim(iterated)}")
    // and the re-centering genuinely changed the model: either some
    // vector switched clusters or the objective strictly improved
    val seedMap = seed.map(r => r._1 -> r._2).toMap
    val moved = iterated.count { case (id, c, _) => seedMap(id) != c }
    assert(moved > 0 || meanSim(iterated) > meanSim(seed) + 1e-9,
      "iterate returned the seed assignment unchanged")
  }

  test("assignFrame scores a stream identically to batch (map-only transform)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.functions.VectorFunctions.register(spark)
    val vecs = Tables.embeddings(spark, sfSmall)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val cents = vecs.filter(_._1 < 16).sortBy(_._1)
      .map { case (i, v) => (i, v) }.toSeq
    val batch = ClusterOps.assignFrame(
        ClusterOps.withNorm(vecs.toSeq.toDF("vec_id", "embedding")), cents)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = ClusterOps.assignFrame(
        ClusterOps.withNorm(stream.toDF().toDF("vec_id", "embedding")), cents)
      .select("vec_id", "cluster")
      .writeStream.format("memory").queryName("kmeans_stream")
      .outputMode("append").start()
    try {
      stream.addData(vecs.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("kmeans_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, "streaming assignment diverged from batch")
    } finally q.stop()
  }

  test("contrastive triplets: one positive, cluster-distinct negatives per anchor") {
    val rows = ClusterOps.contrastiveTriplets(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    val clusters = ClusterOps.kmeansAssign(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byAnchor = rows.groupBy(_._1)
    assert(byAnchor.size == 10)
    byAnchor.foreach { case (a, g) =>
      assert(g.map(_._2).distinct.length == 1, s"anchor $a has several positives")
      assert(g.map(_._5).sorted.toSeq == Seq(1, 2, 3), s"anchor $a negative ranks off")
      g.foreach { case (_, pos, cos, neg, _) =>
        assert(pos != a && neg != a)
        assert(cos <= 1.0 + 1e-9)
        assert(clusters(neg) != clusters(a),
          s"negative $neg shares anchor $a's cluster")
      }
    }
  }

  test("semdedup flags exactly the higher id of within-cluster pairs over tau") {
    import spark.implicits._
    val got = ClusterOps.semDedup(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val clusters = got.map(x => x._1 -> x._2).toMap
    val vecs = graft.Tables.embeddings(spark, sfSmall)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val byCluster = clusters.keys.groupBy(clusters)
    got.foreach { case (id, c, isDup) =>
      val hasLowerPartner = byCluster(c).exists(o =>
        o < id && cos(vecs(o), vecs(id)) >= 0.45)
      assert(isDup == hasLowerPartner, s"vec $id in cluster $c flagged $isDup")
    }
    assert(got.exists(_._3), "fixture's planted near-dups should be flagged")
  }

  test("diversity_sample keeps at most N docs per cluster, ranked by length") {
    val rows = ClusterOps.diversitySample(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (c, g) =>
      assert(g.length <= 10, s"cluster $c kept ${g.length} docs")
      val byRank = g.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1 to g.length))
      val lens = byRank.map(_._4)
      assert(lens.zip(lens.tail).forall { case (a, b) => a >= b },
        s"cluster $c not ranked by n_chars desc")
    }
  }
}
