package graft

import org.apache.spark.sql.SparkSession

/** Evidence tool (Bench/IvmTiming's sibling): candidate-pair counts
  * for the prefix-filter dedup ladder, per fixture — the number that
  * separates "candidate generation dominates" from "verification
  * dominates" when a scale path's cross-decade slope drifts toward
  * linear. For each fixture dir it counts, for both the symmetric
  * (Jaccard ≥ 0.8) and the asymmetric (containment ≥ 0.9) families:
  * the plain prefix-filter candidates, the PPJoin-filtered
  * candidates (length + positional bounds), and the verified result
  * pairs. The ratio candidates/results is the wasted-verification
  * factor; the plain/ppjoin candidate ratio is what the extra
  * filters buy at that scale. One JSON line per (fixture, family);
  * recorded in BASELINE.md next to the slope tables.
  */
object CandidateEconomy {
  def main(args: Array[String]): Unit = {
    val dirs: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = MainSession.build(defaultCpus = "32")
    import graft.dedup.DedupOps

    for (dir <- dirs) {
      val jPlain = DedupOps.prefixFilterCandidates(spark, dir).count()
      val jPp = DedupOps.ppjoinCandidates(spark, dir).count()
      val jRes = DedupOps.prefixFilterJaccard(spark, dir).count()
      println(s"""{"metric":"candidate_economy","family":"jaccard",""" +
        s""""sf":"$dir","prefix_candidates":$jPlain,""" +
        s""""ppjoin_candidates":$jPp,"result_pairs":$jRes}""")
      val cPlain = DedupOps.containmentPrefixCandidates(spark, dir).count()
      val cPp = DedupOps.containmentPpjoinCandidates(spark, dir).count()
      val cRes = DedupOps.containmentPrefixFilter(spark, dir).count()
      println(s"""{"metric":"candidate_economy","family":"containment",""" +
        s""""sf":"$dir","prefix_candidates":$cPlain,""" +
        s""""ppjoin_candidates":$cPp,"result_pairs":$cRes}""")
    }
    spark.stop()
  }
}
