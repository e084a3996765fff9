package graft

/** Evidence tool for the r11 fuzzy/ER re-block: candidate-pair counts
  * of the retired first-token geometry vs the rarest-token blocks,
  * per fixture dir — run over tools/scale_names.py catalogs (the
  * stock fixtures hold the SAME ~64 distinct part names at every
  * scale factor, so blocking slopes are only measurable on a catalog
  * whose dictionary actually grows). The cross-decade slope
  * e = log(pairs₁₀ₓ/pairs₁ₓ)/log(10) is the graded number:
  * first-token blocks key on a fixed leading vocabulary and go
  * quadratic (e → 2); rarest-token blocks key on the Heaps tail and
  * stay near-linear. One JSON line per dir; recorded in BASELINE.md.
  */
object FuzzyEconomy {
  def main(args: Array[String]): Unit = {
    val dirs: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = MainSession.build(defaultCpus = "32")
    for (dir <- dirs) {
      val t0 = System.nanoTime()
      val first = graft.ops.Joins.fuzzyCandidatesFirstToken(spark, dir).count()
      val t1 = System.nanoTime()
      val rarest = graft.ops.Joins.fuzzyCandidatesRarest(spark, dir).count()
      val t2 = System.nanoTime()
      val res = graft.ops.Joins.joinFuzzyJaro(spark, dir).count()
      println(s"""{"metric":"fuzzy_economy","sf":"$dir",""" +
        s""""first_token_pairs":$first,"rarest_token_pairs":$rarest,""" +
        s""""result_pairs":$res,""" +
        s""""first_sec":${(t1 - t0) / 1e9},"rarest_sec":${(t2 - t1) / 1e9}}""")
    }
    spark.stop()
  }
}
