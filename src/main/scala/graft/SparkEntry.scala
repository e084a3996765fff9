package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every module's registered queries; each `Q` with an
  * oracle participates in the driver's DuckDB differential check.
  */
object SparkEntry {

  /** Full registry. Later modules may not shadow earlier names —
    * duplicates would silently drop a query from the Map, so fail
    * fast instead.
    */
  lazy val registry: Seq[Q] = {
    val qs = graft.text.TextOps.all ++ graft.ops.Relational.all ++
      graft.ops.Joins.all ++ graft.ops.Aggregates.all ++
      graft.ops.WindowOps.all ++ graft.ops.ScalarOps.all ++
      graft.ops.SetOps.all ++ graft.ops.AsOf.all ++
      graft.dedup.DedupOps.all ++ graft.sim.SimOps.all ++
      graft.mr.MrJobs.all ++ graft.text.TextAnalysis.all ++
      graft.stream.StreamOps.all ++ graft.mm.MultimodalOps.all ++
      graft.functions.TypedAggregators.all ++ graft.sources.FileSources.all ++
      graft.sources.Bucketed.all ++
      graft.ml.ClusterOps.all ++ graft.graph.GraphOps.all ++
      graft.text.CurationRules.all ++ graft.sim.RetrievalOps.all ++
      graft.text.Bpe.all ++ graft.ops.Maintenance.all ++
      graft.sources.TxLog.all
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.text.TextOps.wordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
