package graft

import org.apache.spark.sql.SparkSession

/** Pre-configured session builder for library users: graft's native
  * functions injected, fixture-compatible timestamp handling, UTC.
  * `SparkEntry` queries also self-register what they need, so a plain
  * session works too — this is the convenient front door.
  */
object GraftSession {
  /** The optimizer rule that folds literal partition keys out of
    * Window specs. Excluded in every graft-controlled session: the
    * only literal window-partition keys in this library are the
    * graft.Bounded.global audit markers, whose entire purpose is to
    * SURVIVE into the physical plan (they suppress WindowExec's
    * single-partition warning for provably bounded frames, so a new
    * unbounded window is visible at a glance). Execution is
    * identical either way — one partition holds all rows — so
    * excluding the rule costs nothing. PlanShapeSpec pins the marker
    * surviving optimization; a session built without this conf just
    * sees the (harmless) warnings again.
    */
  val ExcludedRules =
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", ExcludedRules)
      // events-style TIMESTAMP(NANOS) parquet columns read as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
