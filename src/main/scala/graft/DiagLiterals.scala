package graft
import org.apache.spark.sql.SparkSession
/** Scratch diagnostic (not part of the driver contract): runs a name-filtered
  * subset of the registry, printing each name to stderr before execution so
  * large-task-binary WARNs correlate positionally in the merged sbt log.
  */
object DiagLiterals {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules", GraftSession.ExcludedRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qseq = if (sys.env.contains("SPARK_GRAFT_DIAG_VERIFY"))
      SparkEntry.queries.toSeq.map { case (n, f) => Q(n, f, None) }
    else SparkEntry.registry
    (1 to (if (sys.env.contains("SPARK_GRAFT_DIAG_VERIFY")) 1 else 2)).foreach { pass =>
    qseq.filter(q => only.isEmpty || only(q.name)).foreach { q =>
      System.err.println(s"### PASS $pass")
      System.err.println(s"### QUERY ${q.name}")
      try {
        if (sys.env.contains("SPARK_GRAFT_DIAG_VERIFY"))
          q.fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"/tmp/diag_out/${q.name}")
        else q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      catch { case e: Throwable => System.err.println(s"### FAIL ${q.name}: ${e.getClass.getSimpleName}") }
    }
    }
    spark.stop()
  }
}
