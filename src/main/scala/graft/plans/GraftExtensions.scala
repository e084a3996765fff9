package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{StringFunctions, VectorFunctions}

/** SparkSessionExtensions entry point — the way a library user wires
  * graft's native functions into their own session:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorFunctions.dotInfo)
    ext.injectFunction(StringFunctions.jaroWinklerInfo)
    // BETWEEN-style range joins against literal band tables become
    // bucketed hash joins (see RangeBucketJoinRule)
    ext.injectOptimizerRule(_ => RangeBucketJoinRule)
    // native as-of join (AsOfJoinNode → AsOfJoinExec sorted merge)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
