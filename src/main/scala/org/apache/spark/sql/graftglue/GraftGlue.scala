package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: turning a custom
  * logical plan into a DataFrame. `Dataset.ofRows` is package-private
  * to `org.apache.spark.sql`, so this shim lives in a subpackage —
  * the standard pattern third-party Spark libraries use to mount
  * custom operators (no internals are modified; this calls one
  * factory method). Everything else about graft's custom-plan path
  * (the logical node, the strategy, the physical exec) uses public
  * developer APIs.
  */
object GraftGlue {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The one numeric-literal → BigDecimal ladder the skipping matcher
    * and TxLog's stat comparator share. Non-finite floats return None
    * (BigDecimal rejects NaN/Infinity — a bound built from one must
    * be DROPPED, fail-open, never thrown).
    */
  def numericLit(v: Any): Option[BigDecimal] = v match {
    case n: Int   => Some(BigDecimal(n))
    case n: Long  => Some(BigDecimal(n))
    case n: Short => Some(BigDecimal(n.toInt))
    case n: Byte  => Some(BigDecimal(n.toInt))
    case n: Float =>
      if (java.lang.Float.isFinite(n)) Some(BigDecimal(n.toDouble)) else None
    case n: Double =>
      if (java.lang.Double.isFinite(n)) Some(BigDecimal(n)) else None
    case n: org.apache.spark.sql.types.Decimal => Some(n.toBigDecimal)
    case n: java.math.BigDecimal => Some(BigDecimal(n))
    case n: BigDecimal => Some(n)
    case _ => None
  }

  /** Comparison bounds of a predicate Column, read from its sql-api
    * node tree (`Column.node` and the node classes are `private[sql]`
    * upstream, hence this shim). Returns the conjuncts of shape
    * `col <op> literal` as (column, op, literal) normalized to the
    * column-on-the-left form (op ∈ {"=", "<", "<=", ">", ">="});
    * every other conjunct shape is simply omitted. Used by TxLog's
    * data-skipping matcher — fail-open by construction.
    */
  def comparisonBounds(c: org.apache.spark.sql.Column): Seq[(String, String, Any)] = {
    import org.apache.spark.sql.{internal => ci}
    val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=", "=" -> "=")
    def split(n: ci.ColumnNode): Seq[ci.ColumnNode] = n match {
      case f: ci.UnresolvedFunction
          if f.functionName.equalsIgnoreCase("and") && f.arguments.size == 2 =>
        split(f.arguments(0)) ++ split(f.arguments(1))
      case other => Seq(other)
    }
    def attr(n: ci.ColumnNode): Option[String] = n match {
      // only single-part names: a nested-field reference like col("a.b")
      // must NOT produce a bound on a top-level column named "b" — that
      // would prune files against the wrong column's stats (unsound)
      case a: ci.UnresolvedAttribute if a.nameParts.size == 1 =>
        a.nameParts.headOption
      // deliberately NO Cast unwrapping: a narrowing/truncating cast
      // changes which raw values satisfy the comparison (e.g.
      // cast(value as int) === 5 matches value 5.7), so bounds read
      // through a cast could wrongly exclude files — fail open
      case _ => None
    }
    def lit(n: ci.ColumnNode): Option[Any] = n match {
      case l: ci.Literal => Option(l.value)
      case _ => None
    }
    // `col IN (lits…)` relaxes soundly to the literals' envelope:
    // a file is excludable when its range misses [min(lits), max(lits)].
    // String min/max MUST be picked in UTF-8 byte order (the order the
    // pruner compares parquet stats in) — Java's UTF-16 code-unit
    // order disagrees beyond the BMP and would yield a too-tight
    // envelope that excludes files containing IN-list members.
    def inBounds(name: String, lits: Seq[Any]): Seq[(String, String, Any)] = {
      val ordered: Option[(Any, Any)] =
        if (lits.forall(_.isInstanceOf[String])) {
          val keyed = lits.map(l => l ->
            org.apache.spark.unsafe.types.UTF8String.fromString(l.asInstanceOf[String]))
          Some((keyed.minBy(_._2)._1, keyed.maxBy(_._2)._1))
        } else {
          val nums = lits.map(numericLit)
          if (nums.forall(_.isDefined) && nums.nonEmpty) {
            val keyed = lits.zip(nums.map(_.get))
            Some((keyed.minBy(_._2)._1, keyed.maxBy(_._2)._1))
          } else None
        }
      ordered.toSeq.flatMap { case (lo, hi) =>
        Seq((name, ">=", lo), (name, "<=", hi))
      }
    }
    split(c.node).flatMap {
      case f: ci.UnresolvedFunction
          if f.arguments.size == 2 && flip.contains(f.functionName) =>
        val (a, b) = (f.arguments(0), f.arguments(1))
        attr(a).zip(lit(b)).map { case (n, v) => (n, f.functionName, v) } ++
        attr(b).zip(lit(a)).map { case (n, v) => (n, flip(f.functionName), v) }
      case f: ci.UnresolvedFunction
          if f.functionName.equalsIgnoreCase("in") && f.arguments.size >= 2 =>
        (attr(f.arguments.head), f.arguments.tail.map(lit)) match {
          case (Some(n), ls) if ls.forall(_.isDefined) && ls.nonEmpty =>
            inBounds(n, ls.map(_.get))
          case _ => Seq.empty
        }
      case f: ci.UnresolvedFunction
          if f.arguments.size == 1 &&
            (f.functionName.equalsIgnoreCase("isnull") ||
             f.functionName.equalsIgnoreCase("isnotnull")) =>
        attr(f.arguments.head)
          .map(n => (n, f.functionName.toLowerCase, null: Any)).toSeq
      case _ => Seq.empty
    }
  }
}
