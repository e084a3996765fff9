package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a range (interval) join against a small
  * literal bands relation into a bucketed equi join.
  *
  * Spark plans `probe JOIN bands ON v >= lo AND v < hi` as a
  * BroadcastNestedLoopJoin — every probe row is compared against
  * every band. `graft.ops.Joins.joinRangeBucketed` is the manual
  * rewrite (overlap-explode the bands into fixed-width buckets, equi
  * join on the probe row's single bucket, keep the exact range as a
  * residual); this rule performs the same rewrite automatically, so
  * users write the natural BETWEEN join and still get a hash join
  * with O(1) work per probe row.
  *
  * The rule only fires when it can prove the rewrite safe and
  * profitable at plan time:
  *  - the join is Inner and its condition is exactly
  *    `v >= lo AND v < hi` (either comparison orientation), with `v`
  *    a double column of one side and `lo`/`hi` double columns of
  *    the other;
  *  - the bands side is a [[LocalRelation]] (literal data, so the
  *    bucket expansion is computed at plan time) of ≤ [[MaxBands]]
  *    rows — exactly the "small dimension you'd broadcast" case
  *    where the nested loop hurts most relative to a hash join.
  *
  * Bucket width = the narrowest band (so a band overlaps few
  * buckets); each band row is replicated once per overlapped bucket
  * into a new LocalRelation, the probe side gets a projected
  * `floor(v / W)` bucket, and the original predicate rides along as
  * the residual filter. A band never matches a probe row twice (its
  * bucket list is distinct), so the rewrite is semantically
  * invisible — pinned by RangeBucketJoinRuleSpec against the
  * un-rewritten result.
  *
  * Registered via [[GraftExtensions]] (injectOptimizerRule) and
  * usable standalone through
  * `spark.experimental.extraOptimizations`.
  */
object RangeBucketJoinRule extends Rule[LogicalPlan] {

  private val MaxBands = 1024

  /** (v, lo, hi) if cond is the supported two-comparison range. */
  private def asRange(cond: Expression): Option[(Attribute, Attribute, Attribute)] = {
    def attr(e: Expression): Option[Attribute] = e match {
      case a: Attribute if a.dataType == DoubleType => Some(a)
      case _ => None
    }
    def ge(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThanOrEqual(a, b) => for (x <- attr(a); y <- attr(b)) yield (x, y)
      case LessThanOrEqual(a, b) => for (x <- attr(b); y <- attr(a)) yield (x, y)
      case _ => None
    }
    def lt(e: Expression): Option[(Attribute, Attribute)] = e match {
      case LessThan(a, b) => for (x <- attr(a); y <- attr(b)) yield (x, y)
      case GreaterThan(a, b) => for (x <- attr(b); y <- attr(a)) yield (x, y)
      case _ => None
    }
    cond match {
      case And(c1, c2) =>
        (for ((v1, lo) <- ge(c1); (v2, hi) <- lt(c2) if v1.semanticEquals(v2))
          yield (v1, lo, hi)) orElse
        (for ((v1, hi) <- lt(c1); (v2, lo) <- ge(c2) if v1.semanticEquals(v2))
          yield (v1, lo, hi))
      case _ => None
    }
  }

  private def outputs(p: LogicalPlan, a: Attribute): Boolean =
    p.outputSet.contains(a)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      asRange(cond).flatMap { case (v, lo, hi) =>
        // orient: which side is the probe (has v), which the bands.
        // The rewritten join always places the probe on the LEFT, so
        // when the original had bands-left/probe-right the JoinHint
        // sides must swap with the relations — otherwise a broadcast
        // hint on the small bands side would land on the probe table.
        val oriented: Option[(LogicalPlan, LocalRelation, JoinHint)] =
          if (outputs(left, v) && outputs(right, lo) && outputs(right, hi))
            right match {
              case r: LocalRelation if r.data.nonEmpty && r.data.length <= MaxBands =>
                Some((left, r, hint))
              case _ => None
            }
          else if (outputs(right, v) && outputs(left, lo) && outputs(left, hi))
            left match {
              case l: LocalRelation if l.data.nonEmpty && l.data.length <= MaxBands =>
                Some((right, l, JoinHint(hint.rightHint, hint.leftHint)))
              case _ => None
            }
          else None
        oriented.flatMap { case (probe, bands, orientedHint) =>
          rewrite(j, probe, bands, v, lo, hi, cond, orientedHint)
        }
      }.getOrElse(j)
  }

  private def rewrite(
      original: Join,
      probe: LogicalPlan,
      bands: LocalRelation,
      v: Attribute,
      lo: Attribute,
      hi: Attribute,
      cond: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    val loIdx = bands.output.indexWhere(_.exprId == lo.exprId)
    val hiIdx = bands.output.indexWhere(_.exprId == hi.exprId)
    if (loIdx < 0 || hiIdx < 0) return None
    val ranges = bands.data.map { row =>
      if (row.isNullAt(loIdx) || row.isNullAt(hiIdx)) return None
      (row.getDouble(loIdx), row.getDouble(hiIdx))
    }
    val widths = ranges.collect { case (l, h) if h > l => h - l }
    if (widths.isEmpty) return None // no satisfiable band; leave as-is
    val w = widths.min
    if (!(w > 0) || w.isInfinite) return None
    // plan-time bucket expansion of the literal bands
    val expanded: Seq[InternalRow] = ranges.zip(bands.data).flatMap {
      case ((l, h), row) =>
        // Band bucket range MUST be computed with the same IEEE ops as
        // the probe's floor(v / w): division is monotonic, so l <= v
        // (<=|<) h implies floor(l/w) <= floor(v/w) <= floor(h/w) and
        // [b0, b1] covers every reachable probe bucket. The tempting
        // ceil(h/w)-1 for the exclusive bound is NOT safe: when the
        // true quotient h/w rounds DOWN to an exact integer k,
        // ceil gives k and b1 = k-1, yet a probe v just below h can
        // still round to floor(v/w) = k — its bucket would have no
        // band row and the rewrite would silently drop a matching
        // row. One occasionally-superfluous bucket row is free (the
        // exact predicate rides along as the residual filter).
        val b0 = math.floor(l / w).toLong
        val b1 = math.floor(h / w).toLong
        if (b1 - b0 > MaxBands) return None // degenerate width; keep BNLJ
        (b0 to math.max(b0, b1)).map { b =>
          InternalRow.fromSeq(row.toSeq(bands.schema) :+ b)
        }
    }
    val bandBucket = AttributeReference("graft_band_bucket", LongType, nullable = false)()
    val expandedRel = LocalRelation(bands.output :+ bandBucket, expanded)
    // TRY cast: a probe value extreme enough that floor(v/w) leaves
    // long range cannot match any expanded band bucket anyway, so a
    // null bucket (equi join: no match) reproduces the original
    // no-row semantics where an ANSI cast would fail the whole query
    val probeBucket = Alias(
      Cast(Floor(Divide(v, Literal(w, DoubleType))), LongType,
        None, EvalMode.TRY),
      "graft_probe_bucket")()
    val probeProj = Project(probe.output :+ probeBucket, probe)
    val newCond = And(EqualTo(probeBucket.toAttribute, bandBucket), cond)
    val newJoin = Join(probeProj, expandedRel, Inner, Some(newCond), hint)
    // restore the original output (drop the bucket columns)
    Some(Project(original.output, newJoin))
  }
}
