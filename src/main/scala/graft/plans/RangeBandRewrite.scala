package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite an inner inequality join against a SMALL
  * literal band table — `fact JOIN bands ON v >= lo AND v < hi` with
  * pairwise-disjoint [lo, hi) rows — into the CASE-ladder projection
  * `rel_band_bucket` writes by hand. The join form is the natural way
  * to DECLARE banding; the projection is the right way to EXECUTE it:
  * Spark can only plan the inequality condition as a
  * BroadcastNestedLoopJoin (n_bands predicate evaluations per row
  * through a join operator), while the ladder is one codegen'd
  * branch chain per row with no join at all. The rewrite is only
  * legal when at most one band can match, so it proves disjointness
  * from the literal rows before firing and leaves the plan untouched
  * otherwise (overlapping bands genuinely multiply rows — a join
  * semantics the ladder cannot express).
  *
  * Scope, deliberately narrow (each guard is a semantics boundary,
  * not a TODO): INNER join; right side a LocalRelation of ≤ 64 rows;
  * condition exactly `v >= lo AND v < hi` (one half-open band per
  * row) with `v` deterministic over the left side and lo/hi DOUBLE
  * columns of the band table; no NULL bounds. NULL `v` behaves
  * identically in both forms (no band matches; the row is dropped).
  * The replacement aliases keep the band columns' original exprIds,
  * so parent operators re-resolve without rewriting.
  *
  * Registered via SparkSessionExtensions (GraftExtensions) —
  * PlanShapeSpec asserts `rel_range_join` now plans join-free, and
  * the driver's oracle (shared verbatim with `rel_band_bucket`)
  * proves the rewrite changed nothing.
  */
object RangeBandRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxBandRows = 64

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, bands: LocalRelation, Inner, Some(cond), _)
        if bands.data.nonEmpty && bands.data.length <= MaxBandRows =>
      rewrite(left, bands, cond).getOrElse(j)
  }

  private def rewrite(left: LogicalPlan, bands: LocalRelation,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    // v >= lo (or lo <= v) picking v from the left, lo from the bands.
    def asLower(e: Expression): Option[(Expression, Attribute)] = e match {
      case GreaterThanOrEqual(v, lo: Attribute)
          if fromLeft(v) && bands.outputSet.contains(lo) => Some((v, lo))
      case LessThanOrEqual(lo: Attribute, v)
          if fromLeft(v) && bands.outputSet.contains(lo) => Some((v, lo))
      case _ => None
    }
    def asUpper(e: Expression): Option[(Expression, Attribute)] = e match {
      case LessThan(v, hi: Attribute)
          if fromLeft(v) && bands.outputSet.contains(hi) => Some((v, hi))
      case GreaterThan(hi: Attribute, v)
          if fromLeft(v) && bands.outputSet.contains(hi) => Some((v, hi))
      case _ => None
    }
    def fromLeft(v: Expression): Boolean =
      v.deterministic && v.references.nonEmpty &&
        v.references.subsetOf(left.outputSet)
    val parsed = (asLower(conjuncts.head), asUpper(conjuncts(1))) match {
      case (Some(a), Some(b)) => Some((a, b))
      case _ => (asLower(conjuncts(1)), asUpper(conjuncts.head)) match {
        case (Some(a), Some(b)) => Some((a, b))
        case _ => None
      }
    }
    parsed match {
      case Some(((v1, lo), (v2, hi))) if v1.semanticEquals(v2) &&
          lo.dataType == DoubleType && hi.dataType == DoubleType =>
        val loIdx = bands.output.indexWhere(_.exprId == lo.exprId)
        val hiIdx = bands.output.indexWhere(_.exprId == hi.exprId)
        val rows = bands.data
        if (rows.exists(r => r.isNullAt(loIdx) || r.isNullAt(hiIdx)))
          return None
        val ranges = rows.map(r =>
          (r.getDouble(loIdx), r.getDouble(hiIdx)))
        // Pairwise disjoint (sorted by lo, each hi ≤ next lo): the
        // precondition that makes "join" and "at most one CASE branch"
        // the same operation.
        val sorted = ranges.sorted
        val disjoint = sorted.zip(sorted.drop(1))
          .forall { case ((_, h), (l2, _)) => h <= l2 }
        if (!disjoint) return None
        val preds = rows.map { r =>
          And(
            GreaterThanOrEqual(v1, Literal(r.getDouble(loIdx), DoubleType)),
            LessThan(v1, Literal(r.getDouble(hiIdx), DoubleType)))
        }
        val bandCols = bands.output.zipWithIndex.map { case (a, j) =>
          val branches = rows.indices.map(i =>
            (preds(i), Literal(rows(i).get(j, a.dataType), a.dataType)))
          Alias(CaseWhen(branches, None), a.name)(exprId = a.exprId)
        }
        val matched = preds.reduceLeft[Expression](Or)
        Some(Project(left.output ++ bandCols, Filter(matched, left)))
      case _ => None
    }
  }
}
