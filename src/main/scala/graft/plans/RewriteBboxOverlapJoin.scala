package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** The engine's one custom optimizer rule (SURVEY.md §4.2): an inner
  * join whose condition is the `bbox_overlaps` marker predicate is
  * rewritten from what Spark would execute as a BroadcastNestedLoopJoin
  * (cross product × predicate — quadratic at scale) into the
  * grid-cell-bucketed plan:
  *
  *   Generate(explode cells-x) → Generate(explode cells-y)  [per side]
  *   Join on (cx = cx', cy = cy')                            [equi!]
  *   Filter(exact overlap ∧ canonical-cell)                  [residual]
  *   Project(original output)
  *
  * The canonical-cell conjunct (pair emitted only from the
  * bottom-left-most shared cell) makes the rewrite EXACTLY equivalent
  * — multiplicity preserved, no distinct — proven by
  * BboxRuleSpec/SpatialJoinSpec property tests. Physical planning then
  * selects a hash/sort-merge join on (cx, cy) instead of BNLJ.
  */
object RewriteBboxOverlapJoin extends Rule[LogicalPlan]
    with PredicateHelper {

  /** Cell size in coordinate degrees; boxes spanning b cells explode
    * ×b — 10° keeps the factor small for granule/region boxes while
    * bounding candidates. */
  val CellDeg = 10.0

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // match bbox_overlaps ANYWHERE in the conjunction — the natural
    // query carries extra equi/filter conjuncts alongside it; they
    // ride into the residual filter
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      findMarker(cond, left, right) match {
        case Some((b, rest)) => rewrite(left, right, b, rest, hint)
        case None => j
      }
  }

  private def findMarker(
      cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(BboxOverlaps, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (markers, rest) = conjuncts.partition {
      case b: BboxOverlaps =>
        b.children.take(4)
          .forall(_.references.subsetOf(left.outputSet)) &&
          b.children.drop(4)
            .forall(_.references.subsetOf(right.outputSet))
      case _ => false
    }
    markers match {
      case Seq(b: BboxOverlaps) => Some((b, rest))
      case _ => None
    }
  }

  /** Clamp to the coordinate domain BEFORE the int cast: fill values
    * (e.g. 9.97e36 from NetCDF) or NaN would otherwise overflow the
    * ANSI cast and kill the query — the un-rewritten predicate just
    * evaluates false/exotic for them, so the rewrite must stay
    * total. Least/Greatest push NaN to the upper clamp. Nulls keep
    * propagating (Greatest/Least would SKIP them and clamp null to a
    * real cell, exploding null-bbox rows across the full cell range);
    * a null sequence bound makes Explode drop the row — exactly the
    * predicate's null semantics. */
  private def cellIndex(e: Expression): Expression = {
    val clamped = Least(Seq(
      Greatest(Seq(e, Literal(-181.0, DoubleType))),
      Literal(181.0, DoubleType)))
    If(IsNull(e), Literal.create(null, IntegerType),
      Cast(Floor(Divide(clamped, Literal(CellDeg, DoubleType))),
        IntegerType))
  }

  /** child + two Generate nodes exploding the covered cell range. */
  private def withCells(
      child: LogicalPlan,
      lo: Expression, hi: Expression,
      vlo: Expression, vhi: Expression,
      xName: String, yName: String): (LogicalPlan, Attribute, Attribute) = {
    val cx = AttributeReference(xName, IntegerType, nullable = false)()
    val cy = AttributeReference(yName, IntegerType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: unresolved until tz is set
    val tz = Some(conf.sessionLocalTimeZone)
    val genX = Generate(
      Explode(Sequence(cellIndex(lo), cellIndex(hi), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cx), child = child)
    val genY = Generate(
      Explode(Sequence(cellIndex(vlo), cellIndex(vhi), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cy), child = genX)
    (genY, cx, cy)
  }

  private def rewrite(
      left: LogicalPlan, right: LogicalPlan,
      b: BboxOverlaps, extraConjuncts: Seq[Expression],
      hint: JoinHint): LogicalPlan = {
    val Seq(w1, s1, e1, n1, w2, s2, e2, n2) = b.children
    val (cellsL, cxL, cyL) =
      withCells(left, w1, e1, s1, n1, "_graft_cxl", "_graft_cyl")
    val (cellsR, cxR, cyR) =
      withCells(right, w2, e2, s2, n2, "_graft_cxr", "_graft_cyr")
    val equiCond = And(EqualTo(cxL, cxR), EqualTo(cyL, cyR))
    val joined = Join(cellsL, cellsR, Inner, Some(equiCond), hint)
    val residual = And(
      And(LessThanOrEqual(w1, e2), LessThanOrEqual(w2, e1)),
      And(LessThanOrEqual(s1, n2), LessThanOrEqual(s2, n1)))
    val canonical = And(
      EqualTo(cxL, Greatest(Seq(cellIndex(w1), cellIndex(w2)))),
      EqualTo(cyL, Greatest(Seq(cellIndex(s1), cellIndex(s2)))))
    val full = (Seq(residual, canonical) ++ extraConjuncts)
      .reduce(And(_, _))
    Project((left.output ++ right.output).map(a => a: NamedExpression),
      Filter(full, joined))
  }
}
