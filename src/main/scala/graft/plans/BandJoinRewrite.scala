package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive band join —
  *
  *   `l JOIN r ON ... AND abs(l.x − r.y) <= c`   (x, y integral)
  *   `l JOIN r ON ... AND l.x BETWEEN r.y − c1 AND r.y + c2`
  *
  * — into the binned equi-join `graft.operators.BandJoin` implements by
  * hand: explode the left side into time-bins {b−1, b, b+1} of width c,
  * give the right side its home bin, equi-join on the bin, keep the
  * exact predicate as a post-filter. Same rows (a band-matching pair
  * shares at least one of the three candidate bins, and meets exactly
  * once because the three bins are distinct and the right row has one
  * home bin); the plan goes from quadratic-per-key (BroadcastNestedLoop
  * / post-filtered equi-join on only the remaining keys) to a shuffle
  * equi-join whose work scales with rows per band window.
  *
  * This is the (c)-tier custom-plan case of the build brief: no
  * DataFrame-level construct expresses "make this inequality predicate
  * a join key", so it has to be a `Rule[LogicalPlan]` registered via
  * `SparkSessionExtensions` ([[GraftExtensions]]).
  *
  * Bins use `Math.floorDiv` (true floor division — `div`'s truncation
  * toward zero would mis-bin negative values, e.g. pre-1970 epochs).
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Rewritten = TreeNodeTag[Boolean]("graft.bandJoinRewritten")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && j.getTagValue(Rewritten).isEmpty &&
          // structural re-entry guard: tags are lost when another rule
          // copies the node, and re-matching would stack a 3x explode
          // per fixpoint iteration
          !cond.exists {
            case a: AttributeReference => a.name.startsWith("graft_bin")
            case _ => false
          } =>
      bandPredicate(left, right, cond) match {
        case Some((x, y, c)) =>
          val lBin = floorDiv(castLong(x), c)
          val rBin = floorDiv(castLong(y), c)
          // left: explode candidate bins {b-1, b, b+1}
          val binAttr = AttributeReference("graft_bin", LongType,
            nullable = true)()
          val gen = Generate(
            Explode(CreateArray(Seq(
              Subtract(lBin, Literal(1L)), lBin, Add(lBin, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = left)
          // right: single home bin
          val rAlias = Alias(rBin, "graft_bin_r")()
          val proj = Project(right.output :+ rAlias, right)
          val newJoin = Join(gen, proj, Inner,
            Some(And(EqualTo(binAttr, rAlias.toAttribute), cond)), hint)
          newJoin.setTagValue(Rewritten, true)
          Project(j.output, newJoin)
        case None => j
      }
  }

  private def castLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def floorDiv(x: Expression, c: Long): Expression =
    StaticInvoke(classOf[java.lang.Math], LongType, "floorDiv",
      Seq(x, Literal(c)), Seq(LongType, LongType))

  /** Band predicate in either user spelling, with x, y integral and
    * from opposite join sides; returns (left-side expr, right-side
    * expr, band):
    *
    *  1. `abs(x − y) <= c` — one conjunct (either literal side /
    *     comparison direction);
    *  2. `x BETWEEN y − c1 AND y + c2` — which the parser splits into
    *     the two range conjuncts `x >= y − c1` and `x <= y + c2`. The
    *     bin width is max(c1, c2): a matching pair satisfies
    *     |x − y| <= max, so it shares one of the three candidate bins,
    *     and the exact original predicate stays as the post-filter, so
    *     an asymmetric band still returns exactly its own rows. */
  private def bandPredicate(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(Expression, Expression, Long)] = {
    def integral(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == IntegerType
    def longOf(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue)
      case i: java.lang.Long => Some(i.longValue)
      case _ => None
    }
    def sides(x: Expression, y: Expression): Option[(Expression, Expression)] =
      if (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) Some((x, y))
      else if (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet)) Some((y, x))
      else None
    def accept(x: Expression, y: Expression, c: Long) =
      if (c > 0 && integral(x) && integral(y) && sides(x, y).isDefined) {
        val (lx, ry) = sides(x, y).get
        Some((lx, ry, c))
      } else None

    val conjuncts = splitConjunctivePredicates(cond)

    val absForm = conjuncts.iterator.map {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), lit: Literal) =>
        (x, y, longOf(lit))
      case GreaterThanOrEqual(lit: Literal, Abs(Subtract(x, y, _), _)) =>
        (x, y, longOf(lit))
      case _ => (null, null, None)
    }.collectFirst {
      case (x, y, Some(c)) if x != null && accept(x, y, c).isDefined =>
        accept(x, y, c).get
    }

    // BETWEEN form: normalize each conjunct to "a − b <= c", then find
    // a matching opposite-direction pair over the same (a, b).
    def diffBound(e: Expression): Option[(Expression, Expression, Long)] =
      e match {
        case LessThanOrEqual(x, Add(y, l: Literal, _)) =>
          longOf(l).map(c => (x, y, c)) //  x <= y + c   ⇒ x − y <= c
        case LessThanOrEqual(x, Add(l: Literal, y, _)) =>
          longOf(l).map(c => (x, y, c))
        case GreaterThanOrEqual(x, Subtract(y, l: Literal, _)) =>
          longOf(l).map(c => (y, x, c)) //  x >= y − c   ⇒ y − x <= c
        case LessThanOrEqual(Subtract(x, y, _), l: Literal) =>
          longOf(l).map(c => (x, y, c)) //  x − y <= c
        case GreaterThanOrEqual(l: Literal, Subtract(x, y, _)) =>
          longOf(l).map(c => (x, y, c))
        case _ => None
      }
    def betweenForm: Option[(Expression, Expression, Long)] = {
      val bounds = conjuncts.flatMap(diffBound)
      bounds.iterator.flatMap { case (a, b, c1) =>
        bounds.collectFirst {
          case (b2, a2, c2) if a.semanticEquals(a2) && b.semanticEquals(b2) =>
            (a, b, math.max(c1, c2))
        }
      }.flatMap { case (x, y, c) => accept(x, y, c) }
        .nextOption()
    }

    absForm.orElse(betweenForm)
  }
}
