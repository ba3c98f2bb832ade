package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Aggregate pushdown through `Generate(Explode(Sequence(...)))` — the
  * two-phase CUMULATE shape as a Catalyst optimizer rule.
  *
  * The CUMULATE window TVF (reference test/syntax-test.fsql:227-239) lowers
  * to explode-a-sequence-then-aggregate: every input row is replicated into
  * each cumulative window still open for it (up to size/step copies) BEFORE
  * any reduction. At production row counts the partial-aggregation pass then
  * costs size/step× the input. When every aggregate is decomposable and the
  * exploded value feeds only grouping expressions, the aggregation can run
  * FIRST — grouped by the sequence bounds — and the explode replicate
  * post-aggregation partials instead of raw rows:
  *
  *   Aggregate(G, A, Project(P, Generate(Explode(Seq(start, stop, step)), C)))
  *   ==> Aggregate(G, merge(A),
  *         Project(P', Generate(Explode(Seq(start', stop, step)),
  *           Aggregate(G-untainted ++ {start} ++ tainted-inputs, partial(A), C))))
  *
  * Correctness: rows in one pre-aggregate group share identical sequence
  * bounds (the bounds ARE group keys), so each partial row explodes into
  * exactly the window set each of its source rows would have, and
  * count/sum/min/max merge losslessly across buckets. Installed per-session
  * via `spark.experimental.extraOptimizations` ([[install]]) so it applies
  * to any session (including driver-built ones), covering both the SQL
  * dialect's CUMULATE translation (engine/FlinkDialect.scala:172) and ad-hoc
  * cumulate-then-aggregate DataFrame plans. The explicit two-phase API
  * ([[graft.operators.Windows.cumulativeAgg]]) remains for callers that want
  * the shape without the rule.
  */
object CumulateTwoPhase extends Rule[LogicalPlan] {

  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(_, _, Project(projList, gen: Generate), _)
        if eligible(agg, gen) =>
      rewrite(agg, projList, gen).getOrElse(agg)
    case agg @ Aggregate(_, _, gen: Generate, _) if eligible(agg, gen) =>
      // no Project between: treat the Generate output as an identity list
      rewrite(agg, gen.output, gen).getOrElse(agg)
  }

  /** The plan under the Generate with any Project chain peeled off — the
    * anti-loop guard must see through Projects the optimizer (e.g.
    * ColumnPruning) may have slid between our Generate and the phase-1
    * Aggregate, or the rule re-fires on its own output. */
  @scala.annotation.tailrec
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, child) => stripProjects(child)
    case other => other
  }

  private def eligible(agg: Aggregate, gen: Generate): Boolean = gen match {
    case Generate(Explode(seq: Sequence), _, false, _, Seq(_), child) =>
      // anti-loop guard: a Generate already sitting on an Aggregate (even
      // through interposed Projects) is our own handiwork (or a user plan
      // this rewrite cannot improve).
      // Streaming plans are excluded outright: stacking a second stateful
      // aggregate changes output-mode legality and state semantics there.
      !stripProjects(child).isInstanceOf[Aggregate] && !child.isStreaming &&
        seq.stepOpt.forall(_.foldable) && seq.stop.foldable &&
        seq.start.deterministic && seq.start.references.subsetOf(child.outputSet) &&
        agg.groupingExpressions.forall(_.isInstanceOf[Attribute])
    case _ => false
  }

  private def rewrite(agg: Aggregate, projList: Seq[NamedExpression],
      gen: Generate): Option[LogicalPlan] = {
    val Generate(Explode(seq: Sequence), _, _, qualifier, Seq(gAttr), gchild) = gen

    // all comparisons by exprId: optimizer passes can drift nullability or
    // qualifiers between an Alias#toAttribute and references to it
    val gId = gAttr.exprId

    // upper-project alias bodies, for inlining expressions moved below
    val aliasBody = projList.collect { case a: Alias => a.exprId -> a.child }.toMap
    def inline(e: Expression): Expression = e.transformUp {
      case attr: Attribute => aliasBody.getOrElse(attr.exprId, attr)
    }

    // taint = depends on the exploded value
    val taintedIds = projList.collect {
      case ne if ne.references.exists(_.exprId == gId) => ne.exprId
    }.toSet + gId

    val groupAttrs = agg.groupingExpressions.map(_.asInstanceOf[Attribute])
    val (taintedKeys, untaintedKeys) = groupAttrs.partition(a => taintedIds.contains(a.exprId))
    val gchildIds = gchild.outputSet.map(_.exprId).toSet

    // every aggregate call must be decomposable and independent of the explode
    val aggCalls = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae }).distinct
    val decomposable = aggCalls.forall { ae =>
      !ae.isDistinct && ae.filter.isEmpty && ae.mode == Complete &&
        !ae.references.exists(a => taintedIds.contains(a.exprId)) &&
        inline(ae.aggregateFunction).references.forall(a => gchildIds.contains(a.exprId)) &&
        (ae.aggregateFunction match {
          case _: Count => true
          case s: Sum =>
            // partial-then-merge must be LOSSLESS: floating-point sums change
            // accumulation structure (ULP drift vs the unrewritten plan), and
            // TRY-mode sums turn a per-bucket overflow into a NULL partial
            // the merge would silently skip where the original returns NULL
            s.evalContext.evalMode != EvalMode.TRY &&
              (s.dataType match {
                case _: org.apache.spark.sql.types.DecimalType => true
                case org.apache.spark.sql.types.LongType => true
                case _ => false
              })
          case _: Min | _: Max => true
          case _ => false
        })
    }
    // the rewrite re-evaluates project/grouping expressions against grouped
    // partials instead of per input row — only sound for deterministic plans
    val deterministicOk = agg.aggregateExpressions.forall(_.deterministic) &&
      agg.groupingExpressions.forall(_.deterministic) && projList.forall(_.deterministic)
    // tainted grouping keys must be recomputable above from preserved inputs
    val taintedNes = taintedKeys.map(k => projList.find(_.exprId == k.exprId).get)
    val taintedInputs = taintedNes.flatMap(_.references)
      .filterNot(_.exprId == gId).map(a => a.exprId -> a).toMap.values.toSeq
    val untaintedOk = untaintedKeys.forall { k =>
      gchildIds.contains(k.exprId) ||
        (projList.exists(_.exprId == k.exprId) &&
          inline(k).references.forall(a => gchildIds.contains(a.exprId)))
    }
    if (!decomposable || !deterministicOk || !untaintedOk ||
        !taintedInputs.forall(a => gchildIds.contains(a.exprId))) return None

    // ---- phase 1: pre-aggregate below the explode -------------------------
    val startAlias = Alias(seq.start, "__cum_start")()
    val belowKeys: Seq[NamedExpression] =
      untaintedKeys.map { k =>
        if (gchildIds.contains(k.exprId)) k
        else Alias(inline(k), k.name)(exprId = k.exprId, qualifier = k.qualifier)
      } ++ (startAlias +: taintedInputs.filterNot(a =>
        untaintedKeys.exists(_.exprId == a.exprId)))
    val partials = aggCalls.zipWithIndex.map { case (ae, i) =>
      val fn = ae.aggregateFunction match {
        case c: Count => Count(c.children.map(inline))
        case s: Sum => s.withNewChildren(s.children.map(inline)).asInstanceOf[AggregateFunction]
        case m: Min => Min(inline(m.child))
        case m: Max => Max(inline(m.child))
        case other => other // unreachable: gated by `decomposable`
      }
      Alias(AggregateExpression(fn, Complete, isDistinct = false, None), s"__cum_p$i")()
    }
    val preAgg = Aggregate(belowKeys, belowKeys ++ partials, gchild, None)

    // ---- explode the partials --------------------------------------------
    val g2 = AttributeReference(gAttr.name, gAttr.dataType, nullable = gAttr.nullable)()
    val seq2 = Sequence(startAlias.toAttribute, seq.stop, seq.stepOpt, seq.timeZoneId)
    val gen2 = Generate(Explode(seq2), Nil, outer = false, qualifier, Seq(g2), preAgg)

    // ---- phase 2: recompute tainted keys, merge partials ------------------
    val rebuiltTainted = taintedNes.map { ne =>
      val body = ne match {
        case a: Alias => a.child
        case attr: Attribute => attr: Expression
      }
      val sub = body.transformUp { case a: Attribute if a.exprId == gId => g2 }
      Alias(sub, ne.name)(exprId = ne.toAttribute.exprId, qualifier = ne.toAttribute.qualifier)
    }
    val project2 = Project(
      untaintedKeys ++ rebuiltTainted ++ partials.map(_.toAttribute), gen2)

    val merged: Map[AggregateExpression, Expression] =
      aggCalls.zipWithIndex.map { case (ae, i) =>
        val p = partials(i).toAttribute
        val fn: AggregateFunction = ae.aggregateFunction match {
          case _: Count => Sum(p)
          case s: Sum => new Sum(p, s.evalContext)
          case _: Min => Min(p)
          case _: Max => Max(p)
          case other => other // unreachable
        }
        val m = AggregateExpression(fn, Complete, isDistinct = false, None)
        val cast: Expression =
          if (ae.aggregateFunction.isInstanceOf[Count]) Cast(m, LongType)
          else if (m.dataType == ae.dataType) m
          else Cast(m, ae.dataType)
        ae -> cast
      }.toMap
    val finalAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression if merged.contains(ae) => merged(ae)
      }.asInstanceOf[NamedExpression]
    }
    Some(Aggregate(groupAttrs, finalAggExprs, project2, None))
  }
}
