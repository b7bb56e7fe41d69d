package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.TopKSketch

/** Optimizer rule: rewrite the textbook top-k-per-group WINDOW pattern
  *
  *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY p ORDER BY
  *     value [ASC|DESC], id [ASC|DESC]) AS rn, child))
  *
  * into the bounded-state aggregate form (w5b):
  *
  *   Project(p…, value, id, pos+1 AS rn,
  *     Generate(posexplode(top),
  *       Aggregate(p…, topk_sketch(value, id, k) AS top, child)))
  *
  * Why: the window form sorts EVERY group in full to keep k rows — at
  * 100 TB that is a whole-table sort for a per-key top-3. The rewrite
  * keeps ≤ k (value, id) pairs per group through map-side partials and
  * the shuffle, no sort anywhere. Users write the natural declarative
  * window; the optimizer gives them the bounded plan — exactly what
  * Catalyst extension points are for.
  *
  * Soundness gates (the rule fires ONLY when equivalence is structural):
  * - the window computes exactly ONE expression: row_number() with the
  *   standard (UnboundedPreceding, CurrentRow) row frame;
  * - order is exactly (value, id) over attributes of ANY orderable
  *   atomic type (Long/Int/Decimal/String/Double/timestamp/…) in either
  *   direction, each with the DEFAULT null ordering for its direction
  *   (ASC → NULLS FIRST, DESC → NULLS LAST) — the sketch's comparator is
  *   Catalyst's own interpreted per-type ordering, so ties, floats
  *   (NaN greatest, -0.0 == 0.0) and nullable parquet columns rank
  *   identically to the window sort;
  * - the filter is `rn <= lit` / `rn < lit` with a positive int literal;
  * - the window's child outputs exactly partition ∪ {value, id} (true
  *   after column pruning whenever the query USES only those — otherwise
  *   the aggregate would drop live columns, so the rule declines);
  * - output attribute ids are preserved (value/id/rn keep their exprIds),
  *   so parent plans resolve untouched.
  *
  * Gated by `spark.graft.topkRewrite.enabled` (default true when the
  * GraftExtensions are installed; set false to fall back to the window).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    // parseBoolean, not == "true": the conf is user-set ("TRUE"/"True"
    // must not silently disable the flagship rule — ADVICE r8/r9)
    java.lang.Boolean.parseBoolean(
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topkRewrite.enabled", "true"))

  /** Orderable scalar whose interpreted ordering the sketch shares with
    * the window sort. Nested types decline: array/struct ordering is
    * orderable too, but keeping the gate to atomics keeps the
    * equivalence surface auditable (and covers every real top-k key). */
  private def supportedType(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: StructType | _: MapType => false
    case _: UserDefinedType[_] | NullType => false
    case _ => RowOrdering.isOrderable(dt)
  }

  private object RnLimit {
    /** rn <= k / rn < k+1 with a positive int literal → (rnAttr, k). */
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if k > 0 =>
        Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if k > 1 =>
        Some((a, k - 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case f @ Filter(RnLimit(rnAttr, k),
          w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(partitionSpec, orderSpec,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            _, _, child, _))
          if alias.toAttribute.semanticEquals(rnAttr) &&
            partitionSpec.forall(_.isInstanceOf[Attribute]) =>
        orderSpec match {
          case Seq(
              SortOrder(value: Attribute, vDir, vNulls, _),
              SortOrder(id: Attribute, idDir, idNulls, _))
              if vNulls == vDir.defaultNullOrdering &&
                idNulls == idDir.defaultNullOrdering &&
                supportedType(value.dataType) && supportedType(id.dataType) &&
                child.outputSet.subsetOf(AttributeSet(
                  partitionSpec.map(_.asInstanceOf[Attribute]) ++ Seq(value, id))) &&
                child.outputSet.contains(value) && child.outputSet.contains(id) =>
            rewrite(f, partitionSpec.map(_.asInstanceOf[Attribute]),
              value, id, rnAttr, k,
              vDir == Descending, idDir == Descending, child)
          case _ => f
        }
    }
  }

  private def rewrite(orig: Filter, partition: Seq[Attribute],
      value: Attribute, id: Attribute, rnAttr: Attribute, k: Int,
      valueDesc: Boolean, idDesc: Boolean, child: LogicalPlan): LogicalPlan = {
    val sketch = TopKSketch(value, id, k, valueDesc = valueDesc, idDesc = idDesc)
    val topAlias = Alias(AggregateExpression(sketch,
      org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
      isDistinct = false), "top")()
    val agg = Aggregate(partition, partition :+ topAlias, child)
    val posAttr = AttributeReference("pos", IntegerType, nullable = false)()
    val elemAttr = AttributeReference("tk", sketch.dataType
      .asInstanceOf[ArrayType].elementType, nullable = false)()
    val gen = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, elemAttr), agg)
    // Reconstruct the window's output IN ORDER (child cols, then rn),
    // reusing the original exprIds so parents resolve unchanged.
    val rebuilt = orig.child.output.map { a =>
      if (a.semanticEquals(value))
        Alias(GetStructField(elemAttr, 0, Some("value")), a.name)(exprId = a.exprId)
      else if (a.semanticEquals(id))
        Alias(GetStructField(elemAttr, 1, Some("id")), a.name)(exprId = a.exprId)
      else if (a.semanticEquals(rnAttr))
        Alias(Add(posAttr, Literal(1)), a.name)(exprId = a.exprId)
      else a // partition attribute — flows through the aggregate untouched
    }
    Project(rebuilt, gen)
  }
}
