package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that REPORTS itself non-deterministic — a pure
  * optimizer fence (the Scala-expression twin of guide §4.4's
  * `udf.asNondeterministic()` trick).
  *
  * Why it exists: a filter on an expensive derived column (a 64-term
  * cosine, a set-intersection Jaccard) gets pushed by
  * `PushPredicateThroughJoin` into the join condition, where the heavy
  * expression is then evaluated per CANDIDATE pair in interpreted mode
  * (measured 22 s vs ~1.5 s for llm_dedup_embed at sf0.1). The previous
  * fence — `graft.Q.aggFilterBarrier`'s interposed per-key aggregate —
  * was semantically airtight but paid a full extra Exchange + two
  * HashAggregates over EVERY candidate pair just to hold the line.
  * Wrapping the heavy value in this expression achieves the same fence
  * for free: the optimizer may not push predicates below, duplicate,
  * re-order, or constant-fold a non-deterministic expression, so the
  * value is computed exactly once, map-side, in the join stage's
  * codegen'd Project, and the filter stays above it.
  *
  * The non-determinism is a DECLARATION, not a behavior: evaluation is
  * the child's, bit-for-bit, on every call and every task retry — so the
  * SPARK-38388 retry hazard (genuinely random values re-drawn under
  * recomputation) cannot arise. It only forfeits optimizations
  * (pushdown, CSE, folding) that would be wrong to want here.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
