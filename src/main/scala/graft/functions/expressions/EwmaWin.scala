package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially-weighted moving average as a native window function —
  * the corintick-domain smoother (reference users compute EWMA bars from
  * sliced ticks client-side; here it runs inside the engine).
  *
  * `ewma_t = α·x_t + (1-α)·ewma_{t-1}`, seeded with the first non-null
  * value; a null tick CARRIES the previous ewma (LOCF semantics, matching
  * ts_ffill) and rows before the first value are null.
  *
  * Why an [[AggregateWindowFunction]] and not a self-join/HOF spelling:
  * EWMA is inherently a sequential recurrence — expressed relationally it
  * is an O(n²) triangular window sum (every row re-weights its whole
  * history; the `(1-α)^(t-j)` closed form over/underflows doubles past a
  * few thousand rows). As a running window frame (UNBOUNDED PRECEDING →
  * CURRENT ROW — the frame this class fixes) Spark's WindowExec evaluates
  * the update expression ONCE per row per partition, streaming: O(n)
  * total, no extra shuffle beyond the window's own (partition, order)
  * sort. The buffer is declarative (one double; update/evaluate are plain
  * Catalyst expressions), so the window processor's generated projections
  * apply — no black-box UDAF in the hot path.
  */
case class Ewma(child: Expression, alpha: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(alpha > 0.0 && alpha <= 1.0, s"ewma alpha must be in (0, 1], got $alpha")

  // numeric inputs are widened explicitly (AbstractDataType — the usual
  // ImplicitCastInputTypes route — is private[sql] in Spark 4)
  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ewma"

  private lazy val ewma =
    AttributeReference("__ewma", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ewma)

  override val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  // null x → carry; first value → seed; else the recurrence. Spelled as
  // α·x + (1-α)·e (not e + α·(x-e)) so the oracle's SQL does the exact
  // same IEEE operations and 6dp-rounded outputs compare bit-equal.
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(x), ewma,
      If(IsNull(ewma), x,
        Add(Multiply(Literal(alpha), x),
          Multiply(Literal(1.0 - alpha), ewma)))))

  override val evaluateExpression: Expression = ewma

  override protected def withNewChildInternal(newChild: Expression): Ewma =
    copy(child = newChild)
}

object EwmaWin {
  import org.apache.spark.sql.GraftShim
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  /** SQL registration triple for GraftExtensions: the analyzer resolves
    * `graft_ewma(x, a) OVER (...)` through UnresolvedFunction, which
    * keeps AggregateWindowFunctions bare inside the WindowExpression —
    * the path Column.over gets wrong (see [[ewmaOver]]).
    */
  def registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_ewma"),
      new ExpressionInfo(classOf[Ewma].getName, "graft_ewma"),
      VecExprs.arity("graft_ewma", 2) { es =>
        val alpha = es(1) match {
          case Literal(v: Double, _) => v
          // SQL `0.2` parses as a Decimal literal, `1` as an integer —
          // both are valid alphas (the range check lives in Ewma itself)
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case Literal(v: Int, _) => v.toDouble
          case Literal(v: Long, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_ewma: alpha must be a numeric literal, got $other")
        }
        Ewma(es.head, alpha)
      })

  /** Bare expression — exists so alpha validation fires eagerly; prefer
    * [[ewmaOver]] for actual queries.
    */
  def ewma(x: Column, alpha: Double): Column =
    GraftShim.column(Ewma(GraftShim.expression(x), alpha))

  /** Column-API entry building the WindowExpression DIRECTLY:
    * `Column.over` in Spark 4 wraps any AggregateFunction in an
    * AggregateExpression — including AggregateWindowFunctions, which must
    * stay bare inside WindowExpression (CheckAnalysis rejects the wrapped
    * form with WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE). Builtins dodge this
    * because UnresolvedFunction resolution happens analyzer-side; a
    * library expression has to assemble the window itself. The running
    * ROWS frame is fixed here to match the function's own frame.
    */
  def ewmaOver(x: Column, alpha: Double,
               partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val order = orderBy.map(c => GraftShim.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val spec = WindowSpecDefinition(
      partitionBy.map(GraftShim.expression), order,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    GraftShim.column(
      WindowExpression(Ewma(GraftShim.expression(x), alpha), spec))
  }
}
