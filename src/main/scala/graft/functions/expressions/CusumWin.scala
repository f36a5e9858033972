package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** One-sided CUSUM (cumulative-sum changepoint statistic) as a native
  * window function: `s_t = max(0, s_{t-1} + (x_t − drift))`, seeded at 0
  * (`drift` = in-control target + slack k in the classic Page CUSUM; an
  * alarm is `s_t > h` downstream). The monitoring primitive for drift
  * detection over metric/quality streams — data-quality regressions, a
  * feed's value distribution shifting, a quality score decaying.
  *
  * Like [[Ewma]], the recurrence is inherently sequential — `max(0, ·)`
  * has no prefix-sum closed form at all (unlike EWMA's geometric
  * weights), so a relational spelling would be a per-row dependent
  * subquery. As a running-frame [[AggregateWindowFunction]] the window
  * processor evaluates one declarative update per row, streaming, O(n)
  * per partition with no shuffle beyond the window's own sort. A null
  * x carries the statistic (LOCF, matching [[Ewma]]).
  *
  * The update is spelled `greatest(0.0, s + (x − drift))` — the exact
  * operation order the DuckDB oracle's recursive CTE uses, so outputs
  * compare bit-equal before the defensive rounding.
  */
case class Cusum(child: Expression, drift: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cusum"

  private lazy val s =
    AttributeReference("__cusum", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(s)

  override val initialValues: Seq[Expression] = Seq(Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(x), s,
      Greatest(Seq(Literal(0.0), Add(s, Subtract(x, Literal(drift)))))))

  override val evaluateExpression: Expression = s

  override protected def withNewChildInternal(newChild: Expression): Cusum =
    copy(child = newChild)
}

object CusumWin {
  import org.apache.spark.sql.GraftShim
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  /** SQL registration: `graft_cusum(x, drift) OVER (...)`. */
  def registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_cusum"),
      new ExpressionInfo(classOf[Cusum].getName, "graft_cusum"),
      VecExprs.arity("graft_cusum", 2) { es =>
        val drift = es(1) match {
          case Literal(v: Double, _) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case Literal(v: Int, _) => v.toDouble
          case Literal(v: Long, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_cusum: drift must be a numeric literal, got $other")
        }
        Cusum(es.head, drift)
      })

  /** Column-API entry assembling the WindowExpression directly with the
    * running ROWS frame — same Column.over caveat as [[EwmaWin.ewmaOver]].
    */
  def cusumOver(x: Column, drift: Double,
                partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val order = orderBy.map(c => GraftShim.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val spec = WindowSpecDefinition(
      partitionBy.map(GraftShim.expression), order,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    GraftShim.column(
      WindowExpression(Cusum(GraftShim.expression(x), drift), spec))
  }
}
