package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL entry point for the as-of join — a table-valued function so
  * warehouse users reach [[AsofJoinExec]] without the Scala API
  * ([[graft.operators.TimeSeries.asofJoinNative]]):
  *
  * {{{
  *   SELECT * FROM graft_asof(
  *     'purchases', 'views',        -- left/right table or view names
  *     'user_id',   'v_uid',        -- join keys
  *     'ts',        'view_ts'       -- as-of timestamp columns
  *     [, 'view_event_id'           -- right tie-break column ('' = none)
  *     [, 'backward'|'forward'|'nearest'
  *     [, <tolerance micros> ]]])
  * }}}
  *
  * The builder runs at parse time, so arguments must be literals; it
  * emits [[AsofJoinPlan]] with UNRESOLVED children and attributes — the
  * analyzer resolves the relation names against the catalog and the
  * column names against the aliased children (qualified through the
  * injected `__asof_l`/`__asof_r` aliases, so same-named key/ts columns
  * on the two sides stay unambiguous). Planning and execution are then
  * exactly the Scala path: one hash-cluster + sort per side, one O(1)
  * state merge pass ([[AsofJoinExec]]).
  */
object AsofTvf {

  private val LAlias = "__asof_l"
  private val RAlias = "__asof_r"

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v, _: StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"graft_asof: $what must be a string literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"graft_asof: $what must be an integer literal, got $other")
  }

  def build(args: Seq[Expression]): LogicalPlan = {
    if (args.length < 6 || args.length > 9)
      throw new IllegalArgumentException(
        "graft_asof expects (left, right, left_key, right_key, left_ts, right_ts" +
          "[, tie_break[, direction[, tolerance_us]]]) — got " + args.length + " args")
    val names = args.take(6).zip(Seq("left table", "right table", "left key",
      "right key", "left ts", "right ts")).map { case (e, w) => strArg(e, w) }
    val Seq(lName, rName, lKey, rKey, lTs, rTs) = names
    val tie = if (args.length > 6) strArg(args(6), "tie_break") else ""
    val direction = if (args.length > 7) strArg(args(7), "direction") else "backward"
    if (!Seq("backward", "forward", "nearest").contains(direction))
      throw new IllegalArgumentException(
        s"graft_asof: direction must be backward|forward|nearest, got '$direction'")
    val tolerance = if (args.length > 8) Some(longArg(args(8), "tolerance_us")) else None
    val l = SubqueryAlias(LAlias, UnresolvedRelation(lName.split('.').toSeq))
    val r = SubqueryAlias(RAlias, UnresolvedRelation(rName.split('.').toSeq))
    def lAttr(c: String) = UnresolvedAttribute(Seq(LAlias, c))
    def rAttr(c: String) = UnresolvedAttribute(Seq(RAlias, c))
    AsofJoinPlan(l, r,
      leftKeys = Seq(lAttr(lKey)), rightKeys = Seq(rAttr(rKey)),
      leftTs = lAttr(lTs), rightTs = rAttr(rTs),
      rightTieBreak = if (tie.isEmpty) Seq.empty else Seq(rAttr(tie)),
      tolerance = tolerance,
      forward = direction == "forward",
      nearest = direction == "nearest")
  }

  /** Registration triple for `SparkSessionExtensions.injectTableFunction`. */
  def registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_asof"),
      new ExpressionInfo(AsofTvf.getClass.getName, "graft_asof"),
      build)
}
