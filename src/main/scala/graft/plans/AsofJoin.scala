package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator (SURVEY §4.3 "Strategy B"):
  * logical node + planner strategy + physical streaming-merge exec,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]).
  *
  * Semantics (identical to the union+window spelling,
  * [[graft.operators.TimeSeries.asofJoin]], and proven equal in
  * AsofExecSpec): for each left row, the latest right row of the same
  * key with `right.ts <= left.ts`; ties on ts resolved toward the LAST
  * right row in `(ts, tieBreak...)` order; unmatched left rows keep
  * nulls (left-outer).
  *
  * Physical shape: both children hash-clustered on the key and sorted by
  * `(key, ts [, tie...])` — the planner inserts the exchanges/sorts via
  * `requiredChildDistribution`/`requiredChildOrdering` — then ONE
  * synchronized forward pass per partition carrying O(1) state (the last
  * right row seen per key). Same shuffle volume as the union+window
  * plan (|left| + |right| rows hashed once) but no window buffering and
  * no struct packing/unpacking, and each side keeps its own schema.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightTieBreak: Seq[Expression],
                        tolerance: Option[Long] = None,
                        forward: Boolean = false,
                        nearest: Boolean = false) extends BinaryNode {
  require(!(forward && nearest), "direction is backward, forward OR nearest")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] into [[AsofJoinExec]]; injected per session.
  *
  * CO-LOCATED detection: when both children resolve (through
  * alias-only Projects/Filters) to ordered, key-grouped graft scans —
  * join keys = the stores' partition columns in order, ts = their time
  * columns, no tie-break — and the two scans' LIVE KEY-VALUE SETS are
  * identical, the exec runs in coLocated mode: each side already plans
  * one ts-ordered partition per key at matching indices, so the merge
  * zips them with zero exchanges and zero sorts. Anything unprovable
  * falls back to the ordinary clustered+sorted requirements.
  */
object AsofJoinStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Project}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

  /** Chase `a` down through alias-preserving nodes to the DSv2 scan
    * relation and the scan-level column name it reads. Conservative:
    * any node or expression shape outside Project/Filter/identity
    * aliasing returns None (no co-location claim).
    */
  private def resolveAttr(p: LogicalPlan, a: Expression)
      : Option[(DataSourceV2ScanRelation, String)] = a match {
    case att: Attribute => p match {
      case rel: DataSourceV2ScanRelation =>
        rel.output.find(_.exprId == att.exprId).map(o => (rel, o.name))
      case Project(list, child) =>
        list.collectFirst {
          case al: Alias if al.exprId == att.exprId &&
              al.child.isInstanceOf[Attribute] => al.child.asInstanceOf[Attribute]
          case o: Attribute if o.exprId == att.exprId => o
        }.flatMap(resolveAttr(child, _))
      case f: LFilter => resolveAttr(f.child, att)
      case _ => None
    }
    case _ => None
  }

  /** The side's live key-value vectors IF it is a provably ordered
    * keyed graft scan whose partition columns are exactly `keys` (in
    * order) and whose time column is `ts`.
    */
  private def coSig(p: LogicalPlan, keys: Seq[Expression], ts: Expression)
      : Option[Seq[Seq[String]]] = {
    val resolved = (keys :+ ts).map(resolveAttr(p, _))
    if (resolved.exists(_.isEmpty)) return None
    val rels = resolved.flatten.map(_._1).distinct
    if (rels.sizeIs != 1) return None
    val names = resolved.flatten.map(_._2)
    rels.head.scan match {
      case g: graft.sources.GraftScan =>
        g.coLocation.collect {
          case (partCols, tsCol)
              if names.init == partCols && names.last == tsCol =>
            g.coKeyValues
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, tie, tol, fwd, near) =>
      val coLocated = tie.isEmpty && (for {
        ls <- coSig(l, lk, lts)
        rs <- coSig(r, rk, rts)
      } yield ls == rs).getOrElse(false)
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie, tol,
        fwd, near, coLocated) :: Nil
    case _ => Nil
  }
}

/** `tolerance` (raw ts units — µs for timestamp columns) bounds match
  * staleness exactly like [[graft.operators.TimeSeries.asofJoin]]'s
  * tolerance: a carried match farther than the bound nulls out. Checked
  * per left row against the carried right ts — zero extra state.
  *
  * `forward = true` flips the direction: the EARLIEST right row with
  * `right.ts >= left.ts` (ties: smallest (ts, tieBreak) — exactly the
  * window spelling's mirror). The merge pass is even simpler than
  * backward: with both sides ascending, a right row behind the current
  * left ts can never match this or any LATER left row, so it is
  * discarded, and the buffered head (first at-or-after row of the key)
  * IS the winner — peeked, not consumed, because one right row may
  * serve many left rows. Still O(1) state, one pass.
  *
  * `nearest = true` composes the two: consumed at-or-behind rows keep
  * updating the carried backward candidate (max (ts, tieBreak) ≤ l.ts)
  * while the buffered head is the forward candidate (ts strictly >
  * l.ts — the equal-ts row was consumed, giving it distance 0 on the
  * backward side, which wins every tie). The nearer candidate is
  * emitted; equal distances resolve backward, matching
  * [[graft.operators.TimeSeries.asofJoinNearest]] and pandas
  * `merge_asof(direction='nearest')`. With `tolerance`, each side is
  * bounded independently before the choice.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightTieBreak: Seq[Expression],
                        tolerance: Option[Long] = None,
                        forward: Boolean = false,
                        nearest: Boolean = false,
                        coLocated: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** `coLocated = true` is the storage-partitioned as-of: the STRATEGY
    * proved both children are ordered graft scans over identical live
    * key sets (keys = the stores' partition columns, ts = their time
    * columns), so each side plans one ts-ordered partition per key with
    * matching indices — the merge pass zips them directly, no exchange,
    * no sort. Spark's own SPJ machinery cannot serve a custom join
    * (EnsureRequirements instanceof-gates on SMJ/SHJ), hence the
    * strategy-side proof; a partition-count mismatch (the proof's only
    * runtime-visible failure mode) dies loudly in zipPartitions.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (coLocated)
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
        org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (coLocated) Seq(Nil, Nil)
    else Seq(
      (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
      (rightKeys ++ (rightTs +: rightTieBreak))
        .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyTypes = leftKeys.map(_.dataType)
    val numRightCols = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsBound = BindReferences.bindReference(leftTs, left.output)
      val rTsBound = BindReferences.bindReference(rightTs, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyTypes)
      val nullRight = new GenericInternalRow(numRightCols)
      val joined = new JoinedRow
      // Parents (shuffle serializers, sorters, getByteArrayRdd on a bare
      // collect) cast rows to UnsafeRow — always hand them one, the same
      // way SortMergeJoinExec projects its joined rows.
      val resultProj = UnsafeProjection.create(output, output)
      val rBuf = rIt.buffered

      if (forward) new Iterator[InternalRow] {
        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val lRow = lIt.next()
          val lKey = lKeyProj(lRow)
          val lTsAny = lTsBound.eval(lRow)
          // discard right rows that can never match this or any later
          // left row: stale keys, NULL-ts rows (never >= anything), and
          // rows strictly behind the current left ts (left is ascending,
          // so later left rows are even further ahead). A null-ts left
          // row advances nothing — it just emits null-extended.
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rHead = rBuf.head
            val rKey = rKeyProj(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              rBuf.next()
            } else if (c == 0) {
              val rTsAny = rTsBound.eval(rHead)
              if (rTsAny == null) {
                rBuf.next() // NULL ts never satisfies r.ts >= l.ts
              } else if (lTsAny != null &&
                rTsAny.asInstanceOf[Long] < lTsAny.asInstanceOf[Long]) {
                rBuf.next() // behind every remaining left row of this key
              } else advancing = false
            } else advancing = false
          }
          // the head, if same-key, is the first (ts, tie)-ascending row
          // with ts >= l.ts — the forward as-of winner. Peek, don't
          // consume: it may also serve later left rows.
          val matched = lTsAny != null && rBuf.hasNext && {
            val rHead = rBuf.head
            keyOrd.compare(rKeyProj(rHead), lKey) == 0 && {
              val rTsAny = rTsBound.eval(rHead)
              rTsAny != null &&
                tolerance.forall(t =>
                  rTsAny.asInstanceOf[Long] - lTsAny.asInstanceOf[Long] <= t)
            }
          }
          if (matched) resultProj(joined(lRow, rBuf.head))
          else resultProj(joined(lRow, nullRight))
        }
      } else new Iterator[InternalRow] {
        // last right row consumed, valid for lastKey only — O(1) state
        private var lastKey: InternalRow = _
        private var lastRight: InternalRow = _
        private var lastRightTs: Long = 0L

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val lRow = lIt.next()
          val lKey = lKeyProj(lRow)
          // SQL comparison semantics for NULL timestamps: `r.ts <= NULL`
          // and `NULL <= l.ts` are never true, so a null-ts left row gets
          // the null-extended output and a null-ts right row can never be
          // the as-of match (it is consumed and discarded below).
          val lTsAny = lTsBound.eval(lRow)
          // consume right rows ≤ (key, ts); each consumed row becomes the
          // candidate for its key (right is (key, ts, tie)-sorted, so the
          // last consumed of a key is the as-of winner)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rHead = rBuf.head
            val rKey = rKeyProj(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // earlier key than every remaining left row: never a match
              rBuf.next()
            } else if (c == 0) {
              val rTsAny = rTsBound.eval(rHead)
              if (rTsAny == null) {
                rBuf.next() // NULL ts never satisfies r.ts <= l.ts
              } else if (lTsAny != null &&
                rTsAny.asInstanceOf[Long] <= lTsAny.asInstanceOf[Long]) {
                lastKey = rKey.copy()
                lastRightTs = rTsAny.asInstanceOf[Long]
                lastRight = rBuf.next().copy()
              } else advancing = false
            } else advancing = false
          }
          val prevValid = lTsAny != null && lastRight != null && lastKey != null &&
            keyOrd.compare(lastKey, lKey) == 0 &&
            tolerance.forall(t => lTsAny.asInstanceOf[Long] - lastRightTs <= t)
          if (!nearest) {
            if (prevValid) resultProj(joined(lRow, lastRight))
            else resultProj(joined(lRow, nullRight))
          } else {
            // nearest: the peeked head is the forward candidate — every
            // at-or-behind row was consumed above, so the head (if
            // same-key) is STRICTLY after l.ts; an equal-ts row sits on
            // the backward side with distance 0 and wins every tie.
            var nextRow: InternalRow = null
            var nextTs = 0L
            if (lTsAny != null && rBuf.hasNext) {
              val rHead = rBuf.head
              if (keyOrd.compare(rKeyProj(rHead), lKey) == 0) {
                val rTsAny = rTsBound.eval(rHead)
                if (rTsAny != null && tolerance.forall(t =>
                    rTsAny.asInstanceOf[Long] - lTsAny.asInstanceOf[Long] <= t)) {
                  nextRow = rHead
                  nextTs = rTsAny.asInstanceOf[Long]
                }
              }
            }
            val chosen =
              if (prevValid && nextRow != null) {
                val dPrev = lTsAny.asInstanceOf[Long] - lastRightTs
                val dNext = nextTs - lTsAny.asInstanceOf[Long]
                if (dNext < dPrev) nextRow else lastRight // tie → backward
              } else if (prevValid) lastRight
              else nextRow
            if (chosen != null) resultProj(joined(lRow, chosen))
            else resultProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
