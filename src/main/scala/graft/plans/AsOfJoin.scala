package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN as a first-class operator — the §2 custom-operator ladder's
  * (c) tier for a WHOLE-JOIN semantics Spark's built-ins lack: for each
  * left row, the single right row with the same key and the greatest right
  * time at-or-before the left time (backward-inclusive, the
  * pandas.merge_asof / kdb aj / DuckDB ASOF JOIN contract; the reference's
  * "latest run at-or-before T per job" — gluettalax.py:320-336 —
  * generalized to two tables).
  *
  * Spark users express this three ways, all with a scale tax the operator
  * removes:
  *   - equi-join + window-top-1: materializes |left × right-rows-before|
  *     intermediates — quadratic fan-out on active keys (q39 measured it);
  *   - union-merge + running `last()` window (q39/q87's shape): one
  *     shuffle, no fan-out, but the window carries a per-row struct and
  *     the union's projection unions both schemas wide;
  *   - this operator: both sides hash-partitioned on the key
  *     ([[ClusteredDistribution]] — EnsureRequirements co-partitions the
  *     two shuffles exactly as it does for SortMergeJoin) and sorted by
  *     (key, time) ([[SparkPlan.requiredChildOrdering]]), then ONE
  *     streaming merge pass per partition holding O(1) state: the single
  *     current candidate row. No fan-out, no carried structs, no
  *     re-buffering — at 100 TB the cost is exactly two shuffles plus the
  *     sorts, the same envelope as a sort-merge equi-join, and the merge
  *     never rewinds (left sorted ascending ⇒ the right pointer only
  *     advances).
  *
  * Tie discipline: among right rows with equal time, the LAST under the
  * ascending `rightTiebreak` ordering wins (the merge keeps overwriting
  * its candidate while rows remain ≤ the left time, so the sort order IS
  * the tiebreak — no comparison logic can disagree with it). Inner
  * semantics: left rows with no matching right row (or a NULL key/time on
  * either side) emit nothing. Output order preserves the left side's
  * (key, time) sort within partitions ([[AsOfMergeJoinExec.outputOrdering]]
  * advertises it, so a downstream per-key window needs no re-sort).
  */
case class AsOfJoin(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression],
    forward: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length, "as-of key arity mismatch")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, tb, fwd, l, r) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, tb, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression],
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** The merge emits left rows in their incoming order, so the left
    * child's partitioning (hash on the join key after EnsureRequirements)
    * holds for the output — a downstream groupBy on the key reuses it. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def leftOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftOrdering,
      (rightKeys ++ (rightTime +: rightTiebreak)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = leftOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val (lOut, rOut, allOut) = (left.output, right.output, output)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow

      // one-row lookahead over the sorted right side; key/time are copies
      // (projections reuse buffers across next() calls)
      var rRow: UnsafeRow = null
      var rKey: UnsafeRow = null
      var rTime: UnsafeRow = null
      def advanceRight(): Unit =
        if (ri.hasNext) {
          val r = ri.next()
          rRow = r.asInstanceOf[UnsafeRow].copy()
          rKey = rKeyProj(rRow).copy()
          rTime = rTimeProj(rRow).copy()
        } else { rRow = null; rKey = null; rTime = null }
      advanceRight()

      // the O(1) merge state (backward only): latest right row seen with
      // time ≤ current left time, and the key it belongs to
      var cand: UnsafeRow = null
      var candKey: UnsafeRow = null

      if (forward) li.flatMap { l =>
        // FORWARD: first right row with equal key and time ≥ left time —
        // peek, never consume it (later lefts may claim the same row);
        // rows strictly before the left time can never match a later
        // ascending left, so consuming them is safe
        val lKey = lKeyProj(l)
        val lTimeRow = lTimeProj(l)
        if (lKey.anyNull || lTimeRow.isNullAt(0)) Iterator.empty
        else {
          var cont = rRow != null
          while (cont) {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 || (kc == 0 &&
                (rTime.isNullAt(0) || timeOrd.compare(rTime, lTimeRow) < 0))) {
              advanceRight(); cont = rRow != null
            } else cont = false
          }
          if (rRow != null && !rKey.anyNull && !rTime.isNullAt(0) &&
              keyOrd.compare(rKey, lKey) == 0)
            Iterator.single(resultProj(joined(l, rRow)))
          else Iterator.empty
        }
      }
      else li.flatMap { l =>
        val lKey = lKeyProj(l)
        val lTimeRow = lTimeProj(l)
        if (lKey.anyNull || lTimeRow.isNullAt(0)) Iterator.empty
        else {
          // consume right rows that are now in the past for this left row;
          // ties (equal time) overwrite in tiebreak order — last wins
          var cont = rRow != null
          while (cont) {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTime, lTimeRow) <= 0)) {
              if (kc == 0 && !rKey.anyNull && !rTime.isNullAt(0)) {
                cand = rRow; candKey = rKey
              }
              advanceRight()
              cont = rRow != null
            } else cont = false
          }
          if (cand != null && keyOrd.compare(candKey, lKey) == 0)
            Iterator.single(resultProj(joined(l, cand)))
          else Iterator.empty
        }
      }
    }
  }
}

object AsOfJoin {

  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = GraftColumnBridge.experimental(spark)
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** Resolve a user Column against ONE side's analyzed output (by name,
    * case-insensitively), so the logical node is born fully resolved —
    * a BinaryNode must not leave attribute resolution to the analyzer's
    * all-children search, where same-named columns on both sides would
    * be ambiguous. Non-attribute expressions (casts, arithmetic) resolve
    * their attribute leaves the same way. */
  private def resolveAgainst(side: LogicalPlan, c: Column): Expression =
    GraftColumnBridge.eagerExpression(c).transformUp {
      case u: UnresolvedAttribute =>
        side.output.find(_.name.equalsIgnoreCase(u.name)).getOrElse(
          sys.error(s"as-of: column '${u.name}' not in [${side.output.map(_.name).mkString(",")}]"))
    }

  /** Backward-inclusive as-of join (inner): for each `left` row, the
    * `right` row with equal keys and the greatest `rightTime` ≤
    * `leftTime`; equal-time ties pick the last row under ascending
    * `rightTiebreak`. Time expressions must share one orderable type
    * (cast first). */
  def asOfBackward(left: DataFrame, right: DataFrame,
      leftOn: Seq[Column], rightOn: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTiebreak: Seq[Column] = Nil): DataFrame =
    build(left, right, leftOn, rightOn, leftTime, rightTime, rightTiebreak,
      forward = false)

  /** Forward-inclusive as-of join (inner): for each `left` row, the
    * `right` row with equal keys and the SMALLEST `rightTime` ≥
    * `leftTime`; equal-time ties pick the first row under ascending
    * `rightTiebreak`. */
  def asOfForward(left: DataFrame, right: DataFrame,
      leftOn: Seq[Column], rightOn: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTiebreak: Seq[Column] = Nil): DataFrame =
    build(left, right, leftOn, rightOn, leftTime, rightTime, rightTiebreak,
      forward = true)

  private def build(left: DataFrame, right: DataFrame,
      leftOn: Seq[Column], rightOn: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTiebreak: Seq[Column], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val lt = resolveAgainst(lPlan, leftTime)
    val rt = resolveAgainst(rPlan, rightTime)
    require(lt.dataType == rt.dataType,
      s"as-of: time types differ (${lt.dataType} vs ${rt.dataType}) — cast one side")
    val lk = leftOn.map(resolveAgainst(lPlan, _))
    val rk = rightOn.map(resolveAgainst(rPlan, _))
    // keyOrd compares raw UnsafeRow slots built from the LEFT key types —
    // mismatched key types (e.g. Int vs Long) would compare garbage
    // silently instead of erroring, so enforce exact equality like time
    require(lk.map(_.dataType) == rk.map(_.dataType),
      s"as-of: key types differ (${lk.map(_.dataType).mkString(",")} vs " +
        s"${rk.map(_.dataType).mkString(",")}) — cast one side")
    GraftColumnBridge.ofRows(spark, AsOfJoin(
      lk, rk,
      lt, rt, rightTiebreak.map(resolveAgainst(rPlan, _)), forward, lPlan, rPlan))
  }
}
