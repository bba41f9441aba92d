package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Native SESSIONIZER as an AggregateWindowFunction — the deepest window
  * seam Catalyst offers (the same internal contract as row_number/rank):
  * a DECLARATIVE running-state machine evaluated inside WindowExec, no
  * UDF, no mapGroups. The buffer carries (previous timestamp, session
  * counter); each row's update expressions are evaluated against the OLD
  * buffer simultaneously (tuple assignment semantics), so the gap test
  * reads the true predecessor: a row more than `gap` micros after its
  * predecessor — or the partition's first row — opens a new session.
  *
  * Why this beats the lag+cumsum SQL idiom (q135's mechanics) at the
  * engine level: the idiom is TWO window passes (lag, then a running sum
  * over the flags); this is ONE pass with two longs of state per
  * partition, and it composes like any built-in — `.over(partitionBy …
  * orderBy …)`. The frame is the AggregateWindowFunction default
  * (UNBOUNDED PRECEDING → CURRENT ROW), exactly a running fold.
  *
  * Session ids are 1-based within each partition; ties in the caller's
  * ORDER BY must be broken by a unique column (the window contract, same
  * as every ranking function).
  */
case class SessionId(ts: Expression, gap: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(ts, gap)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private lazy val prevTs =
    AttributeReference("prevTs", LongType, nullable = true)()
  private lazy val sid =
    AttributeReference("sid", LongType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(prevTs, sid)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(0L))

  // evaluated against the OLD buffer, then assigned as a tuple — so sid's
  // gap test sees the pre-update prevTs even though prevTs is also updated
  override lazy val updateExpressions: Seq[Expression] = Seq(
    ts,
    If(Or(IsNull(prevTs), GreaterThan(Subtract(ts, prevTs), gap)),
      Add(sid, Literal(1L)), sid))

  override lazy val evaluateExpression: Expression = sid

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SessionId =
    copy(ts = newChildren(0), gap = newChildren(1))
}
