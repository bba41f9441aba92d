package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BindReferences, Expression}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Connector-side evaluation of `GENERATED ALWAYS AS (expr)` columns —
  * the piece Spark deliberately leaves to the connector: the analyzer
  * VALIDATES generation expressions at CREATE (deterministic, no
  * subqueries, references only non-generated columns —
  * GeneratedColumn.validateGeneratedColumns) and stores the expression
  * SQL in the column metadata (`GENERATION_EXPRESSION`), but never
  * computes a value on the write path; a connector that accepts the
  * capability and does nothing would silently serve NULLs (the r11 reason
  * this stayed refused). This object closes that half: it compiles the
  * stored SQL into a row evaluator once per (schema, expression) and the
  * atomic commit applies it — the Delta generated-columns contract
  * (compute omitted values; VALIDATE explicitly supplied ones against the
  * expression and reject mismatches rather than storing a lie).
  *
  * Compilation reuses Spark's own front end end-to-end so the semantics
  * are exactly SQL's: parse with [[CatalystSqlParser]], resolve +
  * type-coerce by running the active session's analyzer over a one-row
  * projection, then bind to the table schema's ordinals. The evaluator is
  * interpreted (`Expression.eval`) — commits apply it driver-side to the
  * arrival rows, off the task hot path; a production connector would ship
  * the same bound expression into its writer tasks.
  */
private[sources] object GeneratedColumnEval {
  /** (schema json, expression sql) → bound row evaluator. Snapshot
    * schemas are immutable once published, so the cache never staleness-
    * invalidates; schema evolution yields a new key. */
  private val cache = new scala.collection.concurrent.TrieMap[
    (String, String), Array[Any] => Any]

  /** Compile `sql` against `schema`, requiring the resolved type to equal
    * the declared column type (the Delta posture: a generation expression
    * whose type drifts from the column is a schema bug, not a cast). */
  def compile(schema: StructType, sql: String, declared: DataType,
      colName: String): Array[Any] => Any =
    cache.getOrElseUpdate((schema.json, sql), {
      val attrs = schema.fields.toIndexedSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
      val parsed = CatalystSqlParser.parseExpression(sql)
      val plan = Project(Seq(Alias(parsed, colName)()), LocalRelation(attrs))
      val analyzed = SparkSession.active.sessionState.analyzer.execute(plan)
      require(analyzed.resolved,
        s"graft catalog: generation expression '$sql' for column '$colName' " +
          "did not resolve against the table schema")
      val expr: Expression = analyzed.asInstanceOf[Project].projectList.head
      require(expr.dataType == declared,
        s"graft catalog: generation expression '$sql' has type " +
          s"${expr.dataType.simpleString} but column '$colName' is declared " +
          s"${declared.simpleString}")
      val bound = BindReferences.bindReference(expr, attrs)
      (row: Array[Any]) => {
        val ir = InternalRow.fromSeq(row.toIndexedSeq.map {
          case s: String => UTF8String.fromString(s)
          case v         => v
        })
        bound.eval(ir) match {
          case u: UTF8String => u.toString
          case v             => v
        }
      }
    })
}
