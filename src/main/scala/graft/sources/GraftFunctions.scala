package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** CATALOG-SERVED FUNCTIONS ([[org.apache.spark.sql.connector.catalog
  * .FunctionCatalog]]) — the V2 function surface: `SELECT
  * graft_cat.system.token_count(text)` resolves through the catalog
  * (loadFunction → UnboundFunction.bind against the actual argument
  * types), and execution rides the contract's two performance tiers:
  *
  *  - [[ScalarFunction]] with the MAGIC METHOD (`invoke` matching the
  *    bound input types): Spark's analyzer finds it reflectively ONCE and
  *    plans a direct `Invoke` call — whole-stage codegen emits a plain
  *    method call per row, no InternalRow boxing (the `produceResult`
  *    row-based path is the documented slow fallback, kept here as the
  *    contract requires);
  *  - [[AggregateFunction]]: distributed partial aggregation — Spark
  *    calls `update` per row map-side, `merge` across partitions, and
  *    `produceResult` once at the end, so a catalog function aggregates
  *    with the same two-phase shuffle shape as a built-in.
  *
  * Two functions, both exactly replayable by the DuckDB oracle:
  * `token_count(STRING): BIGINT` (whitespace tokenization — the
  * text-pipeline primitive t-family entries compute inline, now servable
  * to ANY session by catalog name) and `bit_or_agg(BIGINT): BIGINT`
  * (bitwise-OR rollup — an id-mask/bloom-style accumulator whose
  * merge is associative+commutative, the property the two-phase contract
  * exercises). `SHOW FUNCTIONS` / `DESCRIBE FUNCTION` ride
  * `listFunctions` / `loadFunction().description()`.
  */
private[sources] object GraftFunctions {
  val names: Array[String] = Array("token_count", "bit_or_agg")

  def load(ident: Identifier): UnboundFunction =
    (ident.namespace().toSeq, ident.name().toLowerCase) match {
      case (Seq("system"), "token_count") => TokenCountFunction
      case (Seq("system"), "bit_or_agg")  => BitOrAggFunction
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
          ident.namespace().mkString("."), ident.name())
    }

  /** Whitespace token count, total-function over NULL/empty (0). */
  object TokenCountFunction extends UnboundFunction
      with ScalarFunction[java.lang.Long] {
    override def name(): String = "token_count"
    override def description(): String =
      "token_count(s STRING): BIGINT — number of whitespace-separated tokens " +
        "(0 for NULL/blank); magic-method scalar, codegen-invoked per row"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1 ||
          inputType.fields(0).dataType != StringType)
        throw new UnsupportedOperationException(
          s"token_count expects (STRING), got ${inputType.simpleString}")
      this
    }
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false

    /** The magic method: the analyzer plans a direct Invoke on this
      * signature — one virtual call per row inside codegen. */
    def invoke(s: UTF8String): Long = {
      if (s == null) return 0L
      val str = s.toString
      var i = 0
      var tokens = 0L
      var inTok = false
      while (i < str.length) {
        val ws = Character.isWhitespace(str.charAt(i))
        if (!ws && !inTok) { tokens += 1; inTok = true }
        else if (ws) inTok = false
        i += 1
      }
      tokens
    }
    /** Row-based fallback the contract requires alongside the magic
      * method (used when reflection fails or for interpreted paths). */
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(if (input.isNullAt(0)) null else input.getUTF8String(0))
  }

  /** Bitwise-OR aggregate — associative + commutative state, the shape
    * the partial/merge contract needs; NULLs are ignored (SQL aggregate
    * convention), empty input produces 0. */
  object BitOrAggFunction extends UnboundFunction
      with AggregateFunction[java.lang.Long, java.lang.Long] {
    override def name(): String = "bit_or_agg"
    override def description(): String =
      "bit_or_agg(x BIGINT): BIGINT — bitwise OR of all non-null inputs " +
        "(two-phase: per-partition update, cross-partition merge)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1 ||
          inputType.fields(0).dataType != LongType)
        throw new UnsupportedOperationException(
          s"bit_or_agg expects (BIGINT), got ${inputType.simpleString}")
      this
    }
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false

    override def newAggregationState(): java.lang.Long = 0L
    override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) state else state | input.getLong(0)
    override def merge(s1: java.lang.Long, s2: java.lang.Long): java.lang.Long =
      s1 | s2
    override def produceResult(state: java.lang.Long): java.lang.Long = state
  }
}
