package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 connector — the extension seam the reference's
  * crawler/catalog surface presumes (every Glue table is "some connector +
  * a schema", `gluettalax.py:407-411` copies connector-specific
  * StorageDescriptors around): a deterministic synthetic events generator
  * with the two optimizations that make a connector worth writing:
  *
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the reader
  *     materializes only requested fields — a projection of 2 of 4
  *     columns never generates the other two;
  *   - FILTER PUSHDOWN + PARTITION PRUNING ([[SupportsPushDownFilters]]):
  *     range predicates on the ordered `event_id` column tighten the
  *     global [lo, hi) bounds, and generator partitions whose slice
  *     falls outside survive as zero work — the scan PLANS k of n
  *     partitions, it doesn't read-then-drop (q94's zone-map idea,
  *     enforced by the connector itself).
  *
  * Row content is pure id arithmetic (user_id = id mod 97, five event
  * types by id mod 5, cents = id·37 mod 100000), so the DuckDB oracle
  * regenerates the identical table from `range()` — every row the
  * connector emits is oracle-checked, not just counted. The scan
  * description embeds pushed bounds + partition counts for PlanSpec.
  */
class SyntheticEvents extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("parts", "8").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

object SyntheticEvents {
  val schema: StructType = new StructType()
    .add("event_id", LongType, nullable = false)
    .add("user_id", LongType, nullable = false)
    .add("event_type", StringType, nullable = false)
    .add("cents", LongType, nullable = false)
  val types: Array[UTF8String] =
    Array("view", "click", "signup", "purchase", "error").map(UTF8String.fromString)
}

private[sources] class SynthTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synthetic_events($rows)"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

private[sources] class SynthScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticEvents.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("event_id", _: java.lang.Long) => true
      case GreaterThan("event_id", _: java.lang.Long)        => true
      case LessThan("event_id", _: java.lang.Long)           => true
      case LessThanOrEqual("event_id", _: java.lang.Long)    => true
      case _                                                 => false
    }
    accepted.foreach {
      case GreaterThanOrEqual(_, v: java.lang.Long) => lo = math.max(lo, v)
      case GreaterThan(_, v: java.lang.Long)        => lo = math.max(lo, v + 1)
      case LessThan(_, v: java.lang.Long)           => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: java.lang.Long)    => hi = math.min(hi, v + 1)
      case _                                        =>
    }
    pushed = accepted
    // everything accepted is enforced EXACTLY by the bounds — Spark need
    // not re-evaluate it (return only the rejected residual)
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SynthScan(rows, parts, lo, hi, required)
}

private[sources] case class SynthSlice(start: Long, end: Long, schema: StructType)
    extends InputPartition

private[sources] class SynthScan(rows: Long, parts: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def slices: Array[SynthSlice] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => (i * per, math.min((i + 1) * per, rows)))
      // partition pruning: a slice wholly outside the pushed bounds plans
      // no task at all
      .map { case (s, e) => (math.max(s, lo), math.min(e, hi)) }
      .filter { case (s, e) => s < e }
      .map { case (s, e) => SynthSlice(s, e, required) }
      .toArray
  }

  override def planInputPartitions(): Array[InputPartition] =
    slices.asInstanceOf[Array[InputPartition]]

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory

  // surfaced in explain output → PlanSpec pins pruning + pushdown
  override def description(): String =
    s"GraftSynthScan(rows=$rows, parts=$parts, bounds=[$lo,$hi), " +
      s"plannedParts=${slices.length}, cols=${required.fieldNames.mkString(",")})"
}

private[sources] class SynthReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[SynthSlice]
    new PartitionReader[InternalRow] {
      private var id = slice.start - 1
      // column pruning made real: one generator per REQUESTED field only
      private val gens: Array[Long => Any] = slice.schema.fieldNames.map {
        case "event_id"   => (i: Long) => i
        case "user_id"    => (i: Long) => i % 97
        case "event_type" => (i: Long) => SyntheticEvents.types((i % 5).toInt)
        case "cents"      => (i: Long) => i * 37 % 100000
        case other        => sys.error(s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id < slice.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
