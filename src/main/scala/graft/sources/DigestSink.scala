package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 surface ([[SyntheticEvents]] is the
  * read half): a digest sink that runs the full distributed commit
  * protocol — each task's [[DataWriter]] folds its partition into a
  * (count, digest) pair, ships it as a [[WriterCommitMessage]], and the
  * driver-side [[BatchWrite.commit]] combines messages into the table's
  * committed state. That message path is exactly how a real connector
  * achieves atomic visibility (nothing is observable until commit), and
  * it is the ONLY cross-JVM channel used — the sink works identically on
  * a 1000-executor cluster.
  *
  * The digest is order-independent (a SUM of per-row md5 prefixes,
  * 40 bits each so 2^23 rows fit a long without overflow) and exactly
  * reproducible in SQL, so the committed state is oracle-CHECKED, not
  * just asserted non-empty: the checksum a data-movement job publishes
  * for reconciliation (q109's Merkle idea, at the write barrier).
  */
class DigestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema always arrives from the frame
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DigestTable(schema, properties.getOrDefault("runId", "default"))
}

object DigestSink {
  /** Committed state per runId — populated ONLY by BatchWrite.commit. */
  val committed = new scala.collection.concurrent.TrieMap[String, (Long, Long)]

  /** STREAMING commit ledger: per (runId, epochId) → (count, digest).
    * `commit(epochId, …)` REPLACES the epoch's entry — a redelivered
    * epoch (driver retry after a sink-side success) lands on the same
    * key with the same fold, which is exactly how an epoch-keyed sink
    * turns at-least-once delivery into an exactly-once EFFECT (st30;
    * the contract st24 proved with an external dedup key, now native
    * to the connector). */
  val epochs = new scala.collection.concurrent.TrieMap[String, Map[Long, (Long, Long)]]

  private[sources] def rowDigest(schema: StructType, row: InternalRow): Long = {
    val canonical = schema.fields.indices.map { i =>
      schema.fields(i).dataType match {
        case LongType   => row.getLong(i).toString
        case StringType => row.getUTF8String(i).toString
        case other      => sys.error(s"DigestSink: unsupported type $other")
      }
    }.mkString("|")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    // first 10 hex chars = 40 bits — matches CAST('0x'||substr(md5(x),1,10) ...)
    md5.take(5).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xff))
  }
}

private[sources] class DigestTable(schema: StructType, runId: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_digest_sink($runId)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new DigestWrite(info.schema(), runId)
    }
}

private[sources] case class DigestMsg(count: Long, digest: Long)
    extends WriterCommitMessage

private[sources] class DigestWrite(schema: StructType, runId: String)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = new DigestStreamingWrite(schema, runId)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DigestWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val folded = messages.foldLeft((0L, 0L)) { case ((c, d), m: DigestMsg) =>
      (c + m.count, d + m.digest)
    }
    DigestSink.committed.put(runId, folded)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class DigestStreamingWrite(schema: StructType, runId: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new DigestStreamingWriterFactory(schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val folded = messages.foldLeft((0L, 0L)) { case ((c, d), m: DigestMsg) =>
      (c + m.count, d + m.digest)
    }
    // epoch-keyed PUT: a retried epoch replaces itself — idempotent effect
    DigestSink.epochs.synchronized {
      val cur = DigestSink.epochs.getOrElse(runId, Map.empty)
      DigestSink.epochs.put(runId, cur.updated(epochId, folded))
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class DigestStreamingWriterFactory(schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DigestWriterFactory(schema).createWriter(partitionId, taskId)
}

private[sources] class DigestWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var count = 0L
      private var digest = 0L
      override def write(row: InternalRow): Unit = {
        count += 1
        digest += DigestSink.rowDigest(schema, row)
      }
      override def commit(): WriterCommitMessage = DigestMsg(count, digest)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** Test probe: the streaming commit path exercised directly (the epoch
  * redelivery case can't be forced through a healthy local replay). */
object DigestMsgProbe {
  def msg(count: Long, digest: Long): WriterCommitMessage = DigestMsg(count, digest)
  def streamingWrite(runId: String): StreamingWrite =
    new DigestStreamingWrite(new StructType(), runId)
}
