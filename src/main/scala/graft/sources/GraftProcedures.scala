package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** STORED PROCEDURES (`CALL catalog.system.proc(...)`) — the table-
  * maintenance surface every production lakehouse ships (Iceberg's
  * `rollback_to_snapshot` / `expire_snapshots`, Delta's `RESTORE` /
  * `VACUUM`), exposed through Spark's native
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]] contract:
  * the analyzer resolves `CALL` against [[GraftSparkCatalog]], binds the
  * argument row to the declared [[ProcedureParameter]]s (by position or
  * name, with Spark-side type checking), executes
  * [[BoundProcedure.call]], and materializes the returned [[LocalScan]]
  * as the statement's result set. `SHOW PROCEDURES` / `DESCRIBE
  * PROCEDURE` ride `listProcedures` / `loadProcedure` + `description`.
  *
  * Two procedures, both real mutations of the snapshot store, not
  * listings (the reference's closest analog is the catalog-mutating half
  * of its CLI — add_partition/del_partition, gluettalax.py:460-473 —
  * which q287 already exposes as DDL; procedures cover the maintenance
  * verbs DDL has no syntax for):
  *
  *  - `restore(table, version)` — Delta `RESTORE TABLE … TO VERSION AS
  *    OF` / Iceberg `rollback_to_snapshot`: republishes the retained
  *    snapshot's rows AS A NEW COMMIT (version-continuous, so the
  *    pre-restore head stays time-travelable and a streaming reader sees
  *    a new version rather than a rewound one).
  *  - `expire_history(table, keep)` — Iceberg `expire_snapshots`:
  *    prunes retained history to the newest `keep` versions (serving
  *    snapshot untouched), releasing both process memory and the durable
  *    version directories; `VERSION AS OF` an expired version then
  *    refuses with the valid range.
  *
  * Procedures execute DRIVER-SIDE at statement time against the same
  * synchronized publish path as every other commit — at 100 TB these are
  * metadata/log operations (Delta's RESTORE writes one commit referencing
  * existing files; the harness analog republishes existing row vectors by
  * reference, copying nothing).
  */
private[sources] object GraftProcedures {
  val names: Array[String] = Array("restore", "expire_history")

  def load(catalogName: String, ident: Identifier): UnboundProcedure =
    (ident.namespace().toSeq, ident.name().toLowerCase) match {
      case (Seq("system"), "restore")        => new RestoreProcedure(catalogName)
      case (Seq("system"), "expire_history") => new ExpireHistoryProcedure(catalogName)
      case _ =>
        throw new RuntimeException(
          s"graft catalog: procedure ${(ident.namespace() :+ ident.name()).mkString(".")} " +
            s"not found (available: system.{${names.mkString(", ")}})")
    }

  /** `table` procedure args are `ns.name` relative to the owning catalog. */
  private def keyOf(catalogName: String, tableRef: String): String =
    (Seq("cat", catalogName) ++ tableRef.split('.').toSeq).mkString("!")

  private def result(schema: StructType, row: Seq[Any]): util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(InternalRow.fromSeq(row.map {
        case s: String => UTF8String.fromString(s)
        case v         => v
      }))
      override def readSchema(): StructType = schema
      override def description(): String = s"GraftProcedureResult(${schema.fieldNames.mkString(",")})"
    }
    util.Arrays.asList(scan).iterator()
  }

  private final class RestoreProcedure(catalogName: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "restore(table STRING, version BIGINT): republish the retained snapshot " +
        "at `version` as a new commit (Delta RESTORE / Iceberg rollback_to_snapshot)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false // mutates and stamps a commit
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("version", LongType).build())

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val tableRef = input.getUTF8String(0).toString
      val version = input.getLong(1)
      val key = keyOf(catalogName, tableRef)
      DurableSpill.ensureLoaded(key)
      MemTable.store.synchronized {
        val cur = MemTable.store.getOrElse(key,
          throw new IllegalArgumentException(
            s"graft catalog: restore: no such table '$tableRef'"))
        val snap = MemTable.history.getOrElse((key, version),
          throw new IllegalArgumentException(
            s"graft catalog: restore: version $version of '$tableRef' is not " +
              s"retained (retained: ${MemTable.history.keys.collect {
                case (`key`, v) => v }.toSeq.sorted.mkString(",")})"))
        // version-CONTINUOUS: the restore is itself a commit — the
        // pre-restore head remains in history (time travel / streaming
        // readers see a new version, never a rewound counter)
        MemTable.publish(key,
          MemTable.Snapshot(snap.schema, snap.parts, cur.version + 1))
        result(
          new StructType().add("table", StringType).add("restored_version", LongType)
            .add("new_version", LongType).add("n_rows", LongType),
          Seq(tableRef, version, cur.version + 1,
            snap.parts.valuesIterator.map(_.size.toLong).sum))
      }
    }
  }

  private final class ExpireHistoryProcedure(catalogName: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = "expire_history"
    override def description(): String =
      "expire_history(table STRING, keep BIGINT): prune retained version " +
        "history to the newest `keep` versions (Iceberg expire_snapshots); " +
        "the serving snapshot is untouched"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("keep", LongType).build())

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val tableRef = input.getUTF8String(0).toString
      val keep = input.getLong(1)
      require(keep >= 1,
        s"graft catalog: expire_history: keep must be >= 1 (got $keep)")
      val key = keyOf(catalogName, tableRef)
      DurableSpill.ensureLoaded(key)
      MemTable.store.synchronized {
        val cur = MemTable.store.getOrElse(key,
          throw new IllegalArgumentException(
            s"graft catalog: expire_history: no such table '$tableRef'"))
        val retained = MemTable.history.keys.collect { case (`key`, v) => v }.toSeq.sorted
        // newest `keep` versions survive, anchored at the SERVING version
        // (never expire the current snapshot out from under readers)
        val cutoff = cur.version - keep + 1
        val dropped = retained.filter(_ < cutoff)
        dropped.foreach(v => MemTable.history.remove((key, v)))
        DurableSpill.onExpire(key, dropped, cur.version)
        result(
          new StructType().add("table", StringType).add("removed", LongType)
            .add("earliest_retained", LongType),
          Seq(tableRef, dropped.size.toLong,
            retained.filter(_ >= cutoff).headOption.getOrElse(cur.version)))
      }
    }
  }
}
