package graft.sources

import java.util
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real Spark [[TableCatalog]] plugin over the [[MemTable]] snapshot
  * store — the engine-side answer to the reference's ENTIRE domain: where
  * `gluettalax.py` fronts a metastore with a CLI (list_tables,
  * add_partition — SURVEY Layer A), this catalog fronts the same concepts
  * through Spark's native V2 catalog API, so plain SQL with three-part
  * identifiers (`SELECT ... FROM graft_cat.ns.t`) resolves through
  * catalog → table → scan with partition and column pruning intact, and
  * `PARTITIONED BY` clauses flow into the connector's partition column.
  *
  * Registration is a session conf
  * (`spark.sql.catalog.graft_cat = graft.sources.GraftSparkCatalog`);
  * Spark instantiates and caches the catalog on first resolution. Tables
  * live in the same process-wide store the DSv2 entries use (q143/q189),
  * keyed `cat!<catalog>!<ns...>!<name>` — one source of truth for both
  * access paths, which is exactly the property a catalog exists to give.
  */
class GraftSparkCatalog extends TableCatalog {
  private var catalogName: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (Seq("cat", catalogName) ++ ident.namespace().toSeq :+ ident.name())
      .mkString("!")
  /** partition column registered at create time — process-wide alongside
    * [[MemTable.store]], NOT instance state: Spark may instantiate the
    * catalog more than once (new session, catalog re-resolution), and an
    * instance-scoped map would reload existing tables with partCol "",
    * silently losing partition pruning and KeyGroupedPartitioning for
    * tables created by another instance. */
  private def partCols = GraftSparkCatalog.partCols

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = (Seq("cat", catalogName) ++ namespace.toSeq).mkString("!") + "!"
    MemTable.store.keys.toArray.sorted.collect {
      case k if k.startsWith(prefix) && !k.stripPrefix(prefix).contains("!") =>
        Identifier.of(namespace, k.stripPrefix(prefix))
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    MemTable.store.get(k) match {
      case Some(snap) =>
        new MemTableImpl(snap.schema, k, partCols.getOrElse(k, ""))
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** SQL TIME TRAVEL — `SELECT … FROM t VERSION AS OF n` routes here
    * (Spark's RelationTimeTravel resolution): resolve the requested
    * version against the snapshot history and serve a table pinned to
    * that immutable snapshot. The pinned snapshot is republished under a
    * version-suffixed runId (`<key>!@v<n>`) so the ordinary scan path
    * (pruning, pushdown, KeyGroupedPartitioning) serves it unchanged —
    * idempotent, since snapshots are immutable once published. A missing
    * version (expired past [[MemTable.historyDepth]], never committed, or
    * non-numeric) errors cleanly instead of serving the wrong snapshot. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val k = key(ident)
    if (!MemTable.store.contains(k)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft catalog: VERSION AS OF expects a numeric snapshot version, got '$version'")
    }
    MemTable.history.get((k, v)) match {
      case Some(snap) =>
        val pinned = s"$k!@v$v"
        MemTable.store.put(pinned, snap)
        new MemTableImpl(snap.schema, pinned, partCols.getOrElse(k, ""))
      case None =>
        throw new IllegalArgumentException(
          s"graft catalog: no snapshot version $v for ${ident.name()} " +
            s"(retained: ${MemTable.history.keys.collect { case (`k`, ver) => ver }.toSeq.sorted.mkString(",")})")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val k = key(ident)
    if (MemTable.store.contains(k)) throw new TableAlreadyExistsException(ident)
    val pc = partitions.headOption
      .map(_.references().head.fieldNames().head).getOrElse("")
    partCols.put(k, pc)
    MemTable.publish(k, MemTable.Snapshot(schema, Map.empty, 0L))
    new MemTableImpl(schema, k, pc)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog: ALTER not supported")

  override def dropTable(ident: Identifier): Boolean = {
    partCols.remove(key(ident))
    MemTable.store.remove(key(ident)).isDefined
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog: RENAME not supported")

  override def tableExists(ident: Identifier): Boolean =
    MemTable.store.contains(key(ident))
}

object GraftSparkCatalog {
  /** table key → partition column, shared by every catalog instance in
    * the process (same lifetime as the snapshot store it annotates). */
  val partCols = new scala.collection.concurrent.TrieMap[String, String]
}
