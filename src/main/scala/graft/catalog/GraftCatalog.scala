package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{NoSuchPartitionException, NoSuchPartitionsException, NoSuchTableException, PartitionsAlreadyExistException}
import org.apache.spark.sql.functions._
import graft._
import graft.functions.Functions.{globMatch, sqlLit}

/** Partition listing result — the reference's `Partitions` namedtuple
  * (gluettalax.py:371): key names, per-column display widths (max value
  * length, seeded with the label length), and rows of values + location,
  * sorted by location. */
final case class PartitionListing(
    partitionKeys: Seq[String],
    maxLengths: Seq[Int],
    data: Seq[Seq[String]])

/** The engine's catalog & partition-metadata surface — the reference's
  * Layer A core (SURVEY.md §2 A1/A2, A9-A14) restated on `spark.catalog` +
  * Spark SQL DDL instead of the Glue API.
  *
  * Scale note: everything here is metadata-plane — catalog RPCs and
  * directory listings, never row data. The only DataFrame work is the A9
  * width aggregation, which runs on the (small) partition list.
  */
final class GraftCatalog(spark: SparkSession) {

  private def tableId(db: String, table: String) = TableIdentifier(table, Some(db))

  private def sessionCatalog = spark.sessionState.catalog

  /** A pattern is handed to the session catalog's own listing ONLY when
    * every non-`*` character is a regex-safe literal. The catalog dialect
    * (`StringUtils.filterPattern`) treats the pattern as a REGEX with
    * `*`→`.*`: any other metachar (`+` `(` `)` `{` `^` `$` `\` …) would
    * prune names the fnmatch contract keeps — e.g. `a+b*` as a regex
    * misses table `a+b_x` — and an INVALID regex silently yields an empty
    * listing; the residual filter can only prune, never restore (ADVICE
    * r6). Over-matching is safe (the residual fnmatch filter prunes the
    * extras), which is why `.` — any-char in regex, literal in fnmatch —
    * and the dialect's case-insensitivity are fine; under-matching is the
    * only unsafe direction. */
  private[graft] def catalogPushable(p: String): Boolean =
    p.forall(c => c.isLetterOrDigit || c == '_' || c == '*' || c == '.' || c == '-')

  /** A1/A2: all tables of all databases, optionally glob-filtered on the
    * table name (fnmatch dialect).
    *
    * Glob PUSHDOWN (SURVEY §4): when the pattern is expressible in the
    * catalog's listing dialect it is handed to `listTables(db, pattern)`,
    * so the catalog prunes DURING the scan — at warehouse scale that is
    * the difference between one filtered metastore call and paginating
    * every table name to the client (which is what the reference does,
    * gluettalax.py:654,678,742,799). The catalog dialect matches a
    * superset (it is case-insensitive), so the exact case-sensitive
    * fnmatch predicate always remains as a residual DataFrame filter —
    * pushdown prunes, the contract stays fnmatch. */
  def listTables(pattern: Option[String] = None): DataFrame = {
    import spark.implicits._
    val pat = pattern.filter(_.nonEmpty)
    val pushed = pat.filter(catalogPushable)
    val rows = sessionCatalog.listDatabases().flatMap { db =>
      val listed = pushed match {
        case Some(p) => sessionCatalog.listTables(db, p)
        case None => sessionCatalog.listTables(db)
      }
      listed.map(ti => (ti.database.getOrElse(db), ti.table))
    }
    val df = rows.toDF("database_name", "table_name")
    pat.map(p => df.filter(globMatch(col("table_name"), p)))
      .getOrElse(df)
      .orderBy("database_name", "table_name")
  }

  /** Table metadata or the reference's typed error
    * (gluettalax.py:379-381 → TableNotFound). */
  private def getTable(db: String, table: String) =
    try sessionCatalog.getTableMetadata(tableId(db, table))
    catch {
      case _: NoSuchTableException => throw TableNotFound(s"Table $table not found")
    }

  /** A9: list partitions with the width aggregate and sort-by-location
    * (gluettalax.py:374-395). */
  def listPartitions(db: String, table: String): PartitionListing = {
    val meta = getTable(db, table)
    val keys = meta.partitionColumnNames
    if (keys.isEmpty) return PartitionListing(Nil, Nil, Nil)
    val parts = sessionCatalog.listPartitions(tableId(db, table))
    val rows = parts.map { p =>
      keys.map(k => p.spec.getOrElse(k, "")) :+
        p.storage.locationUri.map(_.toString).getOrElse("-")
    }
    // the A9 dataflow: project values+location → max(length) per column
    // (seeded with label length) → sort by location
    val sorted = rows.sortBy(_.last)
    val lengths = keys.zipWithIndex.map { case (k, i) =>
      (k.length +: sorted.map(_(i).length)).max
    }
    PartitionListing(keys, lengths, sorted)
  }

  /** A10: the any-column-matches glob row filter (gluettalax.py:742). */
  def filterPartitions(listing: PartitionListing, pattern: Option[String]): Seq[Seq[String]] =
    pattern.filter(_.nonEmpty) match {
      case None => listing.data
      case Some(p) =>
        val re = ("^" + graft.functions.Functions.globToRegex(p) + "$").r
        listing.data.filter(row => row.exists(v => re.matches(v)))
    }

  /** A11: validate CLI partition kwargs against the table's partition keys;
    * returns values in key order (gluettalax.py:357-368). */
  def getPartitionValues(kargs: Map[String, String], partitionKeys: Seq[String]): Seq[String] = {
    if (kargs.size != partitionKeys.size)
      throw InvalidOption(
        s"${partitionKeys.size} partitions required (" +
          partitionKeys.map(k => s"--$k=XXX").mkString(" ") + ")")
    partitionKeys.map(k =>
      kargs.getOrElse(k, throw InvalidOption(s"missing --$k argument")))
  }

  /** A12: add one partition. Location defaults to the table location plus
    * either the Hive-style `k1=v1/k2=v2/` path or — when every key is named
    * `partition_*` — the positional `v1/v2/` dialect (gluettalax.py:460-469,
    * trailing-slash handling per changelog.txt:83-89). AlreadyExists
    * surfaces as the exit-0 warning. */
  def addPartition(db: String, table: String, kargs: Map[String, String],
      location: Option[String] = None): Unit = {
    val meta = getTable(db, table)
    val keys = meta.partitionColumnNames
    val values = getPartitionValues(kargs, keys)
    val loc = location.getOrElse {
      val tableLocation0 = meta.location.toString
      val tableLocation =
        if (tableLocation0.endsWith("/")) tableLocation0 else tableLocation0 + "/"
      val path =
        if (kargs.keys.forall(_.startsWith("partition_")))
          values.mkString("/") + "/" // non-Hive positional dialect
        else
          keys.map(k => s"$k=${kargs(k)}").mkString("/") + "/"
      tableLocation + path
    }
    val spec = keys.zip(values)
      .map { case (k, v) => s"`$k`='${sqlLit(v)}'" }.mkString(", ")
    try spark.sql(
      s"ALTER TABLE `$db`.`$table` ADD PARTITION ($spec) LOCATION '${sqlLit(loc)}'")
    catch {
      case _: PartitionsAlreadyExistException =>
        throw PartitionAlreadyExists(s"Partition [${values.mkString(", ")}] already exists")
    }
  }

  /** A14: drop one partition; missing → typed error (gluettalax.py:485-497). */
  def deletePartition(db: String, table: String, kargs: Map[String, String]): Unit = {
    val meta = getTable(db, table)
    val keys = meta.partitionColumnNames
    val values = getPartitionValues(kargs, keys)
    val spec = keys.zip(values)
      .map { case (k, v) => s"`$k`='${sqlLit(v)}'" }.mkString(", ")
    try spark.sql(s"ALTER TABLE `$db`.`$table` DROP PARTITION ($spec)")
    catch {
      case _: NoSuchPartitionException | _: NoSuchPartitionsException =>
        throw PartitionNotFound(s"Partition [${values.mkString(", ")}] not found")
    }
  }

  /** Per-directory outcome of bulk discovery. */
  sealed trait DiscoveryOutcome
  case object Added extends DiscoveryOutcome
  case object AlreadyExists extends DiscoveryOutcome
  case object Skipped extends DiscoveryOutcome

  /** A13: bulk partition discovery from a directory layout
    * (gluettalax.py:398-441): list files under the prefix → distinct sorted
    * dirnames → anchor on the first `<key0>=` segment → parse `k=v` pairs
    * positionally → SKIP malformed dirs (per-dir skip-and-continue, fixing
    * the reference's crash-on-no-match, SURVEY §7 known-hard (e)) → create
    * each partition, tolerating already-exists per dir.
    *
    * ≈ `MSCK REPAIR TABLE`, but with the reference's exact semantics and a
    * per-directory outcome report. */
  def addPartitionsByLocation(db: String, table: String, location: String)
      : Seq[(String, DiscoveryOutcome)] = {
    val meta = getTable(db, table)
    val keys = meta.partitionColumnNames
    val hadoopPath = new Path(location)
    val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(hadoopPath, true)
    while (it.hasNext) files += it.next().getPath.toString
    val dirs = files.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.sorted
    dirs.toSeq.map { dir =>
      val parts = dir.split('/')
      val anchored = parts.indexWhere(_.startsWith(keys.head + "="))
      if (anchored < 0) dir -> Skipped
      else {
        val segs = parts.drop(anchored)
        val values = keys.zipWithIndex.flatMap { case (k, i) =>
          if (i < segs.length && segs(i).startsWith(k + "="))
            Some(k -> segs(i).split("=", 2)(1))
          else None
        }
        if (values.size != keys.size) dir -> Skipped
        else {
          try {
            addPartition(db, table, values.toMap, Some(dir + "/"))
            dir -> Added
          } catch {
            case _: PartitionAlreadyExists => dir -> AlreadyExists
          }
        }
      }
    }
  }
}
