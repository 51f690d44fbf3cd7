package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataTypes, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.VersionedTable

/** The commit protocol as a Spark SQL CATALOG — versioned tables
  * addressable by NAME in plain SQL, including the time-travel syntax
  * every production format exposes:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graftcat.root", "/warehouse")
  *   spark.sql("SELECT * FROM graftcat.docs")                    // latest
  *   spark.sql("SELECT * FROM graftcat.docs VERSION AS OF 3")    // commit 3
  *   spark.sql("SELECT * FROM graftcat.docs TIMESTAMP AS OF '…'")// by time
  * }}}
  *
  * A catalog table is one directory under `root` (one versioned table
  * per subdirectory, resolved lazily — listTables lists committed
  * tables only). Every load serves the SAME [[GraftTable]] the
  * `graft-table` connector builds, so SQL reads get the full skipping
  * stack with NO options: the stats column comes from the manifest's
  * own STATSCOL declaration, blooms and partition values are
  * self-describing, and deletion vectors apply inside the scan.
  * `VERSION AS OF` maps to the commit version (TableCatalog's
  * string-version load); `TIMESTAMP AS OF` resolves to the NEWEST
  * commit published at-or-before the timestamp (manifest link mtime —
  * the snapshot-at-time semantics of Delta/Iceberg).
  *
  * Read-only by design, like every surface over the protocol: DDL and
  * DML route through `commit`/`appendCommit`/`mergeCommit`/`transact`
  * — the atomic putIfAbsent publish is the consistency story, and a
  * catalog write path would bypass it.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var root: java.nio.file.Path = _

  /** SQL STORED PROCEDURES (r13) — the table-maintenance verbs as
    * plain `CALL` statements (Spark 4's ProcedureCatalog, the
    * Iceberg-procedures shape), so an operator runs the protocol's
    * lifecycle without touching the library API:
    * {{{
    *   CALL graftcat.compact('docs')              -- fold DVs/mappings,
    *                                              -- keep constraints
    *   CALL graftcat.compact('docs', 'doc_id', 8) -- re-cluster + stats
    *   CALL graftcat.expire('docs', 2)            -- vacuum below v2
    *   CALL graftcat.tag('docs', 'release', 3)    -- immutable pin
    * }}}
    * Each returns its witness rows (key, value) — published version,
    * files deleted, … — through a LocalScan, so the CALL's result is
    * inspectable in SQL like any query. DML-class refusals (branched
    * tables, tag re-creation) surface as the procedure's error. */
  private def tableAt(name: String): java.nio.file.Path = {
    val p = root.resolve(name)
    if (VersionedTable.latestVersion(p).isEmpty)
      throw new NoSuchTableException(Identifier.of(Array.empty, name))
    p
  }

  private def proc(pname: String, doc: String,
                   ps: Seq[ProcedureParameter],
                   run: InternalRow => Seq[(String, Long)]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = pname
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = ps.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val out = run(input)
        java.util.Collections.singletonList(new LocalScan {
          override def readSchema(): StructType = StructType(Seq(
            StructField("key", DataTypes.StringType, nullable = false),
            StructField("value", DataTypes.LongType, nullable = false)))
          override def rows(): Array[InternalRow] = out.map { case (k, v) =>
            InternalRow(UTF8String.fromString(k), java.lang.Long.valueOf(v))
          }.toArray
          override def description(): String = s"graft-procedure $pname"
        }: Scan).iterator()
      }
    }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Array("compact", "expire", "tag", "branch", "promote",
      "update_where", "constrain", "rename_column", "widen_column")
      .map(Identifier.of(Array.empty, _))
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (ident.namespace.nonEmpty)
      throw new RuntimeException(s"unknown procedure $ident")
    ident.name match {
      case "compact" => proc("compact",
        "Fold deletion vectors and schema mappings into right-sized " +
          "current-schema files; recompute stats/ROWS; carry CHECK " +
          "constraints. compact(table, stats_col => NULL, files => 4)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("stats_col", DataTypes.StringType)
            .defaultValue("NULL").build(),
          ProcedureParameter.in("files", DataTypes.IntegerType)
            .defaultValue("4").build()),
        { in =>
          val t = tableAt(in.getUTF8String(0).toString)
          val statsCol =
            if (in.isNullAt(1)) None else Some(in.getUTF8String(1).toString)
          val v = VersionedTable.compactCommit(
            org.apache.spark.sql.SparkSession.active, t, statsCol,
            in.getInt(2))
          Seq("version" -> v,
            "files" -> VersionedTable.statsManifest(t, v).size.toLong)
        })
      case "expire" => proc("expire",
        "Expire versions below keep_from and vacuum unreferenced files " +
          "(ref heads, BASE chains and DV origins stay pinned). " +
          "expire(table, keep_from)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("keep_from", DataTypes.LongType).build()),
        { in =>
          val (deleted, expired) = VersionedTable.expire(
            tableAt(in.getUTF8String(0).toString), in.getLong(1))
          Seq("files_deleted" -> deleted.toLong,
            "versions_expired" -> expired.toLong)
        })
      case "tag" => proc("tag",
        "Create an immutable named pin at a committed version. " +
          "tag(table, name, version)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("name", DataTypes.StringType).build(),
          ProcedureParameter.in("version", DataTypes.LongType).build()),
        { in =>
          val t = tableAt(in.getUTF8String(0).toString)
          VersionedTable.tagCreate(t, in.getUTF8String(1).toString,
            in.getLong(2))
          Seq("version" -> in.getLong(2))
        })
      case "branch" => proc("branch",
        "Fork a zero-copy branch at a committed version. " +
          "branch(table, name, version)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("name", DataTypes.StringType).build(),
          ProcedureParameter.in("version", DataTypes.LongType).build()),
        { in =>
          val t = tableAt(in.getUTF8String(0).toString)
          VersionedTable.branchCreate(t, in.getUTF8String(1).toString,
            in.getLong(2))
          Seq("version" -> in.getLong(2))
        })
      case "promote" => proc("promote",
        "Fast-forward an append-only branch's additions into another " +
          "branch as one metadata commit. promote(table, from, into)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("from", DataTypes.StringType).build(),
          ProcedureParameter.in("into", DataTypes.StringType).build()),
        { in =>
          val c = VersionedTable.promoteBranch(
            org.apache.spark.sql.SparkSession.active,
            tableAt(in.getUTF8String(0).toString),
            in.getUTF8String(1).toString, in.getUTF8String(2).toString)
          Seq("version" -> c.version, "conflicts" -> c.conflicts.toLong)
        })
      case "update_where" => proc("update_where",
        "Stats-pruned copy-on-write UPDATE: rewrite only the files " +
          "whose zonemap overlaps [lo, hi] on the stats column, " +
          "applying `SET col = expr` to matching rows. " +
          "update_where(table, stats_col, lo, hi, col, expr)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("stats_col", DataTypes.StringType).build(),
          ProcedureParameter.in("lo", DataTypes.LongType).build(),
          ProcedureParameter.in("hi", DataTypes.LongType).build(),
          ProcedureParameter.in("col", DataTypes.StringType).build(),
          ProcedureParameter.in("expr", DataTypes.StringType).build()),
        { in =>
          val (v, rewritten, total) = VersionedTable.updateWhere(
            org.apache.spark.sql.SparkSession.active,
            tableAt(in.getUTF8String(0).toString),
            in.getUTF8String(1).toString, in.getLong(2), in.getLong(3),
            Seq(in.getUTF8String(4).toString -> in.getUTF8String(5).toString))
          Seq("version" -> v, "files_rewritten" -> rewritten.toLong,
            "files_total" -> total.toLong)
        })
      case "constrain" => proc("constrain",
        "Declare a CHECK constraint (validates the current snapshot " +
          "first; every later row-adding commit validates its batch). " +
          "constrain(table, expr)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("expr", DataTypes.StringType).build()),
        { in =>
          val t = tableAt(in.getUTF8String(0).toString)
          val v = VersionedTable.latestVersion(t).get + 1
          VersionedTable.constraintCommit(
            org.apache.spark.sql.SparkSession.active, t,
            v, in.getUTF8String(1).toString)
          Seq("version" -> v)
        })
      case "rename_column" => proc("rename_column",
        "Metadata-only column rename (no data rewritten; time travel " +
          "below it sees the old name). rename_column(table, from, to)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("from", DataTypes.StringType).build(),
          ProcedureParameter.in("to", DataTypes.StringType).build()),
        { in =>
          val t = tableAt(in.getUTF8String(0).toString)
          val v = VersionedTable.latestVersion(t).get + 1
          VersionedTable.renameCommit(t, v, in.getUTF8String(1).toString,
            in.getUTF8String(2).toString)
          Seq("version" -> v)
        })
      case "widen_column" => proc("widen_column",
        "Metadata-only type widening (e.g. int -> bigint; readers cast " +
          "narrow files at plan time). widen_column(table, col, type)",
        Seq(ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("col", DataTypes.StringType).build(),
          ProcedureParameter.in("type", DataTypes.StringType).build()),
        { in =>
          val t = tableAt(in.getUTF8String(0).toString)
          val v = VersionedTable.latestVersion(t).get + 1
          VersionedTable.widenCommit(t, v, in.getUTF8String(1).toString,
            in.getUTF8String(2).toString)
          Seq("version" -> v)
        })
      case other =>
        throw new RuntimeException(
          s"graft catalog '$catalogName': unknown procedure '$other' " +
            "(available: compact, expire, tag, branch, promote, " +
            "update_where, constrain, rename_column, widen_column)")
    }
  }

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null && r.nonEmpty,
      s"graft catalog '$name': set spark.sql.catalog.$name.root to a " +
        "directory holding versioned tables (one per subdirectory)")
    root = Paths.get(r)
  }

  override def name(): String = catalogName

  private def tableRoot(ident: Identifier): java.nio.file.Path = {
    if (ident.namespace.nonEmpty)
      throw new NoSuchTableException(ident)
    root.resolve(ident.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty &&
      VersionedTable.latestVersion(tableRoot(ident)).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    if (!Files.isDirectory(root)) Array.empty
    else {
      val stream = Files.list(root)
      try stream.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          VersionedTable.latestVersion(p).isDefined)
        .map(p => Identifier.of(Array.empty, p.getFileName.toString))
        .toArray
      finally stream.close()
    }
  }

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val p = tableRoot(ident)
    if (VersionedTable.latestVersion(p).isEmpty)
      throw new NoSuchTableException(ident)
    val path = p.toString
    val v = GraftTableSource.resolveVersion(path, version)
    new GraftTable(path, GraftTableSource.dataSchema(path, v), v,
      VersionedTable.statsColumns(p, v).headOption)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` — a number is the commit version; a string is
    * a NAMED REF (branch head or tag pin), the Iceberg convention:
    * `VERSION AS OF 'exp'` reads the exp branch's head snapshot,
    * `VERSION AS OF 'release'` the tagged one. An unknown ref (or a
    * name the ref grammar refuses) is an unknown table version. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(try version.toLong catch {
      case _: NumberFormatException =>
        (try VersionedTable.refHead(tableRoot(ident), version)
         catch { case _: IllegalArgumentException => None }) match {
          case Some((_, v)) => v
          case None => throw new NoSuchTableException(ident)
        }
    }))

  /** `TIMESTAMP AS OF <t>` — Spark hands epoch MICROS; serve the
    * newest commit published at-or-before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tableRoot(ident)
    if (VersionedTable.latestVersion(p).isEmpty)
      throw new NoSuchTableException(ident)
    val at = VersionedTable.versionTimes(p)
      .filter { case (_, ms) => ms * 1000L <= timestamp }
      .lastOption.getOrElse(throw new NoSuchTableException(ident))._1
    load(ident, Some(at))
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog '$catalogName' is read-only: $op routes through " +
        "the commit protocol (VersionedTable.commit/appendCommit/" +
        "mergeCommit/transact)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
