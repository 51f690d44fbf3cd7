package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-table commit protocol — the manifest/commit-log
  * layer (the Delta/Iceberg core idea, re-derived from first
  * principles) that gives the CDC/compaction/backfill family ATOMIC
  * version swap, snapshot isolation, and time-travel reads.
  *
  * Layout under a table root:
  * {{{
  *   data/v<version>-<slug>/part-*.parquet   one dir of NEW files per commit
  *   _commits/v<%06d version>.manifest       one line per data file (relative)
  *   _commits/.tmp-*                         in-flight, invisible to readers
  * }}}
  *
  * The COMMIT POINT is a single atomic link of the finished manifest
  * into `_commits/` — data files are written first and mean nothing
  * until a manifest names them, so a crash mid-commit (or mid-write)
  * leaves garbage data files but a perfectly readable previous
  * version: readers only ever see the set of fully-published manifests.
  * Because the final name encodes the version, two racing committers
  * of version N cannot both succeed — the second link fails on the
  * existing target (optimistic concurrency, the conditional-PUT/
  * putIfAbsent primitive object stores expose for exactly this).
  *
  * A manifest lists FILES, not data: a commit's cost is O(files it
  * writes + one tiny metadata rename), never O(table). An append
  * commit carries the previous version's file list forward verbatim
  * and adds its new files (no data movement); a copy-on-write MERGE
  * rewrites only what it must and lists the result. Reads plan over
  * exactly the listed files — time travel at version N is just
  * resolving manifest N instead of max.
  *
  * Local-filesystem realization of the primitives: an atomic
  * java.nio createLink as the conditional put (same deployment note as
  * GraftSession.stagingDir — a real cluster points SPARK_GRAFT_STAGING
  * at a shared mount; an object-store port swaps these few lines for
  * conditional PUTs, the protocol is unchanged).
  *
  * Metadata scaling (r13): a manifest may be a DELTA — first line
  * `BASE\t<version>`, remaining lines the versions's ADDED entries —
  * so an append/delete commit's metadata cost is O(the commit), never
  * O(table). Readers resolve the chain (base's lines ++ delta lines);
  * every `checkpointEvery`-th delta materializes the full list instead
  * (the Delta-log "JSON deltas + periodic checkpoint" shape, Iceberg's
  * manifest-list idea flattened to one dimension), so chain length —
  * and therefore resolution cost — is bounded by a constant. The
  * commit point, snapshot isolation, and time travel are unchanged:
  * a delta still publishes through the same atomic link. Resolution
  * is still driver-side text parsing — O(live files) per read, which
  * with right-sized 128 MB–1 GB files covers a 100 TB table; past
  * 10⁶ files real formats read the metadata itself as a distributed
  * job (HistorySource already does, one partition per version).
  */
object VersionedTable {

  private def commitsDir(table: Path): Path = table.resolve("_commits")

  private def manifestName(version: Long): String =
    f"v$version%06d.manifest"

  private val ManifestRe = """v(\d{6})\.manifest""".r

  /** List the parquet part files under a freshly-written output dir —
    * RECURSIVE (a partitioned V2 write nests `col=value` dirs; flat
    * dirs walk identically) — as table-root-relative strings (sorted:
    * the manifest is a stable artifact, not an enumeration-order
    * accident). */
  private def partFiles(table: Path, dataDir: Path): Seq[String] = {
    val walk = Files.walk(dataDir)
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => table.relativize(p).toString)
      .toSeq.sorted
    finally walk.close()
  }

  /** Write `df` as version `version`'s new files and atomically
    * publish the manifest = carried ++ new. Returns the published
    * file list. `carried` is relative paths from a previous manifest
    * that remain live in this version (append/partial-rewrite
    * commits); pass Nil for a full copy-on-write snapshot.
    *
    * Branched tables refuse (r15, like every version-pinned variant):
    * a raw commit's CHECK carry derives from the globally closest
    * prior snapshot, which on an interleaved log may belong to
    * ANOTHER branch — enforcing (and injecting) a foreign line of
    * history's contract. Write through [[branchCommit]] instead; the
    * ref-free escape hatch is raw [[publish]] of hand-built lines. */
  /** Commit-time INT96 refusal (r20): the graft footer reader refuses
    * INT96 timestamps, but a session NOT built through
    * `GraftSession.configure` keeps Spark's INT96 parquet default — a
    * library commit from it would successfully publish a version that
    * every subsequent graft-table read then refuses. Validate BEFORE
    * the version's bytes hit disk, so the refusal lands before the
    * publish instead of after it. (No per-write parquet option exists
    * for outputTimestampType — session conf is the only lever, so the
    * honest move is to refuse, not to silently mutate the caller's
    * session mid-commit.) */
  private[graft] def ensureMicrosTimestamps(df: DataFrame): Unit = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType,
      StructType, TimestampType}
    def hasTs(dt: DataType): Boolean = dt match {
      case TimestampType => true
      case st: StructType => st.fields.exists(f => hasTs(f.dataType))
      case a: ArrayType => hasTs(a.elementType)
      case m: MapType => hasTs(m.keyType) || hasTs(m.valueType)
      case _ => false
    }
    if (df.schema.fields.exists(f => hasTs(f.dataType)) &&
        df.sparkSession.conf
          .get("spark.sql.parquet.outputTimestampType") == "INT96")
      throw new IllegalStateException(
        "graft commit: spark.sql.parquet.outputTimestampType=INT96 " +
          "would publish TIMESTAMP data files the graft footer reader " +
          "refuses — set TIMESTAMP_MICROS (GraftSession.configure " +
          "does) before committing timestamp columns")
  }

  /** Every commit's data/DV parquet write funnels here so the INT96
    * refusal cannot be bypassed by a new commit variant. */
  private def writeData(df: DataFrame, dir: Path,
                        partCols: Seq[String] = Nil): Unit = {
    ensureMicrosTimestamps(df)
    if (partCols.isEmpty) df.write.parquet(dir.toString)
    else df.write.partitionBy(partCols: _*).parquet(dir.toString)
  }

  def commit(s: SparkSession, table: Path, version: Long,
             df: DataFrame, carried: Seq[String] = Nil): Seq[String] = {
    refuseBranched(table, "commit")
    val dataDir = newDataDir(table, version)
    writeData(df, dataDir)
    val files = carried ++ partFiles(table, dataDir)
    publish(table, version,
      files ++ carryChecks(s, table, version, dataDir, carried, "commit"))
    files
  }

  /** CHECK lines a full-manifest writer at `version` must CARRY from
    * the closest committed ancestor (r14 — a declared table contract
    * must survive every rewrite, not just [[compactCommit]]'s), minus
    * any the caller's `carried` lines already restate; the new files
    * under `dataDir` are validated against them first, so the rewrite
    * cannot be the path that smuggles a violation in. Nil when no
    * ancestor or no constraint exists — the common case pays one
    * directory listing plus one raw-chain CHECK scan (O(chain) tiny
    * metadata reads, bounded by the checkpoint cadence; the full
    * file-list splice is NOT paid — see [[checkConstraints]]).
    * Callers are branch-guarded (see [[commit]]), so "closest prior"
    * is always this line of history. */
  private def carryChecks(s: SparkSession, table: Path, version: Long,
                          dataDir: Path, carried: Seq[String],
                          what: String): Seq[String] = {
    val prior = versions(table).filter(_ < version).lastOption
    val cs = prior.map(checkConstraints(table, _)).getOrElse(Nil)
    if (cs.isEmpty) Nil
    else {
      enforceConstraints(s, table, dataDir, prior, what)
      cs.map(CheckPrefix + _).filterNot(carried.contains)
    }
  }

  /** Manifest lines for freshly-staged files under `dataDir`, matching
    * the INDEX SHAPE of the base manifest (r15 — ingest must not
    * degrade pruning until the next compaction): stats-bearing data
    * lines when the base declares STATSCOL, ROWS lines when the base
    * records them, BLOOM and secondary-zonemap lines recomputed for
    * every column the base indexes. Plain lines when the base declares
    * nothing — deciding costs one string scan of the already-resolved
    * base lines, no extra IO; recomputation costs one aggregation per
    * indexed column over the NEW files only. */
  private def indexedLines(s: SparkSession, table: Path, dataDir: Path,
                           baseLines: Seq[String],
                           only: String => Boolean = _ => true): Seq[String] = {
    val scOpt = baseLines.collectFirst {
      case l if l.startsWith(StatsColPrefix) =>
        l.substring(StatsColPrefix.length)
    }
    val hadRows = baseLines.exists(_.startsWith(RowsPrefix))
    val bloomCols = baseLines.collect {
      case l if l.startsWith(BloomPrefix) => l.split('\t')(2)
    }.distinct
    val secCols = baseLines.collect {
      case l if l.startsWith(StatsPrefix) => l.split('\t')(2)
    }.distinct.filterNot(scOpt.contains)
    val data = scOpt match {
      case Some(c) =>
        val st = fileColStats(s, table, dataDir, c).filter(t => only(t._1))
        st.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" } ++
          (if (hadRows)
             st.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
           else Nil)
      case None =>
        partFiles(table, dataDir).filter(only) ++
          (if (hadRows)
             fileRowsLines(s, table, dataDir)
               .filter(l => only(l.split('\t')(1)))
           else Nil)
    }
    data ++
      bloomCols.flatMap(c => fileBloomLines(s, table, dataDir, c)
        .filter(l => only(l.split('\t')(1)))) ++
      secCols.flatMap(c =>
        fileColStats(s, table, dataDir, c).filter(t => only(t._1)).map {
          case (f, mn, mx, _) => s"$StatsPrefix$f\t$c\t$mn\t$mx"
        })
  }

  /** [[indexedLines]] against the LATEST manifest — the V2 batch
    * INSERT path's index continuity (executors staged the files under
    * `dataDir`; the driver shapes their manifest lines). Plain lines
    * when the table declares no indexes or has no commits yet.
    * `files` is the commit-message-derived list of table-relative
    * staged paths: the manifest is restricted to exactly those files,
    * so an orphan left in the staging dir by a zombie/speculative task
    * attempt (whose abort never ran) is never committed — it stays
    * invisible and reclaimable, same as every raced commit attempt's
    * leftovers. */
  private[graft] def ingestLines(s: SparkSession, table: Path,
                                 dataDir: Path,
                                 files: Seq[String]): Seq[String] = {
    val only = files.toSet
    latestVersion(table) match {
      case Some(v) =>
        indexedLines(s, table, dataDir, manifest(table, v), only)
      case None => partFiles(table, dataDir).filter(only)
    }
  }

  /** [[ingestLines]] plus the restated STATSCOL declaration — a FULL
    * manifest (INSERT OVERWRITE) must restate table-wide declarations
    * or the rewrite silently drops them (the same amnesia rule as
    * CHECK constraints). */
  private[graft] def overwriteLines(s: SparkSession, table: Path,
                                    dataDir: Path,
                                    files: Seq[String]): Seq[String] =
    ingestLines(s, table, dataDir, files) ++
      latestVersion(table).toSeq.flatMap(v =>
        statsColumns(table, v).headOption.map(StatsColPrefix + _) ++
          declaredPartitionCols(table, v).map(PartColPrefix + _) ++
          partSpecLines(table, v))

  /** Each commit ATTEMPT writes under its own unique slug: a crashed
    * or raced attempt's files can never collide with the winner's —
    * they just sit orphaned and invisible (manifests define
    * contents). */
  private def newDataDir(table: Path, version: Long): Path =
    table.resolve("data").resolve(
      f"v$version%06d-" + java.util.UUID.randomUUID().toString.take(8))

  /** The commit point, isolated so a test/witness can drive the
    * failure path: write the manifest under a dot-temp name (readers
    * skip non-matching names), then ONE atomic link to the
    * version-encoding final name. `createLink` rather than an
    * ATOMIC_MOVE rename: POSIX rename REPLACES an existing target, so
    * a move would let a racing committer of the same version silently
    * clobber the winner — the hard link fails with
    * FileAlreadyExistsException instead, which IS the
    * optimistic-concurrency conflict (putIfAbsent on an object
    * store). */
  def publish(table: Path, version: Long, files: Seq[String]): Seq[String] = {
    val dir = Files.createDirectories(commitsDir(table))
    val tmp = Files.createTempFile(dir, ".tmp-", ".manifest")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try Files.createLink(dir.resolve(manifestName(version)), tmp)
    finally Files.deleteIfExists(tmp)
    files
  }

  /** Stage version `version`'s data files and its manifest BUT crash
    * before the publish link — the atomicity witness. Leaves exactly what a
    * mid-commit failure leaves: orphan data files + a temp manifest
    * no reader resolves. */
  def failedCommit(s: SparkSession, table: Path, version: Long,
                   df: DataFrame): Unit = {
    val dataDir = newDataDir(table, version)
    writeData(df, dataDir)
    val dir = Files.createDirectories(commitsDir(table))
    val tmp = Files.createTempFile(dir, ".tmp-", ".manifest")
    Files.write(tmp,
      partFiles(table, dataDir).mkString("\n").getBytes(StandardCharsets.UTF_8))
    // no publish link: the commit never happened as far as any reader knows
  }

  /** Commit with per-file MIN/MAX statistics on `statsCol` (a BIGINT
    * column) — the data-skipping half of the protocol: real table
    * formats aggregate footer stats into the manifest at write time so
    * a reader can eliminate FILES (not just row groups) without
    * opening them. Stats cost one pass over the NEW files only
    * (grouped on input_file_name — commit-time work proportional to
    * the commit, like the write itself). Manifest lines become
    * `path<TAB>min<TAB>max`; plain lines (no stats) stay readable.
    * Skipping only pays when the layout clusters the column — pair
    * with repartitionByRange/z-order at write, exactly as production
    * tables do. */
  def commitWithStats(s: SparkSession, table: Path, version: Long,
                      df: DataFrame, statsCol: String,
                      carried: Seq[String] = Nil,
                      rowCounts: Boolean = false): Seq[String] = {
    refuseBranched(table, "commitWithStats")
    val dataDir = newDataDir(table, version)
    writeData(df, dataDir)
    val stats = fileColStats(s, table, dataDir, statsCol)
    val lines = stats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" }
    // ROWS lines ride the same single stats pass — metadata-only
    // count(*) costs nothing extra at commit time.
    val rows = if (rowCounts)
      stats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" } else Nil
    // `carried` lines (an append commit) keep whatever stats their own
    // commit recorded — stats ride the manifest line, so a carry is
    // byte-verbatim exactly as in [[commit]].
    publish(table, version,
      carried ++ lines ++ rows ++
        carryChecks(s, table, version, dataDir, carried,
          "commitWithStats") :+ s"$StatsColPrefix$statsCol")
    lines.map(_.split('\t').head)
  }

  /** Deletion-vector manifest lines are namespaced `DV\t<path>\t<keyCol>`
    * — a plain data path can never collide (paths live under data/,
    * the literal "DV" does not). */
  private val DvPrefix = "DV\t"

  /** Schema-evolution manifest lines (r13): `RENAME\t<from>\t<to>` and
    * `WIDEN\t<col>\t<sqlType>` ride manifests like DV lines — a
    * metadata-only commit records the mapping, no data file is ever
    * rewritten (the field-ID column-mapping idea of real formats,
    * keyed by name since this layer never reuses a dropped name).
    * `ADDCOL\t<name>\t<sqlType>` (r16) appends a NULLABLE column the
    * same way: files written before it surface typed NULLs at read
    * time, files written after it carry real values, and the next
    * compaction materializes the union — the Delta/Iceberg add-column
    * story, still O(1) metadata at any table size. */
  private val RenamePrefix = "RENAME\t"
  private val WidenPrefix = "WIDEN\t"
  private val AddColPrefix = "ADDCOL\t"
  /** `DROPCOL\t<name>` (r16): the inverse of ADDCOL, same O(1)
    * metadata cost — readers stop SERVING the column (files still
    * carry the bytes until the next compaction physically drops them),
    * time travel below the commit still sees it. Refused while the
    * column is load-bearing (stats/bloom/zonemap/DV-key/partition/
    * CHECK) or while rename/widen mappings live (those record the
    * column's footer-time name; a drop recorded under an evolved name
    * would miss). */
  private val DropColPrefix = "DROPCOL\t"

  /** Per-file bloom-filter manifest lines (r13):
    * `BLOOM\t<file>\t<col>\t<base64 bits>` — a point-lookup skipping
    * index riding the manifest next to the zonemap stats, pruning
    * equality probes on UNCLUSTERED columns (see [[FileBloom]]). */
  private val BloomPrefix = "BLOOM\t"

  /** `STATSCOL\t<col>` (r13): records WHICH column a commit's per-file
    * min/max describe, making the manifest fully self-describing —
    * readers that can't pass options (a SQL catalog scan) still know
    * what to prune on. */
  private val StatsColPrefix = "STATSCOL\t"

  /** `STATS\t<file>\t<col>\t<mn>\t<mx>` (r13): SECONDARY per-file
    * zonemaps — the primary stats column rides the data line itself;
    * additional columns (a z-order's other dimensions) ride these meta
    * lines, so a multi-dimensional box predicate prunes on EVERY
    * clustered column at once (see [[commitMultiStats]]/[[readBox]]). */
  private val StatsPrefix = "STATS\t"

  /** `ROWS\t<file>\t<count>` (r13): per-file ROW COUNTS in the manifest
    * — what lets `count(*)` (and partition-grouped counts) be answered
    * from METADATA alone, never opening a data file: the
    * Iceberg-manifest/Delta-checkpoint `record_count` idea. At 100 TB
    * the difference between a row-count dashboard query costing one
    * manifest read and costing a full table scan. Written by
    * stats-bearing commits on request ([[commitWithStats]]/
    * [[commitPartitioned]] `rowCounts = true`); readers that predate
    * the line kind skip it like any meta line. */
  private val RowsPrefix = "ROWS\t"

  /** `CHECK\t<sql expr>` (r13): a TABLE CONSTRAINT riding the manifest
    * — the Delta `ADD CONSTRAINT` idea: once declared, every
    * row-adding commit path validates its NEW files against the live
    * CHECK expressions before publishing (one aggregate pass over the
    * batch — cost O(commit), never O(table)), so a poisoned batch
    * fails BEFORE the commit point and the table can never hold a
    * violating row. SQL semantics: a row violates only when the
    * expression evaluates FALSE — NULL passes, as standard CHECK. */
  private val CheckPrefix = "CHECK\t"

  /** `PARTCOL\t<col>` (r16): the DECLARED partition layout — written
    * by DDL `CREATE TABLE … PARTITIONED BY`, where the layout must be
    * known BEFORE any data file's path can exhibit it (the zero-row
    * bootstrap is flat). Readers and writers consult
    * [[partitionLayout]] = declared ∪ path-derived, so DDL-declared
    * and `commitPartitioned`-grown layouts behave identically. Like
    * STATSCOL, a full-manifest rewrite must restate it. */
  private val PartColPrefix = "PARTCOL\t"

  /** `PARTSPEC\t<gen>\t<c1,c2,…>` (r17): a NUMBERED partition-spec
    * GENERATION — Iceberg's partition-spec-evolution idea: the table's
    * WRITE layout can change mid-life in one O(1) metadata commit,
    * rewriting nothing. Old files keep their `col=value` paths (every
    * file self-describes the spec its PATH exhibits, and readers
    * re-attach/prune each file under its own spec), new commits land
    * under the HIGHEST generation ([[writePartitionLayout]]), and a
    * compaction un-rags the table by rewriting the whole snapshot
    * under the live spec. An EMPTY column list is a legal generation
    * (evolve back to flat). Like STATSCOL/PARTCOL, a full-manifest
    * rewrite must restate every generation line (amnesia rule). */
  private val PartSpecPrefix = "PARTSPEC\t"

  /** `MVOF\t<base version>` (r17): a MATERIALIZED VIEW's refresh
    * CURSOR — the base-table version whose rows this MV snapshot
    * reflects (the Delta/materialized-lake idea: an MV is an
    * aggregate TABLE plus a position in its base's commit log).
    * Latest-wins (each refresh adds one; readers take the max), so a
    * refresh is an ordinary delta commit and full rewrites restate
    * only the live cursor. [[refreshMaterialized]] consumes it. */
  private val MvOfPrefix = "MVOF\t"

  /** `NDV\t<col>\t<distinct>\t<nulls>` (r17): table-level COLUMN
    * statistics from `ANALYZE` — the approximate distinct count (HLL
    * sketch pass, the only affordable answer at 100 TB) and null
    * count the V2 scan serves to Catalyst as `columnStats`, which is
    * what a cost-based optimizer sizes join OUTPUTS with (sizeInBytes
    * alone only sizes inputs). Latest line per column wins, so
    * re-analyzing is an ordinary delta commit. Appends make the
    * numbers drift (advisory, like every engine's ANALYZE); full
    * REWRITES drop them — a compaction reorganizes enough that stale
    * certainty is worse than none. */
  private val NdvPrefix = "NDV\t"

  /** `MVSQL\t<group cols csv>\t<sql>` (r17): the MV's DEFINITION as
    * stored SQL — the aggregate statement (base referenced as
    * `__BASE__`) plus its group columns, which is what makes the MV
    * refreshable FROM SQL with no Scala in sight: a refresh runs the
    * stored statement over the delta and folds partials by summing
    * every non-group column (the sum/count-mergeable restriction
    * every incremental view-maintenance system imposes; avg = sum +
    * count). Declared once at CREATE, carried like CHECK lines. */
  private val MvSqlPrefix = "MVSQL\t"

  /** `MVAVG\t<served name>\t<sum col>\t<count col>` (r19): one line
    * per `avg(expr) AS name` the MV's CREATE statement declared. The
    * declaration REWRITES the avg into maintained sum+count partial
    * columns (avg itself does not fold across deltas — old_avg +
    * delta_avg is not the ratio; the partials fold by the ordinary
    * SUM merge), and this line records how [[readMaterializedSql]]
    * recombines them at serve time: `name = CAST(sum AS
    * DOUBLE)/count`, NULL where the count is 0. Carried by every
    * refresh like the MVSQL definition. */
  private val MvAvgPrefix = "MVAVG\t"

  /** `MVFOLD\t<col>\t<min|max>` (r19): the per-column merge operator
    * of an MV output that is NOT sum-folded — bare min/max aggregates
    * are incrementally maintainable for APPEND-ONLY deltas (new_min =
    * min(old_min, delta_min)), so the declaration admits them and
    * records the fold here; columns without a line fold by SUM as
    * always. A DV-delete refresh REFUSES while any MVFOLD line lives:
    * a deletion may have removed the extremum, and min is not
    * subtractable — re-create is the only honest answer. Carried by
    * every refresh like MVSQL/MVAVG. */
  private val MvFoldPrefix = "MVFOLD\t"

  /** `KIND\t<verb>` (r14): a PER-COMMIT annotation naming the commit's
    * intent — `update` (a stats-pruned copy-on-write rewrite) or
    * `compact` (a content-preserving reorganization, the Delta
    * `dataChange=false` idea). The change feed keys on it: an `update`
    * commit's RM'd/added files serve as `update_preimage`/
    * `update_postimage` rows; a `compact` commit serves NOTHING (no
    * data changed — downstream mirrors skip it instead of
    * full-restarting). Unlike every other meta line, a KIND line
    * describes ONE commit, never the table: [[manifest]] strips it
    * during resolution, so it can never leak into a later version's
    * carry or checkpoint. Read it via [[commitKind]]. */
  private val KindPrefix = "KIND\t"

  /** The per-commit KIND annotation of `version`, if its writer
    * declared one ("update" / "compact"). */
  def commitKind(table: Path, version: Long): Option[String] =
    rawManifest(table, version).collectFirst {
      case l if l.startsWith(KindPrefix) => l.substring(KindPrefix.length)
    }

  private def isMetaLine(line: String): Boolean =
    line.startsWith(DvPrefix) || line.startsWith(RenamePrefix) ||
      line.startsWith(WidenPrefix) || line.startsWith(AddColPrefix) ||
      line.startsWith(DropColPrefix) || line.startsWith(BloomPrefix) ||
      line.startsWith(StatsColPrefix) || line.startsWith(StatsPrefix) ||
      line.startsWith(RowsPrefix) || line.startsWith(CheckPrefix) ||
      line.startsWith(KindPrefix) || line.startsWith(PartColPrefix) ||
      line.startsWith(PartSpecPrefix) || line.startsWith(MvOfPrefix) ||
      line.startsWith(MvSqlPrefix) || line.startsWith(NdvPrefix) ||
      line.startsWith(MvAvgPrefix) || line.startsWith(MvFoldPrefix)

  /** Is `line` a metadata line (never a data-file line)? The change
    * feed's skip set: meta lines carry no rows to serve. */
  private[graft] def isMetaManifestLine(line: String): Boolean =
    isMetaLine(line)

  /** Does any data-file path of `version`'s manifest carry Hive-style
    * `col=value` partition segments (a [[commitPartitioned]] layout)?
    * Those files' partition column lives ONLY in the path — any
    * rewrite that reads leaves raw and writes flat would silently drop
    * it, so partition-layout tables gate the copy-on-write verbs. */
  private def physicalPartitionColsOf(table: Path,
                                      version: Long): Seq[String] =
    statsManifest(table, version)
      .flatMap(_._1.split('/').dropRight(1).toSeq.collect {
        case seg if seg.contains('=') => seg.substring(0, seg.indexOf('='))
      }).distinct

  /** Path-derived partition columns EXCLUDING hidden transform
    * segments (r18) — what the served schema and the reader union may
    * surface; the physical variant exists for metadata tables and
    * compaction's ragged checks. */
  private def partitionColsOf(table: Path, version: Long): Seq[String] = {
    val hidden = hiddenSegmentNames(table, version)
    physicalPartitionColsOf(table, version).filterNot(hidden)
  }

  /** The PHYSICAL partition layout (declared ∪ every path-borne
    * segment name, hidden transform segments INCLUDED) — the DBA's
    * truth for `t$partitions`; the served schema uses
    * [[partitionLayout]], which hides transform segments. */
  def physicalPartitionLayout(table: Path, version: Long): Seq[String] =
    (declaredPartitionCols(table, version) ++
      physicalPartitionColsOf(table, version)).distinct

  /** The manifest line declaring `col` as a partition column — what a
    * DDL bootstrap passes as `carried` so the layout is known before
    * any data file's path can exhibit it. */
  def partColLine(col: String): String = {
    require(col.nonEmpty && !col.contains('\t') && !col.contains('\n') &&
        !col.contains('/') && !col.contains('='),
      s"partColLine: invalid partition column name '$col'")
    s"$PartColPrefix$col"
  }

  /** The manifest line declaring partition-spec generation `gen` with
    * `specs` (identity names and/or `days(col)`/`bucket(n,col)`
    * transforms) — what a DDL bootstrap carries so a TRANSFORM layout
    * exists from version 0 (a streaming sink owns every version past
    * the bootstrap, so evolution must ride the bootstrap there).
    * Validates the grammar; type checks are the caller's (the schema
    * is theirs). */
  def partSpecLine(gen: Long, specs: Seq[String]): String = {
    require(gen > 0, s"partSpecLine: generation must be positive, got $gen")
    val parsed = specs.map(PartTransform.parse) // grammar gate (truncate() is loud)
    val derived = parsed.map(_.derivedName)
    require(derived.distinct == derived,
      s"partSpecLine: two specs derive the same segment name " +
        s"(${derived.mkString(", ")})")
    s"$PartSpecPrefix$gen\t${parsed.map(_.spec).mkString(",")}"
  }

  /** The DECLARED partition columns at a version (DDL `PARTITIONED
    * BY`), in declaration order — Nil for layouts grown only from
    * `commitPartitioned` paths. */
  def declaredPartitionCols(table: Path, version: Long): Seq[String] =
    manifest(table, version).collect {
      case l if l.startsWith(PartColPrefix) =>
        l.substring(PartColPrefix.length)
    }

  /** The version's full partition layout: declared columns first, then
    * any path-derived column the declaration missed. What V2 writers
    * write under and `GraftTable.partitioning()` reports. */
  def partitionLayout(table: Path, version: Long): Seq[String] =
    (declaredPartitionCols(table, version) ++
      partitionColsOf(table, version)).distinct

  /** All partition-spec GENERATIONS at a version, generation-ascending:
    * (gen, columns); an empty column list is a flat generation. Empty
    * when the table never evolved (pre-r17 tables). */
  def partitionSpecs(table: Path, version: Long): Seq[(Long, Seq[String])] =
    manifest(table, version).collect {
      case l if l.startsWith(PartSpecPrefix) =>
        val rest = l.substring(PartSpecPrefix.length)
        val tab = rest.indexOf('\t')
        val gen = rest.substring(0, tab).toLong
        // Paren-aware split (r18): `bucket(8,doc_id),lang` is two
        // specs — a transform's inner comma is not a separator.
        val cols = PartTransform.split(rest.substring(tab + 1))
        (gen, cols)
    }.sortBy(_._1)

  /** HIDDEN segment names at a version (r18): the derived path-segment
    * names of every transform spec any generation declared (`ts_day`,
    * `doc_id_bucket`, …). These ride file paths like any partition
    * value but are NEVER served as schema columns — hidden
    * partitioning's whole point. All generations count: files written
    * under a retired transform spec still carry (and prune on) their
    * derived segments. */
  def hiddenSegmentNames(table: Path, version: Long): Set[String] =
    partitionSpecs(table, version).flatMap(_._2).map(PartTransform.parse)
      .filterNot(_.isIdentity).map(_.derivedName).toSet

  /** Every TRANSFORM spec any generation declared, parsed — what the
    * scan prunes raw-column predicates through. */
  def liveTransforms(table: Path, version: Long): Seq[PartTransform] =
    partitionSpecs(table, version).flatMap(_._2).map(PartTransform.parse)
      .filterNot(_.isIdentity).distinct

  /** The live PARTSPEC manifest lines at a version — what every
    * full-manifest rewrite must restate (the amnesia rule; all
    * generations carry, so gen numbering and history survive any
    * number of rewrites). */
  private def partSpecLines(table: Path, version: Long): Seq[String] =
    partitionSpecs(table, version).map { case (g, cs) =>
      s"$PartSpecPrefix$g\t${cs.mkString(",")}"
    }

  /** The layout NEW writes land under: the latest spec generation if
    * the table ever evolved ([[evolvePartitionLayout]]), else the full
    * declared-∪-path layout — pre-evolution tables behave exactly as
    * before. Entries may be TRANSFORM specs (`days(ts)`) since r18;
    * writers parse them via [[PartTransform.parse]]. READERS keep
    * consulting [[partitionLayout]] (the union): a mixed-spec table's
    * served schema must surface every column any file's path carries,
    * whichever generation wrote it — hidden transform segments
    * excepted. */
  def writePartitionLayout(table: Path, version: Long): Seq[String] =
    partitionSpecs(table, version).lastOption.map(_._2)
      .getOrElse(partitionLayout(table, version))

  /** Write `out` under a (possibly transform-bearing) spec: transforms
    * derive their segment column via the SAME rendering the V2 row
    * writer uses, partitionBy strips exactly the derived names (raw
    * columns stay in the payload — transform files remain
    * information-complete), identity columns ride the path as always. */
  private def writeUnderSpec(out: DataFrame, writeCols: Seq[String],
                             dataDir: Path): Unit = {
    val specs = writeCols.map(PartTransform.parse)
    // A REAL payload column named like a derived segment would be
    // silently overwritten by the derivation and then hidden by every
    // read — refuse loudly (the DDL/evolve faces refuse at declaration;
    // this catches specs smuggled in through a raw carried= bootstrap).
    specs.filterNot(_.isIdentity).foreach(t =>
      require(!out.columns.contains(t.derivedName),
        s"writeUnderSpec: payload column '${t.derivedName}' shadows " +
          s"the derived segment of ${t.spec} — rename it or drop the " +
          "transform"))
    val derived = specs.foldLeft(out) { (df, t) =>
      if (t.isIdentity) df else df.withColumn(t.derivedName, t.column(df))
    }
    writeData(derived, dataDir, specs.map(_.derivedName))
  }

  /** PARTITION-SPEC EVOLUTION (r17) — change the table's write layout
    * in ONE O(1) metadata commit, rewriting nothing (Iceberg's
    * partition-spec evolution): publishes a delta manifest whose only
    * payload is the next `PARTSPEC` generation. From this version on,
    * INSERTs (V2 and library writers that consult
    * [[writePartitionLayout]]) land `c=v/` files under the NEW spec;
    * every existing file keeps its old path and keeps pruning under
    * the spec its path exhibits (the V2 scan prunes per-file, so a
    * predicate on a new-spec column skips new-spec files and
    * conservatively admits old ones — exactly Iceberg's contract).
    * A later [[compactCommit]] rewrites the whole snapshot under the
    * live spec, un-ragging the layout. At 100 TB this is the verb
    * that turns "we picked the wrong partition key three years ago"
    * from a quarter-long backfill into one commit plus incremental
    * maintenance.
    *
    * Every new spec column must resolve NOW, string-typed: payload
    * columns by schema lookup, current path-borne partition columns by
    * the layout (path values are strings by construction) — a column
    * in neither place would brick the next INSERT, so it refuses at
    * declaration time. Returns the published version. */
  def evolvePartitionLayout(s: SparkSession, table: Path,
                            newCols: Seq[String],
                            checkpointEvery: Int = 8): Long = {
    refuseBranched(table, "evolvePartitionLayout")
    // TRANSFORM specs (r18): each entry is an identity column, a time
    // grain (`years/months/days/hours(col)`) or `bucket(n, col)` —
    // parse refuses unknown shapes loudly (a `truncate(4, s)` must
    // never be stored as a column name).
    val specs = newCols.map(PartTransform.parse)
    require(specs.map(_.derivedName).distinct.size == specs.size &&
        newCols.distinct == newCols,
      s"evolvePartitionLayout: duplicate columns/derived names in " +
        s"$newCols")
    specs.foreach(t => partColLine(t.rawCol)) // tab/newline/slash/= gate
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"evolvePartitionLayout: no committed version at $table"))
    val pathCols = partitionLayout(table, base).toSet
    lazy val payload = read(s, table, Some(base),
      mergeSchema = columnMappings(table, base).nonEmpty).schema
    specs.foreach {
      case IdentityPart(c) if !pathCols(c) =>
        val f = payload.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"evolvePartitionLayout: column '$c' does not exist at " +
              s"version $base of $table"))
        require(f.dataType == org.apache.spark.sql.types.StringType,
          s"evolvePartitionLayout: column '$c' is ${f.dataType.sql} — " +
            "partition values ride the path and read back as STRING; " +
            "derive a string column, or use days()/bucket()")
      case _: IdentityPart => ()
      case t =>
        // A transform derives from a PAYLOAD column (never a path-only
        // column — old files' payloads must stay derivable), with the
        // type its derivation demands; the derived segment name must
        // shadow nothing.
        val f = payload.fields.find(_.name == t.rawCol).getOrElse(
          throw new IllegalArgumentException(
            s"evolvePartitionLayout: ${t.spec} — raw column " +
              s"'${t.rawCol}' is not a payload column at version $base"))
        t match {
          case _: TimePart =>
            require(PartTransform.timeSourceTypes(f.dataType),
              s"evolvePartitionLayout: ${t.spec} needs a BIGINT " +
                s"epoch-micros or TIMESTAMP column, got ${f.dataType.sql}")
          case _: BucketPart | _: TruncatePart =>
            require(PartTransform.hashableTypes(f.dataType),
              s"evolvePartitionLayout: ${t.spec} needs a BIGINT/INT/" +
                s"STRING column, got ${f.dataType.sql}")
          case _ => ()
        }
        require(!payload.fields.exists(_.name == t.derivedName) &&
            !pathCols(t.derivedName),
          s"evolvePartitionLayout: derived segment name " +
            s"'${t.derivedName}' collides with an existing column")
    }
    val gen = partitionSpecs(table, base).lastOption
      .map(_._1).getOrElse(0L) + 1
    val version = base + 1
    publish(table, version, deltaLines(table, version,
      Seq(s"$PartSpecPrefix$gen\t${specs.map(_.spec).mkString(",")}"),
      checkpointEvery))
    version
  }

  /** The MV refresh cursor live at a version — the highest `MVOF`
    * base version the manifest carries. */
  def mvCursor(mv: Path, version: Long): Option[Long] =
    manifest(mv, version).collect {
      case l if l.startsWith(MvOfPrefix) =>
        l.substring(MvOfPrefix.length).trim.toLong
    } match {
      case Nil => None
      case vs => Some(vs.max)
    }

  /** MATERIALIZED VIEW bootstrap (r17): commit `agg(base snapshot)` as
    * the MV table's v0, carrying the refresh cursor (`MVOF` = the base
    * version the aggregate reflects). The MV is an ordinary graft
    * table — time-travelable, taggable, SQL-readable through the
    * catalog; only the cursor line distinguishes it. */
  def createMaterialized(s: SparkSession, base: Path, mv: Path,
      agg: DataFrame => DataFrame): Long = {
    val bv = latestVersion(base).getOrElse(
      throw new IllegalArgumentException(
        s"createMaterialized: no committed version at $base"))
    commit(s, mv, 0L, agg(snapshotWithPartitions(s, base, bv)),
      carried = Seq(s"$MvOfPrefix$bv"))
    0L
  }

  /** The base snapshot with path-borne partition columns re-attached
    * (flat tables read plainly) — what MV creation aggregates over, so
    * group-by-partition-column views work on partitioned bases. */
  private def snapshotWithPartitions(s: SparkSession, base: Path,
                                     bv: Long): DataFrame = {
    val layout = partitionLayout(base, bv)
    if (layout.isEmpty) read(s, base, Some(bv))
    else readMultiPartitionedFiles(s, base, layout,
      statsManifest(base, bv).map(_._1), asOf = Some(bv))
  }

  /** INCREMENTAL MV REFRESH (r17) — the maintenance loop that makes a
    * 100-TB dashboard aggregate affordable: instead of recomputing
    * `agg(base)` per refresh (O(base) — the thing that kills naive
    * MVs at scale), read ONLY the rows the base appended since the
    * cursor (`addedLines` of the commits in (cursor, latest] — the
    * change feed's batch face), aggregate THAT (`aggDelta`, cost
    * O(delta)), and fold it into the standing MV rows with `merge`
    * (cost O(MV) — an aggregate table is small by construction). The
    * walk understands commit KINDs exactly as the change feed does:
    * KIND=compact commits are content-preserving and SKIP; any other
    * commit that removed files (rewrites, DV deletes) REFUSES toward
    * a full re-create — serving a stale or double-counted aggregate
    * is never an option. Partitioned bases work: delta files
    * re-attach their path-borne columns per commit dir (the
    * compaction read), so day-partitioned fact tables refresh their
    * MVs like flat ones. Publishes the merged MV as a rewrite commit
    * carrying the advanced cursor.
    *
    * DV DELETES (r18): for SUM-mergeable aggregates a deletion is
    * SUBTRACTABLE — the rows a DV kills are exactly the key-matching
    * rows alive in the snapshot the DV scopes (read through the
    * connector, which applies every EARLIER DV, so sequential deletes
    * never double-subtract), and `negateDelta` aggregates them with
    * negated partials, folded in by the same `merge`. Callers that
    * pass `negateDelta = None` (the default) keep the r17 refusal.
    * `dropDeadGroups` runs once after all folds IFF a negative was
    * applied — the SQL face uses the MV's count(*) column to remove
    * groups whose last row died (a group a recompute would not
    * produce). Refused toward re-create: true rewrites (removed
    * manifest lines), and DVs whose origin scope is NOT the full
    * prior snapshot (a partial-scope DV's kill set is not
    * reconstructible from one snapshot read).
    *
    * Returns (mvVersion, deltaFilesRead, baseFilesTotal) — the
    * O(delta) witness; a caught-up MV publishes nothing. */
  def refreshMaterialized(s: SparkSession, base: Path, mv: Path,
      aggDelta: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      negateDelta: Option[DataFrame => DataFrame] = None,
      dropDeadGroups: DataFrame => DataFrame = identity,
      repair: DataFrame => DataFrame = identity)
      : (Long, Int, Int) = {
    val mvV = latestVersion(mv).getOrElse(
      throw new IllegalArgumentException(
        s"refreshMaterialized: no committed version at $mv"))
    val cursor = mvCursor(mv, mvV).getOrElse(
      throw new IllegalArgumentException(
        s"refreshMaterialized: $mv carries no MVOF cursor — create it " +
          "via createMaterialized"))
    val bv = latestVersion(base).getOrElse(
      throw new IllegalArgumentException(
        s"refreshMaterialized: no committed version at $base"))
    val baseTotal = statsManifest(base, bv).size
    if (bv == cursor) return (mvV, 0, baseTotal)
    // The walk enumerates SURVIVING manifests: if expire() removed the
    // cursor version, the first survivor's addedLines diff against a
    // vanished ancestor would return its ENTIRE manifest and every
    // already-folded row would aggregate AGAIN — the silent
    // double-count this function exists to refuse (ADVICE r17).
    require(versions(base).contains(cursor),
      s"refreshMaterialized: the MV cursor (base version $cursor) was " +
        s"expired from $base — the delta since the cursor is no longer " +
        "enumerable; re-create the MV from the current snapshot")
    val pending = versions(base).filter(v => v > cursor && v <= bv)
    val negatives = scala.collection.mutable.ArrayBuffer
      .empty[DataFrame]
    val deltaFiles = pending.flatMap { v =>
      commitKind(base, v) match {
        case Some("compact") => Nil // content-preserving: nothing new
        case _ =>
          val added = addedLines(base, v)
          val dvAdds = added.filter(_.startsWith(DvPrefix))
          // A true rewrite removes manifest lines — unrepresentable as
          // a delta either way; a DV delete is representable exactly
          // when the caller can negate (sum-mergeable aggregates).
          require(removedLines(base, v).isEmpty &&
              (dvAdds.isEmpty || negateDelta.isDefined),
            s"refreshMaterialized: base version $v rewrites or deletes " +
              "rows — an append-derived refresh would serve a wrong " +
              "aggregate; re-create the MV from the current snapshot")
          if (dvAdds.nonEmpty) {
            // The killed rows: key-matching rows alive in the snapshot
            // just below v. The connector read applies every EARLIER
            // DV (sequential deletes never double-subtract) and serves
            // path-borne partition columns. Scope must be the FULL
            // prior snapshot — deleteCommit (origin = v, same files)
            // and mergeCommit (origin = prev) both qualify.
            val prev = versions(base).filter(_ < v).last
            val prevFiles = statsManifest(base, prev).map(_._1).toSet
            dvAdds.map(_.split('\t'))
              .groupBy(a => (a(2), a(3).toLong)).foreach {
                case ((keyCol, origin), lines) =>
                  require(statsManifest(base, origin).map(_._1).toSet ==
                      prevFiles,
                    s"refreshMaterialized: the DV at base version $v " +
                      s"scopes origin $origin, not the full prior " +
                      "snapshot — re-create the MV")
                  val keys = s.read.parquet(
                    lines.map(a => base.resolve(a(1)).toString): _*)
                  val snap = s.read.format("graft-table")
                    .option("version", prev.toString)
                    .load(base.toString)
                  val killed = snap.join(
                    org.apache.spark.sql.functions.broadcast(keys),
                    Seq(keyCol), "left_semi")
                  negatives += negateDelta.get(killed)
              }
          }
          added.filterNot(isMetaLine).map(_.split('\t').head)
      }
    }
    if (deltaFiles.isEmpty && negatives.isEmpty) {
      // Only content-preserving commits since the cursor (compactions):
      // the rows are already right — advance the cursor as a pure-meta
      // delta, no MV row rewritten.
      publish(mv, mvV + 1,
        deltaLines(mv, mvV + 1, Seq(s"$MvOfPrefix$bv"), 8))
      return (mvV + 1, 0, baseTotal)
    }
    // PARTITIONED bases (r17): the delta files re-attach their
    // path-borne partition columns per commit dir — the same
    // mixed-layout read compaction uses — so a day-partitioned fact
    // table refreshes its MVs exactly like a flat one.
    val layout = partitionLayout(base, bv)
    val positive =
      if (deltaFiles.isEmpty) None
      else if (layout.isEmpty)
        Some(s.read.parquet(
          deltaFiles.map(f => base.resolve(f).toString): _*))
      else Some(readMultiPartitionedFiles(s, base, layout, deltaFiles,
        asOf = Some(bv)))
    val folded = negatives.foldLeft(
      positive.fold(read(s, mv, Some(mvV)))(d =>
        merge(read(s, mv, Some(mvV)), aggDelta(d))))(merge)
    // `repair` (r20): the caller's post-merge fix-up pass — the
    // extremum-ledger hook (groups whose deleted rows TIED a standing
    // min/max recompute from the base; everything else rides the
    // incremental fold). Identity when no deletes ran.
    val merged =
      if (negatives.isEmpty) folded else repair(dropDeadGroups(folded))
    // KIND=update: the refresh is a copy-on-write rewrite of the MV —
    // a change feed on the MV replays it as preimage/postimage pairs
    // instead of refusing an unannotated rewrite. The MVSQL definition
    // (if declared) restates like every table-wide contract: a refresh
    // must not be the commit that forgets what the MV computes.
    commit(s, mv, mvV + 1, merged,
      carried = manifest(mv, mvV).filter(l =>
        l.startsWith(MvSqlPrefix) || l.startsWith(MvAvgPrefix) ||
        l.startsWith(MvFoldPrefix)) ++
        Seq(s"$MvOfPrefix$bv", s"${KindPrefix}update"))
    (mvV + 1, deltaFiles.size, baseTotal)
  }

  /** Column statistics live at a version: column → (approx distinct
    * count, null count). Latest ANALYZE wins per column. */
  def ndvStats(table: Path, version: Long): Map[String, (Long, Long)] =
    manifest(table, version).foldLeft(Map.empty[String, (Long, Long)]) {
      case (m, l) if l.startsWith(NdvPrefix) =>
        val Array(_, c, d, n) = l.split('\t')
        m + (c -> (d.toLong, n.toLong))
      case (m, _) => m
    }

  /** `ANALYZE TABLE`-shape column statistics (r17): ONE aggregate pass
    * over the snapshot computing `approx_count_distinct` (HLL — the
    * only affordable distinct count at 100 TB) and the null count for
    * each named column, published as NDV manifest lines in an O(1)
    * delta commit. The V2 scan serves them to Catalyst as
    * `columnStats`, the input a cost-based optimizer needs to size
    * JOIN OUTPUTS (sizeInBytes/numRows only size inputs). Partition
    * columns analyze too (the snapshot re-attaches them). Returns the
    * published version. */
  def analyzeCommit(s: SparkSession, table: Path, cols: Seq[String],
                    checkpointEvery: Int = 8): Long = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col,
      count, lit, when}
    refuseBranched(table, "analyzeCommit")
    require(cols.nonEmpty && cols.distinct == cols,
      s"analyzeCommit: invalid column list $cols")
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"analyzeCommit: no committed version at $table"))
    val snap = snapshotWithPartitions(s, table, base)
    cols.foreach(c => require(snap.columns.contains(c),
      s"analyzeCommit: column '$c' does not exist at version $base " +
        s"of $table (${snap.columns.mkString(", ")})"))
    val row = snap.agg(
      count(lit(1)).as("__n"),
      cols.flatMap(c => Seq(
        approx_count_distinct(col(c)).as(s"d_$c"),
        count(when(col(c).isNull, lit(1))).as(s"z_$c"))): _*).head()
    val lines = cols.map(c =>
      s"$NdvPrefix$c\t${row.getAs[Long](s"d_$c")}\t${row.getAs[Long](s"z_$c")}")
    val version = base + 1
    publish(table, version, deltaLines(table, version, lines,
      checkpointEvery))
    version
  }

  /** The MV's stored SQL definition at a version: (group columns,
    * statement with `__BASE__` placeholder). */
  def mvDefinition(mv: Path, version: Long): Option[(Seq[String], String)] =
    manifest(mv, version).collectFirst {
      case l if l.startsWith(MvSqlPrefix) =>
        val rest = l.substring(MvSqlPrefix.length)
        val tab = rest.indexOf('\t')
        (rest.substring(0, tab).split(',').toSeq.map(_.trim)
          .filter(_.nonEmpty), rest.substring(tab + 1))
    }

  /** Run an MV's stored SQL over `input` (served as `__BASE__`). */
  private def runMvSql(s: SparkSession, sql: String,
                       input: DataFrame): DataFrame = {
    val view = "graft_mv_in_" + java.util.UUID.randomUUID()
      .toString.replace("-", "")
    input.createOrReplaceTempView(view)
    try s.sql(sql.replace("__BASE__", view))
    finally s.catalog.dropTempView(view)
  }

  /** The generic partial-fold for a stored-SQL MV: union the standing
    * rows with the delta aggregate and fold every non-group column by
    * its declared operator — SUM by default (the sum/count/avg-partial
    * surface), MIN/MAX for the append-only extremum columns the
    * declaration recorded as MVFOLD lines (r19). Column order pinned
    * to the MV's. */
  private def mvMerge(groupCols: Seq[String], old: DataFrame,
                      delta: DataFrame,
                      foldOps: Map[String, String] = Map.empty,
                      avgFolds: Seq[(String, String, String)] = Nil)
      : DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    // Served avg ratios (r20) do NOT fold — drop them from both sides,
    // fold their sum/count partials by the ordinary SUM merge, then
    // recompute each ratio over the MERGED partials.
    val served = avgFolds.map(_._1).toSet
    val foldCols = old.columns.filterNot(served.contains)
    val aggCols = foldCols.filterNot(groupCols.contains)
    def op(c: String) = foldOps.getOrElse(c, "sum")
    val merged = old.select(foldCols.map(col).toIndexedSeq: _*)
      .unionByName(delta.select(foldCols.map(col).toIndexedSeq: _*))
      .groupBy(groupCols.map(col): _*)
      .agg(aggCols.head -> op(aggCols.head),
        aggCols.tail.map(c => c -> op(c)): _*)
      .toDF(groupCols ++ aggCols: _*)
    avgFolds.foldLeft(merged) { case (df, (n, sc, cc)) =>
      df.withColumn(n, when(col(cc) > 0, col(sc).cast("double") / col(cc)))
    }.select(old.columns.map(col).toIndexedSeq: _*)
  }

  /** SQL-defined MATERIALIZED VIEW bootstrap (r17) — the CALL-surface
    * face of [[createMaterialized]]: validates the statement (must
    * reference `__BASE__`, group columns must be output columns, every
    * other output column must be BIGINT or DOUBLE — the mergeable-sum
    * restriction, refused at declaration time), runs it over the base
    * snapshot, and commits the MV carrying BOTH the cursor and the
    * definition — so the refresh needs nothing but the two tables. */
  def createMaterializedSql(s: SparkSession, base: Path, mv: Path,
      groupCols: Seq[String], sql: String): Long = {
    require(!sql.exists(c => c == '\t' || c == '\n' || c == '\r'),
      "createMaterializedSql: the statement must not contain " +
        "tab/newline (manifest lines are TAB-structured)")
    require(sql.contains("__BASE__"),
      "createMaterializedSql: the statement must reference __BASE__")
    require(groupCols.nonEmpty && groupCols.distinct == groupCols,
      s"createMaterializedSql: invalid group columns $groupCols")
    val bv = latestVersion(base).getOrElse(
      throw new IllegalArgumentException(
        s"createMaterializedSql: no committed version at $base"))
    val out0 = runMvSql(s, sql, snapshotWithPartitions(s, base, bv))
    groupCols.foreach(c => require(out0.columns.contains(c),
      s"createMaterializedSql: group column '$c' is not an output " +
        s"column of the statement (${out0.columns.mkString(", ")})"))
    // AVG REWRITE (r19): avg(x) is mechanically derivable — the
    // DECLARATION rewrites each bare `avg(expr) AS name` into
    // maintained `sum(expr)/count(expr)` partial columns (which fold
    // by the ordinary SUM merge across appends AND DV-delete
    // negation), records the recombination as an MVAVG line, and
    // [[readMaterializedSql]] folds the ratio at serve time. DISTINCT
    // and FILTER'd avgs stay un-rewritten and fall through to the
    // mergeability gate's refusal below.
    val avgNames: Seq[String] = locally {
      import org.apache.spark.sql.catalyst.expressions.Alias
      import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average}
      out0.queryExecution.analyzed.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.flatMap(_.aggregateExpressions.collect {
        case al @ Alias(ae: AggregateExpression, _)
            if ae.aggregateFunction.isInstanceOf[Average] &&
              !ae.isDistinct && ae.filter.isEmpty => al.name
      })
    }
    val (storedSql, avgFolds) =
      if (avgNames.isEmpty) (sql, Nil)
      else rewriteAvgSql(sql, avgNames.distinct)
    avgFolds.foreach { case (n, sc, cc) =>
      Seq(sc, cc).foreach(p => require(!out0.columns.contains(p),
        s"createMaterializedSql: avg rewrite partial column '$p' " +
          s"(for avg output '$n') collides with an existing output " +
          "column — rename one"))
    }
    val out =
      if (avgNames.isEmpty) out0
      else runMvSql(s, storedSql, snapshotWithPartitions(s, base, bv))
    require(out.columns.length > groupCols.length,
      "createMaterializedSql: the statement must produce at least one " +
        "aggregate column beyond the group columns")
    out.schema.fields.filterNot(f => groupCols.contains(f.name))
      .foreach(f => require(
        f.dataType == org.apache.spark.sql.types.LongType ||
          f.dataType == org.apache.spark.sql.types.DoubleType,
        s"createMaterializedSql: aggregate column '${f.name}' is " +
          s"${f.dataType.sql} — refreshable aggregates must fold by " +
          "SUM, so BIGINT/DOUBLE only (avg = sum + count; decimals " +
          "widen under sum and would drift the schema)"))
    // The type proxy above is necessary but not SUFFICIENT: avg(x),
    // min/max, count(DISTINCT …) and HAVING all type-check as
    // BIGINT/DOUBLE yet do NOT fold by SUM — a refresh would silently
    // serve wrong aggregates after the first delta (ADVICE r17). The
    // ANALYZED plan is the ground truth: exactly one Aggregate, every
    // aggregate function sum/count, no DISTINCT, no FILTER clause, no
    // Filter ABOVE the aggregate (HAVING re-evaluates a predicate on
    // PARTIALS at refresh time — groups could wrongly appear/vanish).
    val foldOps: Seq[(String, String)] = locally {
      import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
      val analyzed = out.queryExecution.analyzed
      val aggNodes = analyzed.collect { case a: Aggregate => a }
      require(aggNodes.length == 1,
        s"createMaterializedSql: the statement must be exactly one " +
          s"GROUP BY aggregate over __BASE__ (found ${aggNodes.length} " +
          "Aggregate nodes)")
      analyzed.foreach {
        case f: Filter
            if f.child.collectFirst { case a: Aggregate => a }.isDefined =>
          throw new IllegalArgumentException(
            "createMaterializedSql: HAVING (a filter above the " +
              "aggregate) is not refreshable — a delta refresh would " +
              "re-evaluate the predicate on partial sums; filter in a " +
              "query over the MV instead")
        case _ => ()
      }
      // Each NON-GROUP output must be a BARE aggregate (one
      // Alias(AggregateExpression)) — a COMPOSITE like sum(x)/count(*)
      // or sum(x)+1 contains only legal Sum/Count nodes yet does NOT
      // fold by SUM (old_avg + delta_avg ≠ avg): the expression shape
      // is the contract, not just the functions inside it.
      aggNodes.head.aggregateExpressions.foreach {
        // A bare passthrough column is legal ONLY as a DECLARED group
        // column: `SELECT g, id, sum(v) … GROUP BY g, id` with
        // groupCols=[g] would type-check and then SUM `id` across
        // deltas in the fold (self-review r18).
        case a: org.apache.spark.sql.catalyst.expressions.Attribute
            if groupCols.contains(a.name) => ()
        case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
          throw new IllegalArgumentException(
            s"createMaterializedSql: output column '${a.name}' is " +
              "grouped in the statement but not declared in " +
              s"group_cols ($groupCols) — the refresh fold would SUM " +
              "it; declare it as a group column")
        case al: org.apache.spark.sql.catalyst.expressions.Alias
            if groupCols.contains(al.name) => ()
        // The avg rewrite's OWN served-ratio composite (r20): it does
        // not fold by SUM — the merge drops it and recomputes it from
        // the merged partials, so the shape is safe BY CONSTRUCTION
        // (the MVAVG line is the witness). User composites still
        // refuse below.
        case al: org.apache.spark.sql.catalyst.expressions.Alias
            if avgFolds.exists(_._1 == al.name) => ()
        case al: org.apache.spark.sql.catalyst.expressions.Alias =>
          require(al.child.isInstanceOf[AggregateExpression],
            s"createMaterializedSql: output '${al.name}' is a " +
              "COMPOSITE over aggregates — it does not fold by SUM " +
              "(e.g. sum(x)/count(*) summed across deltas is not the " +
              "ratio); emit the bare sum/count parts and recombine " +
              "when reading")
        case other => throw new IllegalArgumentException(
          s"createMaterializedSql: unsupported output expression " +
            s"$other — group columns and bare sum/count aggregates only")
      }
      aggNodes.head.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae
      }).foreach { ae =>
        require(!ae.isDistinct,
          "createMaterializedSql: DISTINCT aggregates do not fold by " +
            "SUM across deltas (a value seen in two deltas would " +
            "double-count) — use an exact recompute instead")
        require(ae.filter.isEmpty,
          "createMaterializedSql: FILTER (WHERE …) aggregate clauses " +
            "are not validated for mergeability — move the predicate " +
            "to the statement's WHERE clause")
        ae.aggregateFunction match {
          case _: Sum | _: Count => ()
          // min/max (r19): incrementally maintainable for APPEND-ONLY
          // deltas (new_min = min(old_min, delta_min)) — admitted and
          // recorded as MVFOLD lines below; the DV-delete refresh
          // refuses while they live (an extremum is not subtractable).
          case _: Min | _: Max => ()
          case other => throw new IllegalArgumentException(
            s"createMaterializedSql: aggregate '${other.prettyName}' " +
              "does not fold across deltas — sum/count (and avg via " +
              "the sum+count rewrite) fold by SUM, min/max fold for " +
              s"append-only bases; '${other.prettyName}' has no fold")
        }
      }
      // The non-SUM fold map this MV's merge applies per column.
      aggNodes.head.aggregateExpressions.collect {
        case al: org.apache.spark.sql.catalyst.expressions.Alias =>
          al.child match {
            case ae: AggregateExpression =>
              ae.aggregateFunction match {
                case _: Min => Some(al.name -> "min")
                case _: Max => Some(al.name -> "max")
                case _ => None
              }
            case _ => None
          }
      }.flatten
    }
    commit(s, mv, 0L, out, carried = Seq(s"$MvOfPrefix$bv",
      s"$MvSqlPrefix${groupCols.mkString(",")}\t$storedSql") ++
      avgFolds.map { case (n, sc, cc) => s"$MvAvgPrefix$n\t$sc\t$cc" } ++
      foldOps.map { case (c, op) => s"$MvFoldPrefix$c\t$op" })
    0L
  }

  /** The non-SUM per-column merge operators an MV's declaration
    * recorded: column → "min" | "max". Empty for pure sum/count MVs. */
  def mvFoldOps(mv: Path, version: Long): Map[String, String] =
    manifest(mv, version).collect {
      case l if l.startsWith(MvFoldPrefix) =>
        val Array(c, op) = l.substring(MvFoldPrefix.length).split('\t')
        c -> op
    }.toMap

  /** Textual select-list rewrite backing the avg declaration: each
    * `avg(expr) AS name` item (for `names`, located in the statement's
    * TOP-LEVEL select list, paren- and quote-aware) becomes the SERVED
    * ratio in place — `CASE WHEN count(expr) > 0 THEN CAST(sum(expr)
    * AS DOUBLE) / count(expr) END AS name` — with the maintained
    * `sum(expr) AS name__asum, count(expr) AS name__acnt` partials
    * appended at the END of the select list (r20: the ratio is
    * PHYSICALLY stored so every SQL surface serves the declared shape;
    * the partials are what the refresh folds, and the connector hides
    * them). An avg the ANALYZER saw but this parse cannot locate
    * refuses loudly — the rewrite must be exact, never a guess.
    * Returns the rewritten statement and the (name, sumCol, countCol)
    * fold triples. */
  private def rewriteAvgSql(sql: String, names: Seq[String])
      : (String, Seq[(String, String, String)]) = {
    val lower = sql.toLowerCase(java.util.Locale.ROOT)
    def isWordAt(i: Int, w: String): Boolean =
      lower.startsWith(w, i) &&
        (i == 0 || { val p = lower.charAt(i - 1)
          !p.isLetterOrDigit && p != '_' }) &&
        (i + w.length >= sql.length || { val n = lower.charAt(i + w.length)
          !n.isLetterOrDigit && n != '_' })
    var depth = 0
    var inStr = false
    var selEnd = -1 // index just past the top-level SELECT keyword
    var fromAt = -1 // index of the matching top-level FROM keyword
    var i = 0
    while (i < sql.length && fromAt < 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 =>
          if (selEnd < 0 && isWordAt(i, "select")) selEnd = i + 6
          else if (selEnd >= 0 && isWordAt(i, "from")) fromAt = i
        case _ => ()
      }
      i += 1
    }
    require(selEnd >= 0 && fromAt > selEnd,
      "createMaterializedSql: could not locate the top-level " +
        "SELECT … FROM span to rewrite avg() — write the sum/count " +
        "partials explicitly")
    // Paren- and quote-aware comma split of the select list.
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    locally {
      val cur = new StringBuilder
      var d = 0
      var q = false
      sql.substring(selEnd, fromAt).foreach {
        case c if q => cur += c; if (c == '\'') q = false
        case '\'' => cur += '\''; q = true
        case '(' => d += 1; cur += '('
        case ')' => d -= 1; cur += ')'
        case ',' if d == 0 => items += cur.result(); cur.clear()
        case c => cur += c
      }
      items += cur.result()
    }
    val AvgItem =
      """(?is)^\s*avg\s*\((.+)\)\s+as\s+([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\s*$""".r
    def alias(a: String): String =
      if (a.startsWith("`")) a.substring(1, a.length - 1) else a
    val exprByName =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    val rewritten = items.map {
      case AvgItem(expr, a) if names.contains(alias(a)) =>
        val n = alias(a)
        exprByName(n) = expr
        s" (CASE WHEN count($expr) > 0 THEN CAST(sum($expr) AS " +
          s"DOUBLE) / count($expr) END) AS $n "
      case it => it
    }
    names.foreach { n =>
      val hits = items.count {
        case AvgItem(_, a) => alias(a) == n
        case _ => false
      }
      require(hits == 1,
        s"createMaterializedSql: avg output '$n' must appear exactly " +
          s"once as a top-level `avg(expr) AS $n` select item (found " +
          s"$hits) — write the sum/count partials explicitly")
    }
    val partials = names.map { n =>
      val e = exprByName(n)
      s" sum($e) AS ${n}__asum, count($e) AS ${n}__acnt "
    }
    (sql.substring(0, selEnd) + (rewritten ++ partials).mkString(",") +
      sql.substring(fromAt),
      names.map(n => (n, s"${n}__asum", s"${n}__acnt")))
  }

  /** The avg fold triples an MV's declaration recorded: (served name,
    * sum partial column, count partial column). */
  def mvAvgFolds(mv: Path, version: Long): Seq[(String, String, String)] =
    manifest(mv, version).collect {
      case l if l.startsWith(MvAvgPrefix) =>
        val Array(n, sc, cc) = l.substring(MvAvgPrefix.length).split('\t')
        (n, sc, cc)
    }

  /** Serve a SQL-defined MV in its DECLARED shape: every avg the
    * CREATE rewrote into sum/count partials recombines here
    * (`CAST(sum AS DOUBLE)/count`, NULL where the count is 0 — the
    * all-NULL-input group), the partial columns drop, and every other
    * column serves as stored. MVs without avg serve identically to
    * [[read]]. */
  def readMaterializedSql(s: SparkSession, mv: Path,
                          asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val v = asOf.orElse(latestVersion(mv)).getOrElse(
      throw new IllegalArgumentException(
        s"readMaterializedSql: no committed version at $mv"))
    val folds = mvAvgFolds(mv, v)
    val raw = read(s, mv, Some(v))
    if (folds.isEmpty) return raw
    if (folds.forall(f => raw.columns.contains(f._1))) {
      // r20 MV: the served ratio is physically stored (create/refresh
      // recompute it from the merged partials) — just hide the
      // maintenance partials, like the connector schema does.
      val partials = folds.flatMap(f => Seq(f._2, f._3)).toSet
      return raw.select(raw.columns.filterNot(partials.contains)
        .map(col).toIndexedSeq: _*)
    }
    val bySum = folds.map(f => (f._2, f)).toMap
    val cntCols = folds.map(_._3).toSet
    raw.select(raw.columns.toIndexedSeq.flatMap {
      case c if bySum.contains(c) =>
        val (name, sc, cc) = bySum(c)
        Some(when(col(cc) > 0, col(sc).cast("double") / col(cc))
          .as(name))
      case c if cntCols.contains(c) => None
      case c => Some(col(c))
    }: _*)
  }

  /** Refresh a SQL-defined MV from its STORED definition — the
    * [[refreshMaterialized]] walk with aggDelta/merge derived from the
    * MVSQL line; the definition carries like a CHECK, so the verb
    * needs nothing but the two table paths. */
  def refreshMaterializedSql(s: SparkSession, base: Path,
                             mv: Path): (Long, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val mvV = latestVersion(mv).getOrElse(
      throw new IllegalArgumentException(
        s"refreshMaterializedSql: no committed version at $mv"))
    val (groupCols, sql) = mvDefinition(mv, mvV).getOrElse(
      throw new IllegalArgumentException(
        s"refreshMaterializedSql: $mv carries no MVSQL definition — " +
          "create it via createMaterializedSql"))
    // The MV's count(*) output column, if the definition has one —
    // what detects a group whose LAST row a delete killed (its merged
    // count hits 0 and a recompute would not produce it). Located from
    // the ANALYZED plan over a zero-row frame: plan-only, no job.
    lazy val countStarCol: Option[String] = {
      import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
      val bv = latestVersion(base).get
      val probe = runMvSql(s, sql,
        snapshotWithPartitions(s, base, bv).limit(0))
      probe.queryExecution.analyzed.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.aggregateExpressions.collectFirst {
            case al @ Alias(ae: AggregateExpression, _)
                if (ae.aggregateFunction match {
                  case c: Count => c.children == Seq(Literal(1))
                  case _ => false
                }) => al.name
          }
      }.flatten
    }
    val foldOps = mvFoldOps(mv, mvV)
    val avgFolds = mvAvgFolds(mv, mvV)
    // Per-DV KILLED-ROW AGGREGATES captured for the extremum repair —
    // the negation closure already runs the statement over each DV's
    // killed rows, so the repair folds those aggregates instead of
    // re-scanning the killed rows a second time.
    val killedAggs = scala.collection.mutable.ArrayBuffer
      .empty[DataFrame]
    // Group outputs resolved to their BASE-side columns (zero-row
    // analyzed probe, the countStarCol pattern): Some(map) when every
    // grouping output is a bare base attribute or a direct alias of
    // one — the repair can then PRE-FILTER the base scan to affected
    // groups (layout pruning on the base columns applies). An aliased-
    // to-an-expression group (legal at declaration) yields None: the
    // repair aggregates the full snapshot and filters the RESULT —
    // costlier but never resolves an MV output name against the wrong
    // base column.
    lazy val groupBaseCols: Option[Map[String, String]] = {
      import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
      val bv = latestVersion(base).get
      val probe = runMvSql(s, sql,
        snapshotWithPartitions(s, base, bv).limit(0))
      probe.queryExecution.analyzed.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          val m = groupCols.flatMap { g =>
            a.aggregateExpressions.collectFirst {
              case attr: AttributeReference if attr.name == g =>
                g -> attr.name
              case al @ Alias(src: AttributeReference, _)
                  if al.name == g => g -> src.name
            }
          }.toMap
          // Two outputs aliasing the same base column would collide in
          // the pre-filter key frame — fall back to the result filter.
          if (m.keySet == groupCols.toSet &&
              m.values.toSeq.distinct.size == m.size) Some(m) else None
      }.flatten
    }
    refreshMaterialized(s, base, mv,
      aggDelta = df => runMvSql(s, sql, df),
      merge = (old, delta) =>
        mvMerge(groupCols, old, delta, foldOps, avgFolds),
      // DV-delete subtraction: aggregate the killed rows with the
      // stored statement, then NEGATE every sum-foldable column — the
      // ordinary merge folds it in (sum-mergeability is exactly what
      // createMaterializedSql validated). EXTREMUM columns (r20) are
      // not subtractable, so their negation emits NULL (which the
      // min/max merge folds away); whether a deletion actually REMOVED
      // an extremum is decided by the repair pass below, per group.
      negateDelta = Some { killed =>
        require(countStarCol.isDefined,
          "refreshMaterializedSql: a DV-delete refresh needs a " +
            "count(*) aggregate column in the MV definition to detect " +
            "emptied groups — re-create the MV (or declare it with " +
            "count(*))")
        val agg = runMvSql(s, sql, killed)
        if (foldOps.nonEmpty) killedAggs += agg
        agg.select(agg.columns.map(c =>
          if (groupCols.contains(c)) col(c)
          else if (foldOps.contains(c))
            org.apache.spark.sql.functions.lit(null)
              .cast(agg.schema(c).dataType).as(c)
          else (org.apache.spark.sql.functions.lit(0) - col(c)).as(c))
          .toIndexedSeq: _*)
      },
      dropDeadGroups = df =>
        countStarCol.fold(df)(c => df.where(col(c) > 0)),
      // EXTREMUM REPAIR (r20, the r19 verdict's last missing verb):
      // min/max fold incrementally through a DV delete UNLESS the
      // deleted rows' per-group extremum TIES the merged one — the
      // pre-repair merged extremum folds over every row ever appended
      // (deletes only NULL out), so killed_min >= merged_min always,
      // and equality is exactly "the standing extremum may be among
      // the dead". Only TIED groups recompute, from the CURRENT base
      // snapshot restricted to those groups (broadcast semi-join on
      // the group keys — layout pruning on group columns applies);
      // the common delete-misses-the-extremum case stays O(delta),
      // and the rare tie costs the affected groups' rows, never a
      // whole-MV re-create. A fully-emptied group always ties, lands
      // in the affected set, and recomputes to zero rows — vanishing
      // exactly like the count(*)-detected death.
      repair = { merged =>
        if (foldOps.isEmpty || killedAggs.isEmpty) merged
        else {
          import org.apache.spark.sql.functions.broadcast
          val foldCols = foldOps.keys.toSeq.sorted
          // Fold the per-DV killed aggregates to one extremum row per
          // group (min of mins / max of maxes — each frame is already
          // aggregated, so this is an O(groups) fold, no row re-scan).
          val killedAgg = killedAggs
            .map(df => df.select((groupCols ++ foldCols)
              .map(col).toIndexedSeq: _*))
            .reduce(_ unionByName _)
            .groupBy(groupCols.map(col): _*)
            .agg(foldCols.head -> foldOps(foldCols.head),
              foldCols.tail.map(c => c -> foldOps(c)): _*)
            .toDF(groupCols ++ foldCols: _*)
          // NULL-SAFE keys everywhere below: a NULL group key is an
          // ordinary group (groupBy keeps it), and a plain equi-join
          // would skip exactly that group's repair — serving the
          // deleted extremum forever. Prefixed projections also give
          // each side fresh exprIds, so the self-lineage joins
          // (affected derives from merged) resolve unambiguously.
          def renamed(df: DataFrame, p: String): DataFrame =
            df.toDF(df.columns.map(p + _).toIndexedSeq: _*)
          val k = renamed(killedAgg, "__k_")
          val tie = foldOps.toSeq.sortBy(_._1).map { case (c, op) =>
            if (op == "min") k(s"__k_$c") <= merged(c)
            else k(s"__k_$c") >= merged(c)
          }.reduce(_ || _)
          val affected = merged.join(k,
              groupCols.map(g => merged(g) <=> k(s"__k_$g"))
                .reduce(_ && _))
            .where(tie)
            .select(groupCols.map(g => merged(g)): _*).distinct()
          val aff = renamed(affected, "__a_")
          val bv = latestVersion(base).get
          val snap = snapshotWithPartitions(s, base, bv)
          val scoped = groupBaseCols match {
            case Some(m) =>
              // Pre-filter the base scan to the affected groups — a
              // pure optimization (the result-side filter below is
              // what's load-bearing), valid only when every group
              // output names a real base column.
              val keys = affected.select(groupCols.map(g =>
                col(g).as("__b_" + m(g))): _*)
              snap.join(broadcast(keys),
                m.values.toSeq.map(bc =>
                  snap(bc) <=> keys(s"__b_$bc")).reduce(_ && _),
                "left_semi")
            case None => snap
          }
          val recomputed = runMvSql(s, sql, scoped)
          val fixed = recomputed.join(broadcast(aff),
            groupCols.map(g => recomputed(g) <=> aff(s"__a_$g"))
              .reduce(_ && _),
            "left_semi")
          merged.join(broadcast(aff),
              groupCols.map(g => merged(g) <=> aff(s"__a_$g"))
                .reduce(_ && _),
              "left_anti")
            .unionByName(fixed)
            .select(merged.columns.map(col).toIndexedSeq: _*)
        }
      })
  }

  /** The CHECK constraints live at a version, in declaration order.
    * Computed by a RAW-chain walk (base's constraints ++ this delta's
    * CHECK tail) rather than full manifest resolution: CHECK lines are
    * only ever added (RM names data files, never constraints) and every
    * full-manifest writer carries them, so the walk gives the same
    * answer as resolving — without splicing the O(live files) list.
    * This keeps the per-commit [[carryChecks]] probe O(chain) metadata
    * reads (ADVICE r14: the old resolution-based probe made every raw
    * commit pay a full manifest resolution just to learn there was no
    * constraint). */
  def checkConstraints(table: Path, version: Long): Seq[String] = {
    val raw = rawManifest(table, version)
    val own = raw.collect {
      case l if l.startsWith(CheckPrefix) => l.substring(CheckPrefix.length)
    }
    (raw.headOption match {
      case Some(h) if h.startsWith(BasePrefix) =>
        checkConstraints(table, h.stripPrefix(BasePrefix).trim.toLong) ++ own
      case _ => own
    }).distinct
  }

  /** Declare a CHECK constraint as a METADATA-ONLY commit — after
    * validating the CURRENT snapshot against it (the Delta ADD
    * CONSTRAINT contract: a constraint the existing data violates must
    * be refused, which costs one scan — the one place this surface
    * pays O(table), exactly as production formats do). From this
    * version on, every row-adding commit validates its new files.
    * Unlike per-file metadata (BLOOM/STATS/ROWS), a CHECK is a TABLE
    * contract: every full-manifest writer — [[compactCommit]],
    * [[transact]], raw [[commit]] and the stats/partitioned/indexed
    * variants, the V2 overwrite path — carries live CHECK lines
    * forward and validates its new files against them (r14; dropping
    * a declared safety gate silently was the r13 amnesia ADVICE.md
    * flagged). Only a publish() of hand-built lines can still shed
    * one, and that is the raw-primitive escape hatch, not a path. */
  def constraintCommit(s: SparkSession, table: Path, version: Long,
                       expr: String, checkpointEvery: Int = 8): Seq[String] = {
    require(!expr.exists(c => c == '\t' || c == '\n' || c == '\r'),
      "constraintCommit: the expression must not contain tab/newline " +
        "(manifest lines are TAB-structured)")
    refuseBranched(table, "constraintCommit")
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"constraintCommit: no committed version at $table"))
    violations(read(s, table, Some(base)), Seq(expr)).foreach {
      case (e, n) => require(n == 0L,
        s"constraintCommit: $n existing row(s) violate CHECK ($e) — " +
          "a constraint the current snapshot breaks must not be declared")
    }
    publish(table, version,
      deltaLines(table, version, Seq(s"$CheckPrefix$expr"), checkpointEvery))
  }

  /** Violation counts per CHECK expression over `data`, in ONE
    * aggregate pass (`count_if((e) = false)` — NULL passes, the SQL
    * CHECK rule). */
  private def violations(data: DataFrame,
                         cs: Seq[String]): Seq[(String, Long)] =
    if (cs.isEmpty) Nil
    else {
      val row = data.selectExpr(cs.zipWithIndex.map { case (e, i) =>
        s"count_if(($e) = false) AS c$i"
      }: _*).head()
      cs.zipWithIndex.map { case (e, i) => (e, row.getLong(i)) }
    }

  /** Validate staged RELATIVE files against the CHECK constraints of
    * `asOf` — the V2 write paths' hook (executors stage, the driver
    * commits; a violating batch fails BEFORE the publish link and the
    * abort path discards the orphans). No-op when no constraint is
    * declared or the batch is empty. */
  private[graft] def enforceConstraintsOnFiles(
      s: SparkSession, table: Path, files: Seq[String],
      asOf: Option[Long], what: String): Unit = {
    val cs = asOf.map(checkConstraints(table, _)).getOrElse(Nil)
    if (cs.isEmpty || files.isEmpty) return
    violations(
      s.read.parquet(files.map(f => table.resolve(f).toString): _*), cs)
      .foreach { case (e, n) => require(n == 0L,
        s"$what: $n row(s) in this commit violate CHECK ($e) — " +
          "refused before the commit point (no partial state published)")
      }
  }

  /** The full-manifest CHECK carry for writers that stage RELATIVE
    * files (the V2 overwrite path): validate `files` against the
    * latest committed version's constraints, then return the CHECK
    * lines the new manifest must restate. Nil when the table is empty
    * or unconstrained. r15 — INSERT OVERWRITE was the one remaining
    * full-manifest writer that silently dropped a declared contract
    * (the r14 amnesia fix missed it, flagged by ADVICE). */
  private[graft] def carryChecksOnFiles(s: SparkSession, table: Path,
      files: Seq[String], what: String): Seq[String] = {
    val prior = latestVersion(table)
    val cs = prior.map(checkConstraints(table, _)).getOrElse(Nil)
    if (cs.isEmpty) Nil
    else {
      enforceConstraintsOnFiles(s, table, files, prior, what)
      cs.map(CheckPrefix + _)
    }
  }

  /** Enforce the CHECK constraints of version `asOf` against the
    * freshly-written files under `dataDir` — called by every
    * row-adding commit path between the data write and the publish
    * link, so a violating batch leaves only invisible orphans, never
    * a committed violation. Reads the files back (one pass over the
    * new files, like the stats pass) rather than recomputing the
    * caller's frame. No-op when no constraint is declared or the dir
    * holds no files (empty batch). */
  private def enforceConstraints(s: SparkSession, table: Path,
                                 dataDir: Path, asOf: Option[Long],
                                 what: String): Unit = {
    val cs = asOf.map(checkConstraints(table, _)).getOrElse(Nil)
    if (cs.isEmpty) return
    val walk = Files.walk(dataDir)
    val any = try walk.iterator().asScala.exists(p =>
      Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
    finally walk.close()
    if (!any) return
    violations(s.read.parquet(dataDir.toString), cs).foreach {
      case (e, n) => require(n == 0L,
        s"$what: $n row(s) in this commit violate CHECK ($e) — " +
          "refused before the commit point (no partial state published)")
    }
  }

  /** The per-file row counts recorded at a version: (file, rows).
    * A file committed without a ROWS line is simply absent — callers
    * deciding whether metadata can answer a count must check coverage
    * ([[graft.sources.GraftTableSource]] does). */
  def rowCounts(table: Path, version: Long): Seq[(String, Long)] =
    manifest(table, version).filter(_.startsWith(RowsPrefix)).map { line =>
      val Array(_, f, n) = line.split('\t')
      (f, n.toLong)
    }

  /** The stats columns a version's manifests declared, distinct in
    * commit order (practically a single column per table family). */
  def statsColumns(table: Path, version: Long): Seq[String] =
    manifest(table, version).collect {
      case l if l.startsWith(StatsColPrefix) =>
        l.substring(StatsColPrefix.length)
    }.distinct

  /** Parsed `(path, min, max)` DATA-file stats of a version's manifest
    * (deletion-vector and schema-mapping lines are metadata, not
    * scannable data); files committed without stats get the full-range
    * (Long.Min, Long.Max) — never skippable, always correct. */
  def statsManifest(table: Path, version: Long): Seq[(String, Long, Long)] =
    manifest(table, version).filterNot(isMetaLine).map { line =>
      line.split('\t') match {
        case Array(f, mn, mx) => (f, mn.toLong, mx.toLong)
        case Array(f) => (f, Long.MinValue, Long.MaxValue)
      }
    }

  /** Schema mappings live at a version, in commit order:
    * ("rename", from, to), ("widen", col, sqlType), or
    * ("addcol", col, sqlType). */
  def columnMappings(table: Path, version: Long): Seq[(String, String, String)] =
    manifest(table, version).collect {
      case l if l.startsWith(RenamePrefix) =>
        val Array(_, from, to) = l.split('\t'); ("rename", from, to)
      case l if l.startsWith(WidenPrefix) =>
        val Array(_, c, t) = l.split('\t'); ("widen", c, t)
      case l if l.startsWith(AddColPrefix) =>
        val Array(_, c, t) = l.split('\t'); ("addcol", c, t)
      case l if l.startsWith(DropColPrefix) =>
        ("dropcol", l.substring(DropColPrefix.length), "")
    }

  /** Every column name an ADDCOL commit EVER introduced at this table,
    * across all of history — one raw-manifest read per version, no
    * resolution. A change feed replaying from below an ADDCOL commit
    * serves pre-add files whose footers lack the column; the mapping
    * may since have been RETIRED by a compaction (head footers carry
    * the column), so gating the typed-NULL fallback on the mappings
    * still live at head would crash a history replay on getFieldIndex
    * (ADVICE r16). The union over history is the correct gate: a name
    * in it was introduced by the add-column contract at SOME version,
    * so a footer missing it is legitimate; any other missing field
    * stays a loud failure. (Checkpoint manifests restating live ADDCOL
    * lines only re-add names already collected.) */
  def historicalAddColNames(table: Path): Set[String] =
    versions(table).flatMap(v => rawManifest(table, v).collect {
      case l if l.startsWith(AddColPrefix) =>
        l.substring(AddColPrefix.length).split('\t')(0)
    }).toSet

  /** Metadata-only RENAME commit: one manifest line, zero data files
    * touched — at 100 TB a column rename must not cost a rewrite.
    * Readers apply the mapping to files written under the old name;
    * time travel below `version` still sees the old name. */
  def renameCommit(table: Path, version: Long, from: String, to: String,
                   checkpointEvery: Int = 8): Seq[String] = {
    refuseBranched(table, "renameCommit")
    require(version == 0L || deletionVectors(table, version - 1).isEmpty,
      s"renameCommit: live deletion vectors at $table — compact " +
        "(folding the DVs) first; mappings and DVs cannot coexist")
    // A transform in the LIVE WRITE SPEC derives its segments from
    // the raw column BY NAME — renaming it would brick every future
    // INSERT (the writer's schema lookup) and compaction's
    // re-derivation. Retired generations don't block (their files'
    // payloads are complete; only their conservative pruning is
    // forfeited), so the remedy — evolve the layout away first — is
    // actually satisfiable. Same dead-end guard as dropColumnCommit.
    def liveSpecTransforms(v: Long): Seq[PartTransform] =
      writePartitionLayout(table, v).map(PartTransform.parse)
        .filterNot(_.isIdentity)
    require(version == 0L ||
        !liveSpecTransforms(version - 1).exists(_.rawCol == from),
      s"renameCommit: '$from' feeds the live partition spec " +
        s"(${liveSpecTransforms(version - 1).map(_.spec)
          .mkString(", ")}) — evolve the layout away from it first")
    publish(table, version,
      deltaLines(table, version, Seq(s"$RenamePrefix$from\t$to"),
        checkpointEvery))
  }

  /** Metadata-only type-WIDENING commit (e.g. int → bigint): readers
    * cast files written under the narrow type at plan time. */
  def widenCommit(table: Path, version: Long, col: String, sqlType: String,
                  checkpointEvery: Int = 8): Seq[String] = {
    refuseBranched(table, "widenCommit")
    require(version == 0L || deletionVectors(table, version - 1).isEmpty,
      s"widenCommit: live deletion vectors at $table — compact " +
        "(folding the DVs) first; mappings and DVs cannot coexist")
    publish(table, version,
      deltaLines(table, version, Seq(s"$WidenPrefix$col\t$sqlType"),
        checkpointEvery))
  }

  /** Metadata-only ADD COLUMN commit (r16) — the most common schema
    * evolution, at the same O(1) cost as rename/widen: one manifest
    * line, zero data files touched. The column is NULLABLE by
    * construction (every pre-existing row reads as a typed NULL — a
    * NOT NULL add would instantly be violated by history, so callers
    * refuse it before reaching here); later writers see it in the
    * table schema and land real values; the next compaction
    * materializes the union and retires the mapping. Time travel
    * below `version` sees the old schema. `sqlType` must be on the
    * writer's primitive surface (long/int/double/float/boolean/
    * string) so a post-add INSERT can actually write it; the name
    * must be new — re-adding a live column refuses. */
  def addColumnCommit(s: SparkSession, table: Path, version: Long,
                      name: String, sqlType: String,
                      checkpointEvery: Int = 8): Seq[String] = {
    refuseBranched(table, "addColumnCommit")
    require(name.nonEmpty && !name.contains('\t') && !name.contains('\n'),
      s"addColumnCommit: invalid column name '$name'")
    val dt = org.apache.spark.sql.types.DataType.fromDDL(sqlType)
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.DoubleType,
        org.apache.spark.sql.types.FloatType,
        org.apache.spark.sql.types.BooleanType,
        org.apache.spark.sql.types.StringType).contains(dt),
      s"addColumnCommit: type $sqlType is outside the writer's " +
        "primitive surface (bigint/int/double/float/boolean/string)")
    // Plan-time schema only (one footer + the mapping fold) — the
    // metadata-only contract must not pay a per-file footer sweep.
    val existing = read(s, table, Some(version - 1)).schema.fieldNames
    require(!existing.exists(_.equalsIgnoreCase(name)),
      s"addColumnCommit: column '$name' already exists in " +
        s"${existing.mkString("[", ", ", "]")}")
    // Path-borne partition columns are not in the payload schema the
    // check above reads — a duplicate add would shadow them. Hidden
    // transform segments reserve their names too (r18).
    require(!partitionLayout(table, version - 1)
        .exists(_.equalsIgnoreCase(name)) &&
        !hiddenSegmentNames(table, version - 1)
          .exists(_.equalsIgnoreCase(name)),
      s"addColumnCommit: '$name' is a partition-layout column or " +
        "hidden transform segment")
    // The mirror of deleteCommit's guard: an evolution over live DVs
    // creates the same both-sides-refuse dead end.
    require(deletionVectors(table, version - 1).isEmpty,
      s"addColumnCommit: live deletion vectors at $table — compact " +
        "(folding the DVs) first; mappings and DVs cannot coexist")
    // Re-adding a name a live DROPCOL removed would resurrect the old
    // files' STALE BYTES (the reader finds the footer field and serves
    // it) — refuse until a compaction physically drops them.
    require(!columnMappings(table, version - 1)
        .exists(m => m._1 == "dropcol" && m._2.equalsIgnoreCase(name)),
      s"addColumnCommit: '$name' was dropped by a live DROPCOL " +
        "mapping — compact first so the old files' bytes are gone")
    publish(table, version,
      deltaLines(table, version, Seq(s"$AddColPrefix$name\t$sqlType"),
        checkpointEvery))
  }

  /** Metadata-only DROP COLUMN commit (r16) — one manifest line, zero
    * data files touched: readers stop serving the column immediately,
    * the bytes stay in the files until the next compaction physically
    * drops them, time travel below `version` still sees it. Refused
    * while the column is LOAD-BEARING — the table's stats column, a
    * bloom/secondary-zonemap index column, a live DV's key, a
    * partition-layout column, or referenced by a CHECK constraint —
    * and while rename/widen mappings live (they record footer-time
    * names; a drop recorded under an evolved name would miss its
    * target). Dropping the last column refuses: a table needs a
    * schema. */
  def dropColumnCommit(s: SparkSession, table: Path, version: Long,
                       name: String,
                       checkpointEvery: Int = 8): Seq[String] = {
    refuseBranched(table, "dropColumnCommit")
    val base = version - 1
    require(columnMappings(table, base).forall(m =>
        m._1 == "addcol" || m._1 == "dropcol"),
      s"dropColumnCommit: rename/widen mappings live at version $base " +
        "— compact first (they record footer-time column names)")
    val schema = read(s, table, Some(base)).schema
    require(schema.fieldNames.contains(name),
      s"dropColumnCommit: column '$name' is not in " +
        s"${schema.fieldNames.mkString("[", ", ", "]")}")
    require(schema.fieldNames.length > 1,
      s"dropColumnCommit: '$name' is the table's last column")
    require(!statsColumns(table, base).contains(name),
      s"dropColumnCommit: '$name' is the table's stats column — " +
        "compact onto another stats column first")
    require(!blooms(table, base).exists(_._2 == name) &&
        !secondaryStats(table, base).exists(_._2 == name),
      s"dropColumnCommit: '$name' carries a skipping index — compact " +
        "first")
    require(deletionVectors(table, base).isEmpty,
      s"dropColumnCommit: live deletion vectors at $table — compact " +
        "(folding the DVs) first; mappings and DVs cannot coexist")
    require(!partitionLayout(table, base).contains(name) &&
        !writePartitionLayout(table, base).contains(name),
      s"dropColumnCommit: '$name' is a partition-layout column")
    // A transform in the LIVE WRITE SPEC derives its segments from a
    // payload column — dropping the raw column would brick every
    // future INSERT. Retired generations don't block (evolve-away is
    // the documented remedy and must actually work), r18.
    require(!writePartitionLayout(table, base).map(PartTransform.parse)
        .exists(t => !t.isIdentity && t.rawCol == name),
      s"dropColumnCommit: '$name' feeds the live partition spec " +
        s"(${writePartitionLayout(table, base).mkString(", ")}) — " +
        "evolve the layout away from it first")
    // CHECK references are resolved the way Spark will resolve them:
    // parse the constraint and collect its attribute references,
    // compared case-INSENSITIVELY (Spark's resolution is — a
    // constraint written `CHECK (V >= 0)` over column `v` binds, and a
    // guard that missed it would let the drop brick every subsequent
    // write on an unresolvable-column error; ADVICE r16). Parsing also
    // stops the false refusal when the name appears only inside a
    // string literal. An unparseable constraint (none of ours are)
    // falls back to the conservative case-insensitive word regex.
    val dropLc = name.toLowerCase(java.util.Locale.ROOT)
    checkConstraints(table, base).foreach { expr =>
      val referenced: Boolean =
        try s.sessionState.sqlParser.parseExpression(expr).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        }.contains(dropLc)
        catch {
          case scala.util.control.NonFatal(_) =>
            java.util.regex.Pattern.compile(
              "\\b" + java.util.regex.Pattern.quote(name) + "\\b",
              java.util.regex.Pattern.CASE_INSENSITIVE)
              .matcher(expr).find()
        }
      require(!referenced,
        s"dropColumnCommit: '$name' is referenced by CHECK ($expr) — " +
          "drop or rewrite the constraint first")
    }
    publish(table, version,
      deltaLines(table, version, Seq(s"$DropColPrefix$name"),
        checkpointEvery))
  }

  /** The deletion vectors live at a version:
    * (dvPath, keyColumn, originVersion). The origin version scopes
    * the DV to the data files that existed when the delete committed
    * — see [[deleteCommit]]. */
  def deletionVectors(table: Path, version: Long): Seq[(String, String, Long)] =
    manifest(table, version).filter(_.startsWith(DvPrefix)).map { line =>
      val Array(_, p, keyCol, origin) = line.split('\t')
      (p, keyCol, origin.toLong)
    }

  /** MERGE-ON-READ DELETE — the cheap-delete answer of every modern
    * table format (Delta deletion vectors / Iceberg delete files):
    * instead of rewriting every data file that contains a doomed row
    * (copy-on-write — cost O(touched files), the [[transact]] shape),
    * the commit writes ONLY a tiny key-list sidecar and carries the
    * previous version's data lines BYTE-VERBATIM; readers anti-join
    * the union of live deletion vectors at plan time. Delete cost is
    * O(deleted keys) regardless of table size — at 100 TB the
    * difference between a GDPR erasure finishing in seconds or
    * rewriting terabytes. The debt is read-time (one broadcast-sized
    * anti-join per scan), repaid when a compaction commit
    * ([[transact]] or `commit`) materializes the surviving rows and
    * drops the DV lines — exactly the merge-on-read → copy-on-write
    * fold production tables schedule.
    *
    * A DV is SCOPED to the data files listed at its ORIGIN version
    * (recorded in the manifest line): a later append that re-inserts
    * a deleted key produces a file the DV does not cover, so the new
    * row SURVIVES — delete-then-reinsert behaves like every
    * sequence-numbered table format, not like an eternal tombstone
    * (the trap an unscoped key list would be). Returns the published
    * lines. */
  def deleteCommit(s: SparkSession, table: Path, version: Long,
                   keys: DataFrame, keyCol: String,
                   checkpointEvery: Int = 8): Seq[String] = {
    // Version-pinned but chain-BASED on the global latest (deltaLines
    // below) — the same interleave hazard as every version-unaware
    // writer once branch refs exist (r14, ADVICE parity with
    // mergeCommit/appendCommit).
    refuseBranched(table, "deleteCommit")
    // A DV and live schema mappings MUST NOT coexist (readLive and the
    // connector both refuse the combination) — and critically, the
    // resolution path would be bricked: compaction reads through
    // readLive, which refuses too. Refuse at COMMIT time, where the
    // user still has a working table and a working remedy.
    require(version == 0L || columnMappings(table, version - 1).isEmpty,
      s"deleteCommit: schema-evolution mappings live at $table — " +
        "compact first (a DV over a mapped version would make every " +
        "read, and the compaction that fixes it, refuse)")
    // A DV keyed on a PARTITION-LAYOUT column would poison every
    // subsequent scan: the column rides the file PATH, not the
    // payload, so the reader's per-row key lookup has no field to
    // read — the table would commit fine and then fail on read.
    // Refuse up front; a partition-valued delete is a file-level
    // operation (drop the partition's files via a rewrite commit),
    // not a row-level DV.
    require(version == 0L ||
        !partitionLayout(table, version - 1).contains(keyCol),
      s"deleteCommit: key column '$keyCol' is a partition-layout " +
        "column — its values ride file paths, not row payloads, so a " +
        "deletion vector cannot apply; drop the partition's files via " +
        "a rewrite commit instead")
    val dvDir = table.resolve("dv").resolve(
      f"v$version%06d-" + java.util.UUID.randomUUID().toString.take(8))
    writeData(keys.select(keyCol), dvDir)
    val dvLines = partFiles(table, dvDir)
      .map(p => s"$DvPrefix$p\t$keyCol\t$version")
    // A delete is additive metadata (data lines are never removed, a
    // DV line is added), so it publishes as a delta like an append.
    publish(table, version, deltaLines(table, version, dvLines, checkpointEvery))
  }

  /** MERGE (upsert) as ONE atomic merge-on-read commit — the row-level
    * `MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT` every
    * production table format serves: matched keys' old rows die, the
    * update rows (matched or new) appear, atomically. Instead of the
    * copy-on-write rewrite ([[transact]] — cost O(touched files)), the
    * commit publishes a deletion vector over the update KEYS plus the
    * update rows as ordinary data files, in a single manifest — cost
    * O(update batch), never O(table), which at 100 TB is the difference
    * between an upsert stream keeping up and falling hours behind.
    *
    * The DV's origin is pinned to the BASE version (latest at commit
    * time), so its scope covers only pre-merge files: the update rows
    * written by this same commit carry the very keys the DV lists, and
    * origin scoping is what lets them survive (the sequence-number
    * semantics [[deleteCommit]] documents, doing double duty here).
    * The read-time debt and its compaction repayment are identical to
    * a plain delete. Returns the merge's published version. */
  def mergeCommit(s: SparkSession, table: Path, updates: DataFrame,
                  keyCol: String, checkpointEvery: Int = 8): Long = {
    refuseBranched(table, "mergeCommit")
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"mergeCommit: no committed version at $table to merge into"))
    require(columnMappings(table, base).isEmpty,
      s"mergeCommit: schema-evolution mappings live at $table — " +
        "compact first (a DV over a mapped version would make every " +
        "read, and the compaction that fixes it, refuse)")
    val version = base + 1
    val dvDir = table.resolve("dv").resolve(
      f"v$version%06d-merge-" + java.util.UUID.randomUUID().toString.take(8))
    writeData(updates.select(keyCol).distinct(), dvDir)
    val dvLines = partFiles(table, dvDir)
      .map(p => s"$DvPrefix$p\t$keyCol\t$base")
    val dataDir = newDataDir(table, version)
    writeData(updates, dataDir)
    // The upsert's new rows honor CHECK constraints (deletes cannot
    // introduce a violation).
    enforceConstraints(s, table, dataDir, Some(base), "mergeCommit")
    // Index continuity (r15): the upsert's new files join the base's
    // skipping indexes (stats/ROWS/BLOOM/secondary) instead of
    // carrying unprunable plain lines until the next compaction.
    val dataLines = indexedLines(s, table, dataDir, manifest(table, base))
    publish(table, version,
      deltaLines(table, version, dvLines ++ dataLines, checkpointEvery))
    version
  }

  /** Append at a PINNED version — the streaming-sink shape (version =
    * micro-batch id, so a replayed batch's publish hits the version
    * conflict and exactly-once falls out of the commit point). Same
    * delta/checkpoint metadata cost as [[appendCommit]], without the
    * retry loop: the caller owns conflict semantics. */
  def commitAppend(s: SparkSession, table: Path, version: Long,
                   df: DataFrame, checkpointEvery: Int = 8): Seq[String] = {
    // The version is pinned but the delta BASES on the global latest —
    // the same interleave hazard as any version-unaware writer.
    refuseBranched(table, "commitAppend")
    val dataDir = newDataDir(table, version)
    writeData(df, dataDir)
    // The streaming-sink path honors CHECK constraints too: a poisoned
    // micro-batch fails its epoch before the commit point.
    enforceConstraints(s, table, dataDir, latestVersion(table),
      "commitAppend")
    publishDelta(table, version, partFiles(table, dataDir), checkpointEvery)
  }

  /** Range read with FILE-LEVEL skipping: plans over only the files
    * whose [min, max] overlaps [lo, hi], then re-applies the predicate
    * (stats prune files; they do not filter rows). Returns the frame
    * plus (filesRead, filesTotal) so callers can witness that pruning
    * actually happened. */
  def readRange(s: SparkSession, table: Path, statsCol: String,
                lo: Long, hi: Long,
                version: Option[Long] = None): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    require(columnMappings(table, v).isEmpty,
      s"readRange at version $v: schema mappings could have renamed " +
        s"'$statsCol' since the stats were recorded — use read() or " +
        "compact first")
    val all = statsManifest(table, v)
    require(all.nonEmpty,
      s"readRange at version $v of $table: the manifest lists no data files")
    val live = all.filter { case (_, mn, mx) => mx >= lo && mn <= hi }
    // Deletion vectors COMPOSE with stats pruning (r13): the DV
    // anti-join applies to the pruned file set exactly as read()
    // applies it to the full set — a DV's origin scope covers a
    // subset the same way it covers the whole, so a GDPR-erased
    // table keeps its range reads without waiting for compaction.
    val df =
      if (live.isEmpty)
        // No file can match: an empty frame with the right schema,
        // derived from ONE file's footer without reading its rows.
        s.read.parquet(table.resolve(all.head._1).toString).limit(0)
      else readLive(s, table, v, live.map(_._1))
    (df.where(col(statsCol) >= lo && col(statsCol) <= hi),
      live.size, all.size)
  }

  /** PARTITIONED commit: `partitionBy(partCol)` layout, every leaf
    * file recorded in the manifest with its partition value riding
    * the path (`…/<partCol>=<value>/part-*.parquet` — the Hive
    * convention IS the per-file partition record). Pair with
    * [[readPartitions]] for manifest-level partition pruning. */
  def commitPartitioned(s: SparkSession, table: Path, version: Long,
                        df: DataFrame, partCol: String,
                        carried: Seq[String] = Nil,
                        statsCol: Option[String] = None,
                        rowCounts: Boolean = false): Seq[String] =
    commitPartitionedMulti(s, table, version, df, Seq(partCol), carried,
      statsCol, rowCounts)

  /** [[commitPartitioned]] with SEVERAL partition columns (r16) — the
    * day-one real layout ((date, region), (lang, shard)): values nest
    * as `c1=v1/c2=v2/…` path segments in declaration order, every
    * reader parses all segments ([[readPartitions]] prunes on any of
    * them), and stats/ROWS compose per file exactly as single-column
    * layouts do. */
  def commitPartitionedMulti(s: SparkSession, table: Path, version: Long,
                             df: DataFrame, partCols: Seq[String],
                             carried: Seq[String] = Nil,
                             statsCol: Option[String] = None,
                             rowCounts: Boolean = false): Seq[String] = {
    refuseBranched(table, "commitPartitioned")
    require(partCols.nonEmpty && partCols.distinct == partCols,
      s"commitPartitioned: invalid partition columns $partCols")
    val dataDir = newDataDir(table, version)
    writeData(df, dataDir, partCols)
    val files = statsCol match {
      // Partition value in the path AND per-file min/max on the line:
      // the two orthogonal skipping mechanisms compose on one manifest
      // entry ([[readPartitionRange]] consumes both).
      case Some(c) =>
        val stats = fileColStats(s, table, dataDir, c)
        stats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" } ++
          (if (rowCounts)
             stats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
           else Nil) :+ s"$StatsColPrefix$c"
      case None =>
        // Row counts without a stats column: one footer-free count
        // pass grouped on file (the same shape as the stats pass).
        partFiles(table, dataDir) ++
          (if (rowCounts) fileRowsLines(s, table, dataDir) else Nil)
    }
    publish(table, version, carried ++ files ++
      carryChecks(s, table, version, dataDir, carried, "commitPartitioned"))
  }

  /** [[fileRowsLines]] with zero-row synthesis (`ROWS <f> 0` for
    * files the count pass never saw) — every staged file gets a line. */
  private def fileRowsLinesAll(s: SparkSession, table: Path,
                               dataDir: Path): Seq[String] = {
    val counted = fileRowsLines(s, table, dataDir)
    val seen = counted.map(_.split('\t')(1)).toSet
    (counted ++ partFiles(table, dataDir).filterNot(seen)
      .map(f => s"$RowsPrefix$f\t0")).sorted
  }

  /** Per-file `ROWS` manifest lines for every parquet file under
    * `dataDir` — one distributed count pass over the new files only. */
  private def fileRowsLines(s: SparkSession, table: Path,
                            dataDir: Path): Seq[String] = {
    import org.apache.spark.sql.functions.{count, input_file_name, lit}
    s.read.parquet(dataDir.toString)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val p = java.nio.file.Paths.get(new java.net.URI(r.getString(0)))
        s"$RowsPrefix${table.relativize(p)}\t${r.getLong(1)}"
      }.toIndexedSeq.sorted
  }

  /** Per-file `(path, min, max, rowCount)` for every parquet file under
    * `dataDir` (flat or partitioned layout — input_file_name resolves
    * leaves either way); all-NULL files fall back to the never-skippable
    * full range. One pass over the new files only; the row count rides
    * the same aggregation for free. */
  private def fileColStats(s: SparkSession, table: Path, dataDir: Path,
                           statsCol: String): Seq[(String, Long, Long, Long)] = {
    import org.apache.spark.sql.functions.{col, count, expr, input_file_name, lit, max, min}
    val df = s.read.parquet(dataDir.toString)
    // Zonemap units per column type (r19): TIMESTAMP flavors store
    // epoch MICROS (a plain CAST(ts AS LONG) would store SECONDS —
    // a floor'd max wrongly prunes sub-second probes), DATE stores
    // epoch DAYS, numerics store their long value. The scan's admits
    // coerces probe values to the same units.
    val sc = df.schema.fields.find(_.name == statsCol)
      .map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) =>
        expr(s"unix_micros(`$statsCol`)")
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // TZ-independent (r20) — see PartTransform.ntzMicrosSql: the
        // session-zone CAST route would skew zonemaps written from a
        // non-UTC session against the scan's as-if-UTC probes.
        expr(graft.operators.PartTransform.ntzMicrosSql(statsCol))
      case Some(org.apache.spark.sql.types.DateType) =>
        expr(s"unix_date(`$statsCol`)").cast("long")
      case _ => col(statsCol).cast("long")
    }
    df.groupBy(input_file_name().as("f"))
      .agg(min(sc).as("mn"),
        max(sc).as("mx"),
        count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val p = java.nio.file.Paths.get(new java.net.URI(r.getString(0)))
        val (mn, mx) =
          if (r.isNullAt(1) || r.isNullAt(2)) (Long.MinValue, Long.MaxValue)
          else (r.getLong(1), r.getLong(2))
        (table.relativize(p).toString, mn, mx, r.getLong(3))
      }.toIndexedSeq.sortBy(_._1)
  }

  private def fileStatsLines(s: SparkSession, table: Path, dataDir: Path,
                             statsCol: String): Seq[String] =
    fileColStats(s, table, dataDir, statsCol)
      .map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" }

  /** [[fileColStats]] over `dataDir` with ZERO-ROW SYNTHESIS: a
    * zero-row parquet file (a truncate/compact of an emptied table)
    * contributes no aggregation row — it gets the never-skippable full
    * range and ROWS 0, so stats-bearing manifests can always cover
    * every staged file (a data-line-less manifest is unreadable). */
  private def fileColStatsAll(s: SparkSession, table: Path, dataDir: Path,
      statsCol: String): Seq[(String, Long, Long, Long)] = {
    val st = fileColStats(s, table, dataDir, statsCol)
    val seen = st.map(_._1).toSet
    st ++ partFiles(table, dataDir).filterNot(seen).sorted
      .map(f => (f, Long.MinValue, Long.MaxValue, 0L))
  }

  /** Commit with zonemaps on SEVERAL columns: `cols.head` rides the
    * data lines (the [[commitWithStats]] layout, fully
    * backward-compatible), the rest ride `STATS` meta lines — the
    * manifest shape a Z-ORDERED write needs, where every interleaved
    * dimension's per-file range is tight and a box predicate should
    * prune on all of them at once. One distributed stats pass per
    * column over the new files only. */
  def commitMultiStats(s: SparkSession, table: Path, version: Long,
                       df: DataFrame, cols: Seq[String],
                       carried: Seq[String] = Nil): Seq[String] = {
    refuseBranched(table, "commitMultiStats")
    require(cols.nonEmpty, "commitMultiStats: at least one stats column")
    val dataDir = newDataDir(table, version)
    writeData(df, dataDir)
    val primary = fileStatsLines(s, table, dataDir, cols.head)
    val secondary = cols.tail.flatMap(c =>
      fileColStats(s, table, dataDir, c).map { case (f, mn, mx, _) =>
        s"$StatsPrefix$f\t$c\t$mn\t$mx"
      })
    val lines = (primary ++ secondary) :+ s"$StatsColPrefix${cols.head}"
    publish(table, version, carried ++ lines ++
      carryChecks(s, table, version, dataDir, carried, "commitMultiStats"))
    lines
  }

  /** The SECONDARY zonemaps at a version: (file, column, min, max). */
  def secondaryStats(table: Path,
                     version: Long): Seq[(String, String, Long, Long)] =
    manifest(table, version).filter(_.startsWith(StatsPrefix)).map { line =>
      val Array(_, f, c, mn, mx) = line.split('\t')
      (f, c, mn.toLong, mx.toLong)
    }

  /** Multi-dimensional BOX read: plans over only the files whose
    * zonemap on EVERY requested column overlaps its range (primary
    * data-line stats + secondary STATS lines; columns without stats
    * never prune), then re-applies the predicates row-level. Returns
    * (frame, filesRead, perDimAdmitted, filesTotal) — the per-dim map
    * counts files each dimension ALONE admits, so a caller can
    * witness that every dimension's pruning contributed (the point of
    * a z-order layout over a single-column sort). */
  def readBox(s: SparkSession, table: Path,
              ranges: Seq[(String, Long, Long)],
              version: Option[Long] = None)
      : (DataFrame, Int, Map[String, Int], Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(
        s"readBox: no committed version at $table"))
    val all = statsManifest(table, v)
    require(all.nonEmpty,
      s"readBox at version $v of $table: the manifest lists no data files")
    val colStats: Map[String, Map[String, (Long, Long)]] =
      (statsColumns(table, v).headOption.map(c =>
        c -> all.map { case (f, mn, mx) => f -> (mn, mx) }.toMap).toSeq ++
        secondaryStats(table, v).groupBy(_._2).map { case (c, rows) =>
          c -> rows.map(r => r._1 -> (r._3, r._4)).toMap
        }).toMap
    def admits(f: String, c: String, lo: Long, hi: Long): Boolean =
      colStats.get(c).flatMap(_.get(f)).forall { case (mn, mx) =>
        mx >= lo && mn <= hi
      }
    val files = all.map(_._1)
    val perDim = ranges.map { case (c, lo, hi) =>
      c -> files.count(admits(_, c, lo, hi))
    }.toMap
    val live = files.filter(f =>
      ranges.forall { case (c, lo, hi) => admits(f, c, lo, hi) })
    val df =
      if (live.isEmpty)
        s.read.parquet(table.resolve(files.head).toString).limit(0)
      else readLive(s, table, v, live)
    val filtered = ranges.foldLeft(df) { case (d, (c, lo, hi)) =>
      d.where(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
    (filtered, live.size, perDim, files.size)
  }

  /** Per-file `BLOOM` manifest lines for `bloomCol` over every parquet
    * file under `dataDir` — one distributed pass (map-side-combined
    * 1 KiB buffers; see [[FileBloom.agg]]), file-count-sized collect. */
  private def fileBloomLines(s: SparkSession, table: Path, dataDir: Path,
                             bloomCol: String): Seq[String] = {
    import org.apache.spark.sql.functions.{col, input_file_name, udaf}
    val bloomAgg = udaf(FileBloom.agg)
    s.read.parquet(dataDir.toString)
      .groupBy(input_file_name().as("f"))
      .agg(bloomAgg(col(bloomCol).cast("string")).as("bits"))
      .collect()
      .map { r =>
        val p = java.nio.file.Paths.get(new java.net.URI(r.getString(0)))
        val b64 = java.util.Base64.getEncoder
          .encodeToString(r.getAs[Array[Byte]]("bits"))
        s"$BloomPrefix${table.relativize(p)}\t$bloomCol\t$b64"
      }.toIndexedSeq.sorted
  }

  /** Commit with BOTH skipping indexes on the manifest: zonemap
    * min/max on `statsCol` (range pruning — needs a clustered layout
    * to bite) and a per-file bloom on `bloomCol` (equality pruning —
    * bites on ANY layout; the point-lookup answer zonemaps can't
    * give). Either column may be the other; blooms for several
    * columns would be further BLOOM lines. Readers that predate a
    * line kind ignore it — manifests stay forward-compatible. */
  def commitIndexed(s: SparkSession, table: Path, version: Long,
                    df: DataFrame, statsCol: String, bloomCol: String,
                    carried: Seq[String] = Nil): Seq[String] = {
    refuseBranched(table, "commitIndexed")
    val dataDir = newDataDir(table, version)
    writeData(df, dataDir)
    val lines = fileStatsLines(s, table, dataDir, statsCol) ++
      fileBloomLines(s, table, dataDir, bloomCol) :+
      s"$StatsColPrefix$statsCol"
    publish(table, version, carried ++ lines ++
      carryChecks(s, table, version, dataDir, carried, "commitIndexed"))
    lines
  }

  /** The bloom skipping indexes live at a version:
    * (file, column, filter bits). */
  def blooms(table: Path, version: Long): Seq[(String, String, Array[Byte])] =
    manifest(table, version).filter(_.startsWith(BloomPrefix)).map { line =>
      val Array(_, f, c, b64) = line.split('\t')
      (f, c, java.util.Base64.getDecoder.decode(b64))
    }

  /** POINT LOOKUP with bloom skipping: plans over only the files whose
    * bloom for `col` might contain `value` (files without a bloom line
    * for `col` always might), then re-applies the equality row-level.
    * Returns the frame plus (filesRead, filesTotal) so callers can
    * witness that skipping actually happened. The probe is rendered
    * with `String.valueOf`, matching the writer's CAST(col AS STRING)
    * aggregation. */
  def readEquals(s: SparkSession, table: Path, colName: String, value: Any,
                 version: Option[Long] = None): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(
        s"readEquals: no committed version at $table"))
    val all = statsManifest(table, v).map(_._1)
    require(all.nonEmpty,
      s"readEquals at version $v of $table: the manifest lists no data files")
    val probe = String.valueOf(value)
    val filters = blooms(table, v)
      .collect { case (f, c, bits) if c == colName => f -> bits }.toMap
    val live = all.filter(f =>
      filters.get(f).forall(FileBloom.mightContain(_, probe)))
    val df =
      if (live.isEmpty)
        s.read.parquet(table.resolve(all.head).toString).limit(0)
      else readLive(s, table, v, live)
    (df.where(col(colName) === lit(value)), live.size, all.size)
  }

  /** Manifest-level PARTITION PRUNING — the protocol sibling of
    * directory-listing partition pruning: the reader selects files by
    * the partition value recorded in their manifest path and plans
    * over only those, no directory listing, no non-matching file ever
    * opened. Returns (frame, filesRead, filesTotal) so callers can
    * witness the pruning, like [[readRange]]. The partition column is
    * re-attached from the manifest value (partitionBy strips it from
    * the file payload), typed string — cast downstream if needed. */
  def readPartitions(s: SparkSession, table: Path, partCol: String,
                     values: Seq[String],
                     version: Option[Long] = None): (DataFrame, Int, Int) = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val all = statsManifest(table, v).map(_._1)
    require(all.nonEmpty,
      s"readPartitions at version $v of $table: no data files")
    def valueOf(f: String): Option[String] =
      f.split('/').collectFirst {
        case seg if seg.startsWith(partCol + "=") =>
          // partitionBy escapes path-hostile characters; decode so the
          // manifest value compares against the logical one.
          java.net.URLDecoder.decode(seg.substring(partCol.length + 1),
            "UTF-8")
      }
    val byValue = all.flatMap(f => valueOf(f).map(_ -> f))
    require(byValue.size == all.size,
      s"readPartitions at version $v: some files carry no " +
        s"$partCol= path segment — commit them via commitPartitioned")
    val want = values.toSet
    val live = byValue.filter { case (value, _) => want.contains(value) }
    require(live.nonEmpty,
      s"readPartitions at version $v: no files match $partCol in $values")
    (readPartitionedFiles(s, table, partCol, live.map(_._2),
      asOf = Some(v)), live.size, all.size)
  }

  /** Plan a read over partitioned-layout manifest files: one scan per
    * COMMIT DIR (basePath recovers the partition column from the
    * `col=value` path segments), not per value — union legs scale with
    * the handful of commits, never with partition-value cardinality.
    * The column is pinned to string so the read schema doesn't depend
    * on what partition inference guesses per dir. */
  private def readPartitionedFiles(s: SparkSession, table: Path,
                                   partCol: String, files: Seq[String],
                                   asOf: Option[Long] = None): DataFrame =
    readMultiPartitionedFiles(s, table, Seq(partCol), files, asOf)

  private def readMultiPartitionedFiles(s: SparkSession, table: Path,
                                        partCols: Seq[String],
                                        files: Seq[String],
                                        asOf: Option[Long] = None)
      : DataFrame = {
    // HIDDEN transform segments (r18) also surface through path
    // discovery — drop them: the raw column rides the payload, so the
    // derived segment is redundant AND ragged across generations
    // (a days-spec group would union 4 columns against an identity
    // group's 3). Hidden names are resolved AT THE VERSION BEING READ
    // (default latest): a column that was real payload at an older
    // version and only later became a derived segment name
    // (drop-then-evolve) must survive that older version's read.
    val hidden = asOf.orElse(latestVersion(table))
      .map(hiddenSegmentNames(table, _)).getOrElse(Set.empty)
    files
      .groupBy(f => f.split('/').take(2).mkString("/"))
      .toSeq.sortBy(_._1)
      .map { case (dataDir, fs) =>
        val raw = s.read.option("basePath", table.resolve(dataDir).toString)
          .parquet(fs.map(f => table.resolve(f).toString): _*)
        val part = hidden.foldLeft(raw)((d, h) => d.drop(h))
        // Each group's partition columns come from path discovery;
        // a flat group (the DDL bootstrap) carries them in its payload
        // instead, and a column absent from both is a typed NULL
        // (zero-row groups only, by construction).
        partCols.foldLeft(part)((d, pc) =>
          if (d.columns.contains(pc)) d.withColumn(pc, d(pc).cast("string"))
          else d.withColumn(pc,
            org.apache.spark.sql.functions.lit(null).cast("string")))
      }
      .reduce(_.unionByName(_, allowMissingColumns = false))
  }

  /** PARTITION PRUNING × STATS SKIPPING in one read — the two
    * orthogonal manifest mechanisms composed, exactly as production
    * formats compose partition predicates with file-level zonemaps:
    * files are first selected by partition VALUE (path segment), then
    * by [min, max] overlap with [lo, hi] on the line's stats, and only
    * the doubly-surviving files are opened (the row predicate still
    * filters — stats prune files, never rows). Returns
    * (frame, filesRead, filesAfterPartitionPrune, filesTotal) so
    * callers can witness EACH pruning stage independently. */
  def readPartitionRange(s: SparkSession, table: Path, partCol: String,
                         values: Seq[String], statsCol: String,
                         lo: Long, hi: Long, version: Option[Long] = None)
      : (DataFrame, Int, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    require(columnMappings(table, v).isEmpty,
      s"readPartitionRange at version $v: schema mappings could have " +
        s"renamed '$statsCol' — use read() or compact first")
    val all = statsManifest(table, v)
    require(all.nonEmpty,
      s"readPartitionRange at version $v of $table: no data files")
    val want = values.toSet
    val part = all.filter { case (f, _, _) =>
      f.split('/').exists { seg =>
        seg.startsWith(partCol + "=") &&
          want.contains(java.net.URLDecoder.decode(
            seg.substring(partCol.length + 1), "UTF-8"))
      }
    }
    require(part.nonEmpty,
      s"readPartitionRange at version $v: no files match $partCol in $values")
    val live = part.filter { case (_, mn, mx) => mx >= lo && mn <= hi }
    val df =
      if (live.isEmpty)
        readPartitionedFiles(s, table, partCol, Seq(part.head._1),
          asOf = Some(v)).limit(0)
      else readPartitionedFiles(s, table, partCol, live.map(_._1),
        asOf = Some(v))
    (df.where(col(statsCol) >= lo && col(statsCol) <= hi),
      live.size, part.size, all.size)
  }

  /** VACUUM: expire every version below `keepFrom` and delete the data
    * files nothing retained references — the reclamation half of the
    * protocol (old snapshots and crashed-attempt orphans accumulate
    * forever otherwise). Safety is purely set arithmetic: a file
    * survives iff SOME manifest ≥ `keepFrom` lists it, so files
    * carried forward across an expired boundary (append commits)
    * survive, while files referenced only by expired versions — and
    * orphans referenced by nothing — are removed. Expired manifests
    * are deleted LAST: a crash mid-vacuum leaves extra files (safe,
    * invisible), never a manifest pointing at deleted data. Returns
    * (filesDeleted, versionsExpired).
    *
    * `orphanGraceMs` (r20, the Iceberg remove-orphan-files guard): a
    * file referenced by SOME manifest — even an expired one — was
    * PUBLISHED, so deleting it once no retained version lists it is
    * always safe. A file referenced by NO manifest at all may instead
    * be an IN-FLIGHT writer's staging (executors stage data files
    * BEFORE the driver's publish link) — vacuuming it would break the
    * commit about to reference it. With a positive grace, such
    * never-referenced orphans only delete once their mtime is older
    * than the grace window; 0 (the programmatic default) keeps the
    * immediate sweep for single-writer callers. The SQL CALL face
    * defaults to one hour — scheduled maintenance must assume
    * concurrent writers. */
  def expire(table: Path, keepFrom: Long,
             orphanGraceMs: Long = 0L): (Int, Int) = {
    val all = versions(table)
    val (dead, live) = all.partition(_ < keepFrom)
    require(live.nonEmpty,
      s"expire(keepFrom=$keepFrom) would delete every version of $table")
    // PIN the manifests a live version's resolution still needs: its
    // BASE chain (delta manifests splice ancestors' lines in) and
    // every live DV's ORIGIN (read() resolves a DV's file scope via
    // statsManifest(origin)). A pinned dead manifest stays on disk as
    // a chain/scope anchor; its files are reclaimed like any other
    // unreferenced file, so pinning never retains data.
    val pinned = scala.collection.mutable.Set[Long]()
    def visit(v: Long): Unit = if (pinned.add(v)) {
      rawManifest(table, v).headOption
        .filter(_.startsWith(BasePrefix))
        .foreach(h => visit(h.stripPrefix(BasePrefix).trim.toLong))
      deletionVectors(table, v).map(_._3).foreach(visit)
    }
    // Ref heads (tags, branch tips) are ROOTS like live versions: a
    // release tag pinned at version 2 must survive an expire(keepFrom=
    // 10) — exactly the ref-retention rule production formats apply.
    val anchors = live ++ refs(table).map(_._3).filterNot(live.contains)
    anchors.foreach(visit)
    // Deletion-vector sidecars are referenced files like any other: a
    // DV listed by a retained version must survive, one referenced
    // only by expired versions is reclaimable.
    val referenced = anchors.flatMap(v =>
      statsManifest(table, v).map(_._1) ++
        deletionVectors(table, v).map(_._1)).toSet
    // Published-somewhere set for the orphan-grace split — resolved
    // only when a grace is in force (it reads every dead manifest).
    lazy val everReferenced: Set[String] = all.flatMap(v =>
      statsManifest(table, v).map(_._1) ++
        deletionVectors(table, v).map(_._1)).toSet
    val now = System.currentTimeMillis()
    var deleted = 0
    for (root <- Seq(table.resolve("data"), table.resolve("dv"))
         if Files.isDirectory(root)) {
      val walk = Files.walk(root)
      // Only PAYLOAD files are vacuum candidates: manifests list only
      // *.parquet, so an unrestricted sweep would delete _SUCCESS/.crc
      // write-sidecars inside LIVE versions' data dirs.
      try walk.iterator().asScala
        .filter { p =>
          Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet") &&
          !referenced.contains(table.relativize(p).toString) &&
          (orphanGraceMs <= 0L ||
            everReferenced.contains(table.relativize(p).toString) ||
            now - Files.getLastModifiedTime(p).toMillis >= orphanGraceMs)
        }
        .foreach { p => Files.delete(p); deleted += 1 }
      finally walk.close()
    }
    val removable = dead.filterNot(pinned)
    removable.foreach(v =>
      Files.deleteIfExists(commitsDir(table).resolve(manifestName(v))))
    (deleted, removable.size)
  }

  /** Result of an optimistic commit: the version that finally
    * published and how many conflicts (lost races) were absorbed on
    * the way — callers witness the concurrency path actually ran. */
  final case class Committed(version: Long, conflicts: Int)

  /** Blind APPEND with optimistic concurrency — the cheap half of a
    * multi-writer protocol. Data files are written exactly ONCE (an
    * append's content does not depend on the snapshot it lands on);
    * only the manifest publish retries: each attempt re-resolves the
    * latest version and carries ITS file list plus the already-written
    * new files, so losing a race costs one tiny metadata round,
    * never a data rewrite. This is why real table formats classify
    * appends as auto-rebaseable: they commute with any concurrent
    * commit, so conflict resolution is mechanical re-carry.
    *
    * `beforeAttempt(targetVersion)` fires after the attempt's target
    * version is resolved and before its publish — the race-injection
    * seam (a test/witness commits the target version inside it,
    * forcing the real FileAlreadyExistsException conflict path;
    * production passes the default no-op). Same design stance as
    * [[failedCommit]]: the failure paths must be drivable, not just
    * argued about. */
  def appendCommit(s: SparkSession, table: Path, df: DataFrame,
                   maxAttempts: Int = 10,
                   beforeAttempt: Long => Unit = _ => (),
                   checkpointEvery: Int = 8): Committed = {
    refuseBranched(table, "appendCommit")
    val dataDir = table.resolve("data").resolve(
      "append-" + java.util.UUID.randomUUID().toString.take(8))
    writeData(df, dataDir)
    // CHECK constraints gate the batch BEFORE any publish attempt — a
    // violating batch leaves only invisible orphans. Validated against
    // the latest snapshot's declarations at call time (a concurrently
    // ADDED constraint races like any metadata; the winner's declare
    // already validated the whole table, which includes nothing of
    // ours until our publish succeeds).
    enforceConstraints(s, table, dataDir, latestVersion(table),
      "appendCommit")
    // Index continuity (r15): the appended files join the base's
    // skipping indexes instead of degrading them — stats/ROWS/BLOOM/
    // secondary lines matching the base's shape (plain lines on an
    // unindexed table, as before).
    val mine = latestVersion(table) match {
      case Some(v) => indexedLines(s, table, dataDir, manifest(table, v))
      case None => partFiles(table, dataDir)
    }
    var conflicts = 0
    while (conflicts < maxAttempts) {
      val target = latestVersion(table).getOrElse(
        throw new IllegalArgumentException(
          s"appendCommit: no committed version at $table to append to")) + 1
      beforeAttempt(target)
      try {
        publish(table, target, deltaLines(table, target, mine, checkpointEvery))
        return Committed(target, conflicts)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => conflicts += 1
      }
    }
    throw new IllegalStateException(
      s"appendCommit: lost $maxAttempts straight races at $table")
  }

  /** Publish ALREADY-STAGED files as an O(batch) delta commit at a
    * pinned version — the V2 write path's commit point (executors
    * staged the files; this is the driver-side putIfAbsent). Bases on
    * the LATEST committed version, not version−1: sink version
    * numbering is sparse (empty micro-batches publish nothing), and a
    * delta chain needs some committed ancestor, not a dense one. Same
    * conflict semantics as [[publish]]: the caller owns retries. */
  def publishDelta(table: Path, version: Long, files: Seq[String],
                   checkpointEvery: Int = 8): Seq[String] = {
    val lines = latestVersion(table) match {
      case None => files
      case Some(base) =>
        require(base < version,
          s"publishDelta: version $version is not beyond latest $base")
        if (chainLength(table, base) + 1 > checkpointEvery)
          manifest(table, base) ++ files
        else (BasePrefix + base) +: files
    }
    publish(table, version, lines)
  }

  /** The manifest body for an additive commit of `added` at `target`:
    * a 1+|added|-line DELTA against target−1 (metadata cost tracks the
    * commit, not the table), unless the resolution chain would exceed
    * `checkpointEvery` files — then the full list is materialized (a
    * CHECKPOINT, bounding every future read's chain walk). */
  private def deltaLines(table: Path, target: Long, added: Seq[String],
                         checkpointEvery: Int): Seq[String] =
    if (target == 0L) added
    else if (chainLength(table, target - 1) + 1 > checkpointEvery)
      manifest(table, target - 1) ++ added
    else (BasePrefix + (target - 1)) +: added

  /** General optimistic TRANSACTION — the copy-on-write half: `op`
    * reads the snapshot at the latest version and returns the full
    * new table contents (a MERGE/UPDATE shape). On a publish conflict
    * the transaction REBASES: it re-runs `op` against the winner's
    * snapshot and tries again — the semantics every optimistic table
    * format gives UPDATE/MERGE (serializable as long as `op` is a
    * function of the snapshot). Each attempt writes its own data dir;
    * a lost attempt's files are orphans, invisible by construction
    * and reclaimed by [[expire]].
    *
    * Fixture-scale note: `op` here returns the WHOLE table (full
    * rewrite per attempt). Production narrows the rewrite to touched
    * files exactly as `pipe_cdf` prices it — the retry protocol is
    * unchanged, only `carried` becomes the untouched-file list. */
  def transact(s: SparkSession, table: Path,
               op: DataFrame => DataFrame,
               maxAttempts: Int = 5,
               beforeAttempt: Long => Unit = _ => ()): Committed = {
    refuseBranched(table, "transact")
    var conflicts = 0
    while (conflicts < maxAttempts) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalArgumentException(
          s"transact: no committed version at $table"))
      val out = op(read(s, table, Some(base)))
      val dataDir = newDataDir(table, base + 1)
      writeData(out, dataDir)
      // A transaction's full rewrite carries the table's CHECK
      // contract forward AND honors it (r14, was silent amnesia):
      // `op` must not be the path that smuggles a violation in, and a
      // declared safety gate must survive the rewrite — the
      // compactCommit discipline applied to the other full-manifest
      // writer. Validated per attempt against the attempt's own base.
      enforceConstraints(s, table, dataDir, Some(base), "transact")
      val checks = checkConstraints(table, base).map(CheckPrefix + _)
      beforeAttempt(base + 1)
      try {
        publish(table, base + 1, partFiles(table, dataDir) ++ checks)
        return Committed(base + 1, conflicts)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => conflicts += 1
      }
    }
    throw new IllegalStateException(
      s"transact: lost $maxAttempts straight races at $table")
  }

  /** The data file a meta line describes, if it describes one —
    * BLOOM/STATS/ROWS lines index a specific file and must die with it
    * when a rewrite replaces that file; STATSCOL/RENAME/WIDEN lines
    * describe the table and survive; DV lines reference dv/ sidecars,
    * never data files. */
  private def metaFile(line: String): Option[String] =
    if (line.startsWith(BloomPrefix) || line.startsWith(StatsPrefix) ||
        line.startsWith(RowsPrefix)) Some(line.split('\t')(1))
    else None

  /** Row-level UPDATE as a STATS-PRUNED copy-on-write commit — the
    * `UPDATE … WHERE statsCol BETWEEN lo AND hi SET …` every production
    * format serves by rewriting ONLY the files the predicate can touch:
    * the manifest zonemaps locate the overlapping files (the same
    * pruning [[readRange]] reads with), those files are rewritten with
    * `set` applied to matching rows (non-matching rows in a touched
    * file are carried through the rewrite byte-equal in value — file
    * granularity is the unit of copy-on-write), and every untouched
    * file's manifest line is carried BYTE-VERBATIM. Cost is O(files
    * overlapping the predicate), never O(table) — at 100 TB, an update
    * to last week's partition must not rewrite three years of history.
    *
    * `set` entries are (column, SQL expression) applied in order (a
    * later expression sees earlier updates, the multi-assignment SQL
    * rule). Stats (and ROWS lines, if the base version recorded any)
    * are recomputed for the new files in the one commit-time pass;
    * BLOOM/STATS meta lines indexing a rewritten file are dropped —
    * a stale skipping index on fresh data would prune wrongly.
    * METADATA is O(commit) too: the manifest is an RM delta (BASE +
    * `RM\t<touched>` + the new lines — the Delta add+remove-actions
    * shape), with the usual checkpoint cadence bounding the chain;
    * [[removedLines]] reports the removals, so the change feed refuses
    * the version exactly as it refuses any rewrite.
    * DV-bearing or schema-mapped versions are refused: compact first.
    * Returns (publishedVersion, filesRewritten, filesTotal); an update
    * whose range no file overlaps is a no-op returning the base
    * version with zero rewrites (nothing to publish). */
  def updateWhere(s: SparkSession, table: Path, statsCol: String,
                  lo: Long, hi: Long,
                  set: Seq[(String, String)],
                  checkpointEvery: Int = 8): (Long, Int, Int) = {
    import org.apache.spark.sql.functions.{col, expr, when}
    refuseBranched(table, "updateWhere")
    require(set.nonEmpty, "updateWhere: no SET assignments")
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"updateWhere: no committed version at $table"))
    require(columnMappings(table, base).isEmpty,
      s"updateWhere at version $base: schema mappings could have renamed " +
        s"'$statsCol' since the stats were recorded — compact first")
    require(deletionVectors(table, base).isEmpty,
      s"updateWhere at version $base: live deletion vectors — compact " +
        "(fold the DVs into data) before a copy-on-write update")
    // Hive-partitioned layout: the partition column lives ONLY in the
    // manifest paths — a raw-leaf rewrite would silently drop it from
    // the rewritten rows. Refuse, like the DV/mapping gates above;
    // compactCommit (partition-aware since r14) is the resolution.
    require(partitionLayout(table, base).isEmpty,
      s"updateWhere at version $base: partition-layout files " +
        "(col=value path segments) — their partition column is not in " +
        "the payload and a rewrite would drop it; compact first")
    val all = statsManifest(table, base)
    require(all.nonEmpty,
      s"updateWhere at version $base of $table: no data files")
    val touched = all.collect {
      case (f, mn, mx) if mx >= lo && mn <= hi => f
    }.toSet
    if (touched.isEmpty) return (base, 0, all.size)
    val version = base + 1
    val dataDir = newDataDir(table, version)
    val hit = col(statsCol) >= lo && col(statsCol) <= hi
    val updated = set.foldLeft(
      s.read.parquet(touched.toSeq.sorted
        .map(f => table.resolve(f).toString): _*)) {
      case (d, (c, e)) => d.withColumn(c, when(hit, expr(e)).otherwise(col(c)))
    }
    // TRANSFORM layouts (r18): replacement files land UNDER the live
    // write spec (segments re-derived from the rewritten rows — a SET
    // on the raw column re-routes correctly), so a copy-on-write
    // update never degrades hidden-partition pruning. Identity-layout
    // files are refused above (their column is path-only); a transform
    // file's payload is complete, so the rewrite is information-safe
    // either way.
    val writeCols = writePartitionLayout(table, base)
    if (writeCols.nonEmpty) writeUnderSpec(updated, writeCols, dataDir)
    else writeData(updated, dataDir)
    // The rewritten rows honor CHECK constraints — an UPDATE must not
    // be the path that smuggles a violation in.
    enforceConstraints(s, table, dataDir, Some(base), "updateWhere")
    val stats = fileColStats(s, table, dataDir, statsCol)
    val newLines = stats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" }
    val baseLines = manifest(table, base)
    val rowsLines =
      if (baseLines.exists(_.startsWith(RowsPrefix)))
        stats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
      else Nil
    // INDEX MAINTENANCE (r15, the replaceFilesCommit discipline): when
    // the touched files carried BLOOM or secondary-zonemap lines,
    // recompute them for the rewritten files in the same commit-time
    // window — an UPDATE must not degrade point-lookup or box-read
    // pruning until the next compaction.
    val indexLines = {
      val bloomCols = blooms(table, base)
        .collect { case (f, c, _) if touched.contains(f) => c }.distinct
      val secCols = secondaryStats(table, base)
        .collect { case (f, c, _, _) if touched.contains(f) => c }
        .distinct
      bloomCols.flatMap(c => fileBloomLines(s, table, dataDir, c)) ++
        secCols.flatMap(c =>
          fileColStats(s, table, dataDir, c).map {
            case (f, mn, mx, _) => s"$StatsPrefix$f\t$c\t$mn\t$mx"
          })
    }
    // O(commit) metadata (r13): BASE + RM(touched) + the new lines —
    // at a 10⁶-file table an update touching 3 files writes 7 manifest
    // lines, not the full list. Resolution drops the RM'd data lines
    // and their indexing meta lines; every `checkpointEvery`-th commit
    // still materializes the full list (carried byte-verbatim + new),
    // bounding the chain exactly as appends do.
    // KIND=update annotates the commit for the change feed: its RM'd
    // files replay as update_preimage rows, its new files as
    // update_postimage — a mirror applies the pair instead of
    // full-restarting. Stripped at resolution (never carried).
    val added =
      newLines ++ rowsLines ++ indexLines :+ s"${KindPrefix}update"
    val lines =
      if (chainLength(table, base) + 1 > checkpointEvery)
        baseLines.filter { line =>
          if (isMetaLine(line)) metaFile(line).forall(!touched.contains(_))
          else !touched.contains(line.split('\t').head)
        } ++ added
      else (BasePrefix + base) +:
        (touched.toSeq.sorted.map(RmPrefix + _) ++ added)
    publish(table, version, lines)
    (version, touched.size, all.size)
  }

  /** GROUP-REPLACEMENT COMMIT (r15) — the commit point of the SQL
    * row-level DML path ([[graft.sources.GraftTable]] as
    * `SupportsRowLevelOperations`): Spark's group-based rewrite read
    * version `base`, planned `replaced` (the files whose groups the
    * statement touches — the operation scan's zonemap/bloom pruning
    * already narrowed them when the condition allowed), executors
    * staged the replacement rows as `staged`, and this publishes
    * base+1 with `replaced` swapped for `staged` — RM-delta when a
    * subset survives (O(commit) metadata, the [[updateWhere]] shape),
    * a fresh full manifest when the statement rewrote every file.
    *
    * Contract inherited from the scan: staged rows are the replaced
    * files' LIVE rows post-statement (deletion vectors were applied
    * inside the scan, so a full replacement folds them away; a subset
    * replacement leaves the DV lines live for the untouched files
    * they still scope to). Stats and ROWS lines are recomputed for the
    * staged files when the base manifest declares them; CHECK
    * constraints validate the staged files and carry into a full
    * manifest. KIND=update annotates the commit — a SQL UPDATE, MERGE
    * or rewrite-shaped DELETE all replay through the change feed as
    * update_preimage/update_postimage pairs.
    *
    * Optimistic concurrency, detect-and-refuse: the staged rows are a
    * function of `base`'s snapshot, so unlike an append a lost race
    * cannot be replayed by this layer — if the table moved past
    * `base`, or the publish itself collides, the statement fails with
    * the re-run instruction (the serializable-conflict answer every
    * optimistic format gives UPDATE/MERGE). */
  def replaceFilesCommit(s: SparkSession, table: Path, base: Long,
                         replaced: Seq[String], staged: Seq[String],
                         what: String, checkpointEvery: Int = 8,
                         truncate: Boolean = false): Long = {
    refuseBranched(table, what)
    val latest = latestVersion(table)
    require(latest.contains(base),
      s"$what: the statement read version $base but the table is now " +
        s"at ${latest.fold("<empty>")(_.toString)} — concurrent commit; " +
        "re-run the statement against the new snapshot")
    // ADDCOL/DROPCOL mappings compose with a rewrite (r16): the
    // operation scan already serves the evolved schema (NULLs for
    // missing added columns, dropped columns omitted), so the staged
    // files carry the evolved schema physically; untouched files keep
    // reading through the mapping, and a FULL rewrite materializes it
    // (the from-scratch manifest drops the line — correctly, the new
    // files embody it). RENAME/WIDEN still wait for compaction: they
    // record footer-time names the partial rewrite would half-apply.
    require(columnMappings(table, base).forall(m =>
        m._1 == "addcol" || m._1 == "dropcol"),
      s"$what at version $base: rename/widen schema mappings live — " +
        "compact first (the scan refuses these too)")
    // A partial rewrite of a partition layout would read raw leaves
    // and drop the path-borne partition columns — refuse. TRUNCATE is
    // the exception: it reads NOTHING (the staged zero-row file
    // carries the full schema incl. the partition columns, the DDL
    // bootstrap shape) and the declared layout is restated below.
    require(truncate || partitionLayout(table, base).isEmpty,
      s"$what at version $base: partition-layout files (col=value " +
        "path segments) — their partition column is not in the payload " +
        "and a rewrite would drop it; compact first")
    val all = statsManifest(table, base).map(_._1)
    val touched = replaced.toSet
    require(touched.subsetOf(all.toSet),
      s"$what: replaced files ${touched -- all.toSet} are not in " +
        s"version $base's manifest")
    val version = base + 1
    // A statement that touched nothing (condition pruned every group)
    // publishes nothing — the no-op discipline of updateWhere.
    if (touched.isEmpty && staged.isEmpty) return base
    // A statement that deletes EVERY row would publish a manifest with
    // no data lines — unreadable (the first footer is the schema
    // source) and almost never what was meant. Refuse with the
    // alternatives instead of bricking the table.
    require(staged.nonEmpty || touched != all.toSet,
      s"$what: the statement removes every row of $table — a table " +
        "needs at least one data file (its schema source); DROP the " +
        "table, or DELETE by key (a deletion-vector commit keeps the " +
        "files), or overwrite with replacement rows")
    enforceConstraintsOnFiles(s, table, staged, Some(base), what)
    val baseLines = manifest(table, base)
    val statsColOpt = statsColumns(table, base).headOption
    val hadRows = baseLines.exists(_.startsWith(RowsPrefix))
    // Staged files share one staging dir (the V2 writer's namespace) —
    // stats/ROWS recompute in one pass over the new files only.
    val dataDir = staged.headOption
      .map(f => table.resolve(f).getParent).orNull
    val stagedStats = statsColOpt match {
      case Some(c) if staged.nonEmpty =>
        val st = fileColStats(s, table, dataDir, c)
        // Orphans (a zombie attempt's leftovers in the staging dir)
        // must never be committed: every aggregated file must be one
        // the write actually staged.
        require(st.map(_._1).toSet.subsetOf(staged.toSet),
          s"$what: staging dir $dataDir holds files the write did not " +
            s"commit (${st.map(_._1).toSet -- staged.toSet})")
        // The reverse gap is legitimate: a ZERO-ROW staged file
        // (TRUNCATE's schema-carrying empty file) contributes no
        // aggregation row — synthesize the never-skippable full range
        // and ROWS 0 so stats-bearing tables can truncate too.
        val aggregated = st.map(_._1).toSet
        st ++ staged.filterNot(aggregated).sorted
          .map(f => (f, Long.MinValue, Long.MaxValue, 0L))
      case _ => Nil
    }
    val stagedLines =
      if (statsColOpt.isDefined && staged.nonEmpty)
        stagedStats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" }
      else staged
    val rowsLines =
      if (!hadRows || staged.isEmpty) Nil
      else if (statsColOpt.isDefined)
        stagedStats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
      else fileRowsLines(s, table, dataDir)
    // INDEX MAINTENANCE (r15): a DML rewrite must not silently degrade
    // the skipping indexes — when the replaced files carried BLOOM or
    // secondary-zonemap STATS lines, recompute them for the staged
    // files in the same commit-time window (one aggregation per
    // indexed column over the NEW files only, the commitIndexed cost
    // discipline). Untouched files' index lines carry as before, so a
    // point lookup prunes exactly as well after an UPDATE as before.
    val indexLines =
      if (staged.isEmpty) Nil
      else {
        val bloomCols = blooms(table, base)
          .collect { case (f, c, _) if touched.contains(f) => c }.distinct
        val secCols = secondaryStats(table, base)
          .collect { case (f, c, _, _) if touched.contains(f) => c }
          .distinct
        bloomCols.flatMap(c => fileBloomLines(s, table, dataDir, c)) ++
          secCols.flatMap(c =>
            fileColStats(s, table, dataDir, c).map {
              case (f, mn, mx, _) => s"$StatsPrefix$f\t$c\t$mn\t$mx"
            })
      }
    val added =
      stagedLines ++ rowsLines ++ indexLines :+ s"${KindPrefix}update"
    val lines =
      if (touched == all.toSet)
        // Full rewrite: a from-scratch snapshot — DVs folded away by
        // the scan, CHECK, STATSCOL and the declared partition layout
        // carried (the compactCommit amnesia rule), indexes recomputed
        // above.
        stagedLines ++ rowsLines ++ indexLines ++
          checkConstraints(table, base).map(CheckPrefix + _) ++
          statsColOpt.map(StatsColPrefix + _).toSeq ++
          declaredPartitionCols(table, base).map(PartColPrefix + _) ++
          partSpecLines(table, base) :+
          s"${KindPrefix}update"
      else if (chainLength(table, base) + 1 > checkpointEvery)
        baseLines.filter { line =>
          if (isMetaLine(line)) metaFile(line).forall(!touched.contains(_))
          else !touched.contains(line.split('\t').head)
        } ++ added
      else (BasePrefix + base) +:
        (replaced.sorted.map(RmPrefix + _) ++ added)
    try publish(table, version, lines)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"$what: version $version was committed concurrently — the " +
            "staged rows derive from the superseded snapshot; re-run " +
            "the statement")
    }
    version
  }

  /** COMPACTION WITHOUT METADATA AMNESIA — the merge-on-read →
    * copy-on-write fold as a first-class commit: reads the latest
    * snapshot (deletion vectors folded away, schema mappings
    * MATERIALIZED into the current names/types — this is the "compact
    * first" resolution every mapped-version refusal points at),
    * rewrites it into `files` right-sized files (range-clustered on
    * `statsCol` when given, so the fresh zonemaps have teeth), and
    * publishes a FULL manifest that: recomputes per-file stats + ROWS
    * (ROWS iff the base recorded any), re-declares STATSCOL,
    * RECOMPUTES the bloom and secondary-zonemap indexes the base
    * carried (r15 — pruning must not degrade through maintenance), and
    * CARRIES the CHECK constraints forward — compaction must not be
    * the path that silently drops a table's contract (raw
    * `commit`-as-compaction does, documented on [[constraintCommit]]).
    * Cost O(live rows), the price of any compaction. Returns the
    * published version. */
  def compactCommit(s: SparkSession, table: Path,
                    statsCol: Option[String] = None,
                    files: Int = 4): Long = {
    import org.apache.spark.sql.functions.col
    refuseBranched(table, "compactCommit")
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"compactCommit: no committed version at $table"))
    val version = base + 1
    // Hive-partitioned layout (r14, was silent corruption; r16:
    // multi-column): the partition columns live only in the manifest
    // paths, so the rewrite re-attaches them from those paths
    // (partition discovery per writer directory) and writes
    // partitionBy on the full layout — layout, pruning, and the
    // columns all survive the compaction. No DVs/mappings in the mix
    // (the flat path composes those; partitioned commits never carry
    // them today — refuse rather than guess), and RAGGED layouts
    // refuse below.
    val partCols = partitionLayout(table, base)
    // PARTITION-SPEC EVOLUTION (r17): reads re-attach every file's
    // path-borne columns under the file's OWN spec (the union layout),
    // but the REWRITE lands under the LIVE spec — compaction is the
    // maintenance verb that un-rags an evolved table.
    val writeCols = writePartitionLayout(table, base)
    val evolved = partitionSpecs(table, base).nonEmpty
    val dataDir = newDataDir(table, version)
    val hadRows = manifest(table, base).exists(_.startsWith(RowsPrefix))
    val lines = partCols.headOption match {
      case Some(_) =>
        require(deletionVectors(table, base).isEmpty &&
            columnMappings(table, base).isEmpty,
          s"compactCommit at version $base: partition-layout files " +
            "combined with deletion vectors or schema mappings — " +
            "unsupported composition")
        // A healthy NON-EVOLVED layout is UNIFORM: every data file
        // carries every layout column's segment (the flat zero-row DDL
        // bootstrap is the one exception). A RAGGED mix — files
        // partitioned on different column sets — has no faithful
        // rewrite under ONE declared layout (partitionBy would
        // materialize NULL segments); refuse rather than guess. An
        // EVOLVED table is legitimately ragged (each file under its
        // generation's spec); there the check relaxes to "every
        // segment column is a known layout column" and the rewrite
        // below un-rags under the live spec.
        val declared = declaredPartitionCols(table, base)
        statsManifest(table, base).map(_._1).foreach { f =>
          val fileCols = f.split('/').dropRight(1).collect {
            case seg if seg.contains('=') =>
              seg.substring(0, seg.indexOf('='))
          }.toSet
          if (evolved)
            require(fileCols.subsetOf(partCols.toSet ++
                hiddenSegmentNames(table, base)),
              s"compactCommit at version $base: file $f carries " +
                s"partition segments $fileCols outside the table's " +
                s"known layout columns $partCols")
          else
            require(fileCols == partCols.toSet ||
                (fileCols.isEmpty && declared.nonEmpty),
              s"compactCommit at version $base: file $f carries " +
                s"partition segments $fileCols but the table layout is " +
                s"$partCols — ragged layouts refuse")
        }
        val snap = readMultiPartitionedFiles(s, table, partCols,
          statsManifest(table, base).map(_._1), asOf = Some(base))
        // A ZERO-ROW snapshot (a truncated/emptied partitioned table)
        // must not flow through dynamic partitionBy — with no rows it
        // writes NO files at all, and the published manifest would
        // list no data lines (an unreadable table). Fall back to the
        // flat zero-row bootstrap shape: one schema-carrying empty
        // file, partition columns riding the payload, declared layout
        // restated below.
        if (snap.isEmpty)
          writeData(snap.coalesce(1), dataDir)
        else {
          val out = statsCol match {
            case Some(c) => snap.repartitionByRange(files, col(c))
            case None => snap.repartition(files)
          }
          if (writeCols.nonEmpty)
            writeUnderSpec(out, writeCols, dataDir)
          else // evolved back to flat: path columns fold into the payload
            writeData(out, dataDir)
        }
        statsCol match {
          case Some(c) =>
            val stats = fileColStatsAll(s, table, dataDir, c)
            stats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" } ++
              (if (hadRows)
                 stats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
               else Nil) :+ s"$StatsColPrefix$c"
          case None =>
            partFiles(table, dataDir) ++
              (if (hadRows) fileRowsLinesAll(s, table, dataDir) else Nil)
        }
      case None =>
        val snap = read(s, table, Some(base),
          mergeSchema = columnMappings(table, base).nonEmpty)
        val out = statsCol match {
          case Some(c) => snap.repartitionByRange(files, col(c))
          case None => snap.repartition(files)
        }
        // A flat-file table whose spec evolved to a partitioned layout
        // before any partitioned insert landed: the compaction itself
        // moves the snapshot under the live spec (empty snapshots keep
        // the flat schema-carrying shape — dynamic partitionBy of zero
        // rows would write no files at all).
        if (writeCols.nonEmpty && !snap.isEmpty)
          writeUnderSpec(out, writeCols, dataDir)
        else
          writeData(out, dataDir)
        statsCol match {
          case Some(c) =>
            val stats = fileColStatsAll(s, table, dataDir, c)
            stats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" } ++
              (if (hadRows)
                 stats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
               else Nil) :+ s"$StatsColPrefix$c"
          case None =>
            partFiles(table, dataDir) ++
              (if (hadRows) fileRowsLinesAll(s, table, dataDir) else Nil)
        }
    }
    val checks = checkConstraints(table, base).map(CheckPrefix + _)
    // INDEX MAINTENANCE (r15): compaction must not be the path that
    // silently drops the skipping indexes either — recompute BLOOM and
    // secondary-zonemap lines for every column the base indexed, over
    // the fresh files (flat layouts only; partitioned bases never
    // carry these compositions today). The primary stats column's
    // zonemaps already ride the data lines above.
    val indexLines =
      if (partCols.nonEmpty || writeCols.nonEmpty) Nil
      else {
        val bloomCols = blooms(table, base).map(_._2).distinct
        val secCols = secondaryStats(table, base).map(_._2).distinct
          .filterNot(statsCol.contains)
        bloomCols.flatMap(c => fileBloomLines(s, table, dataDir, c)) ++
          secCols.flatMap(c =>
            fileColStats(s, table, dataDir, c).map {
              case (f, mn, mx, _) => s"$StatsPrefix$f\t$c\t$mn\t$mx"
            })
      }
    // KIND=compact marks the commit content-preserving (dataChange=
    // false): the change feed skips it instead of failing downstream
    // mirrors into a full restart. A DECLARED partition layout is a
    // table-wide contract like STATSCOL — the full-manifest rewrite
    // restates it (amnesia rule).
    val partDecl = declaredPartitionCols(table, base).map(PartColPrefix + _) ++
      partSpecLines(table, base)
    publish(table, version,
      lines ++ indexLines ++ checks ++ partDecl :+ s"${KindPrefix}compact")
    version
  }

  /** PARTITION-SCOPED COMPACTION (r17) — the maintenance shape a
    * 100-TB table actually runs: nobody compacts three years of
    * history to fix yesterday's small files. Rewrites ONLY the files
    * whose `partCol=value` path segment matches `values` (the hot
    * partitions an hourly stream just fragmented) into `files`
    * right-sized files under the table's WRITE layout; every untouched
    * file's manifest line carries BYTE-VERBATIM through an RM delta —
    * metadata cost O(touched), never O(table), the updateWhere shape
    * with compaction semantics. Stats/ROWS recompute for the new files
    * when the base recorded them; KIND=compact, so change feeds skip
    * the commit (content unchanged). On a spec-EVOLVED table the
    * scoped rewrite moves just those files to the live spec —
    * incremental un-ragging, partition by partition. Returns
    * (publishedVersion, filesRewritten, filesTotal); an empty scope
    * publishes nothing and returns (base, 0, total). */
  def compactPartitionsCommit(s: SparkSession, table: Path,
      partCol: String, values: Seq[String], files: Int = 4,
      checkpointEvery: Int = 8): (Long, Int, Int) = {
    import org.apache.spark.sql.functions.col
    refuseBranched(table, "compactPartitionsCommit")
    require(values.nonEmpty && files > 0,
      s"compactPartitionsCommit: need partition values and files > 0")
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"compactPartitionsCommit: no committed version at $table"))
    require(deletionVectors(table, base).isEmpty &&
        columnMappings(table, base).isEmpty,
      s"compactPartitionsCommit at version $base: deletion vectors or " +
        "schema mappings live — run a full compactCommit first")
    val layout = partitionLayout(table, base)
    require(layout.contains(partCol),
      s"compactPartitionsCommit: '$partCol' is not a partition column " +
        s"of $table (layout $layout)")
    val all = statsManifest(table, base).map(_._1)
    val want = values.toSet
    def valueOf(f: String): Option[String] =
      f.split('/').collectFirst {
        case seg if seg.startsWith(partCol + "=") =>
          java.net.URLDecoder.decode(seg.substring(partCol.length + 1),
            "UTF-8")
      }
    val touched = all.filter(f => valueOf(f).exists(want))
    if (touched.isEmpty) return (base, 0, all.size)
    val version = base + 1
    val writeCols = writePartitionLayout(table, base)
    val snap = readMultiPartitionedFiles(s, table, layout, touched,
      asOf = Some(base))
    val dataDir = newDataDir(table, version)
    val statsColOpt = statsColumns(table, base).headOption
    val hadRows = manifest(table, base).exists(_.startsWith(RowsPrefix))
    if (!snap.isEmpty) {
      val out = statsColOpt match {
        case Some(c) => snap.repartitionByRange(files, col(c))
        case None => snap.repartition(files)
      }
      if (writeCols.nonEmpty)
        writeUnderSpec(out, writeCols, dataDir)
      else writeData(out, dataDir)
    }
    val staged =
      if (snap.isEmpty) Nil
      else statsColOpt match {
        case Some(c) =>
          val stats = fileColStatsAll(s, table, dataDir, c)
          stats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" } ++
            (if (hadRows)
               stats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
             else Nil)
        case None =>
          partFiles(table, dataDir) ++
            (if (hadRows) fileRowsLinesAll(s, table, dataDir) else Nil)
      }
    // A scope that holds only zero-row files compacts away entirely —
    // legal as long as the table keeps a data line (its schema source).
    require(staged.nonEmpty || touched.size < all.size,
      s"compactPartitionsCommit: the scope covers every file of $table " +
        "and holds no rows — TRUNCATE is the legitimate verb")
    val dead = touched.toSet
    val added = staged :+ s"${KindPrefix}compact"
    val lines =
      if (chainLength(table, base) + 1 > checkpointEvery)
        manifest(table, base).filter { line =>
          if (isMetaLine(line)) metaFile(line).forall(!dead.contains(_))
          else !dead.contains(line.split('\t').head)
        } ++ added
      else (BasePrefix + base) +:
        (touched.sorted.map(RmPrefix + _) ++ added)
    try publish(table, version, lines)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"compactPartitionsCommit: version $version was committed " +
            "concurrently — the staged rewrite derives from the " +
            "superseded snapshot; re-run against the new snapshot")
    }
    (version, touched.size, all.size)
  }

  /** Normalized 2-D MORTON KEY column over two BIGINT columns — ONE
    * definition shared by the z-order queries and [[clusterCommit]]
    * (divergent copies would silently fork the layout semantics).
    * Dims are linearly scaled to a common 10-bit domain before
    * interleaving: raw interleave lets the wider dimension's high bits
    * own the top of every z value, collapsing the layout to a
    * one-column sort, while normalization keeps both dims' bits
    * alternating at the top — every file a RECTANGLE, not a stripe.
    * Costs one min/max aggregation pass over `df`. */
  def mortonColumn(df: DataFrame, c1: String, c2: String)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit, max, min, shiftleft}
    def spread(x: org.apache.spark.sql.Column) =
      Seq((8, 16711935L), (4, 252645135L), (2, 858993459L),
        (1, 1431655765L))
        .foldLeft(x.bitwiseAND(lit(65535L))) { case (c, (sh, mask)) =>
          c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(mask))
        }
    val r = df.agg(min(col(c1)), max(col(c1)),
      min(col(c2)), max(col(c2))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"mortonColumn: no non-NULL values to scale on ($c1, $c2)")
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      (c - lit(lo)) * lit(1023L) / lit(math.max(1L, hi - lo))
    spread(norm(col(c1), r.getLong(0), r.getLong(1)).cast("long"))
      .bitwiseOR(shiftleft(
        spread(norm(col(c2), r.getLong(2), r.getLong(3)).cast("long")), 1))
  }

  /** Z-ORDER CLUSTERING AS A MAINTENANCE COMMIT (r17) — the verb that
    * lets a production table SCHEDULE layout maintenance through the
    * protocol (reachable as `CALL <cat>.cluster(...)`): rewrites the
    * latest snapshot in Morton order over two BIGINT columns (or
    * range-clustered on one — [[compactCommit]] with teeth), and
    * publishes ONE full manifest with fresh zonemaps on EVERY
    * clustered column (primary on `cols.head` data lines, the rest as
    * secondary STATS lines), ROWS iff the base recorded them,
    * recomputed BLOOM + other secondary indexes the base carried, the
    * CHECK constraints, and KIND=compact — so change feeds skip it and
    * box predicates prune on every dimension from the moment it
    * commits (the pipe_zorder_skip machinery, now schedulable).
    * Deletion vectors and live schema mappings fold away exactly as
    * compaction folds them. Partition-layout tables refuse (clustering
    * inside a partitioned layout is a different verb). More than two
    * columns refuses: only the 2-D interleave is recall-proven here.
    * Cost O(live rows) — the price of any re-layout. */
  def clusterCommit(s: SparkSession, table: Path, cols: Seq[String],
                    files: Int = 16): Long = {
    import org.apache.spark.sql.functions.col
    refuseBranched(table, "clusterCommit")
    require(cols.nonEmpty && cols.size <= 2,
      s"clusterCommit: 1 (range) or 2 (Morton) cluster columns, got $cols")
    require(files > 0, s"clusterCommit: files=$files must be positive")
    val base = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"clusterCommit: no committed version at $table"))
    val version = base + 1
    require(partitionLayout(table, base).isEmpty &&
        writePartitionLayout(table, base).isEmpty,
      s"clusterCommit: $table has a partition layout (or live " +
        "transform spec) — cluster rewrites the snapshot flat and " +
        "would drop it; compact instead")
    val snap = read(s, table, Some(base),
      mergeSchema = columnMappings(table, base).nonEmpty)
    cols.foreach(c => require(snap.schema.fields.exists(f =>
        f.name == c && f.dataType == org.apache.spark.sql.types.LongType),
      s"clusterCommit: column '$c' must exist with type BIGINT (the " +
        "zonemap domain)"))
    val dataDir = newDataDir(table, version)
    val clustered = cols match {
      case Seq(c) =>
        snap.repartitionByRange(files, col(c)).sortWithinPartitions(col(c))
      case Seq(c1, c2) =>
        if (snap.isEmpty) snap.coalesce(1) // nothing to scale or cluster
        else snap.withColumn("__z", mortonColumn(snap, c1, c2))
          .repartitionByRange(files, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
    }
    writeData(clustered, dataDir)
    val hadRows = manifest(table, base).exists(_.startsWith(RowsPrefix))
    val stats = fileColStatsAll(s, table, dataDir, cols.head)
    val lines = stats.map { case (f, mn, mx, _) => s"$f\t$mn\t$mx" } ++
      (if (hadRows)
         stats.map { case (f, _, _, n) => s"$RowsPrefix$f\t$n" }
       else Nil) :+ s"$StatsColPrefix${cols.head}"
    // Secondary zonemaps: the OTHER clustered dimension(s), plus any
    // secondary column the base already indexed (maintenance must not
    // be the path that drops an index — the compactCommit amnesia rule).
    val secCols = (cols.tail ++
      secondaryStats(table, base).map(_._2)).distinct
      .filterNot(_ == cols.head)
    val secondary = secCols.flatMap(c =>
      fileColStats(s, table, dataDir, c).map { case (f, mn, mx, _) =>
        s"$StatsPrefix$f\t$c\t$mn\t$mx"
      })
    val bloomLines = blooms(table, base).map(_._2).distinct
      .flatMap(c => fileBloomLines(s, table, dataDir, c))
    val checks = checkConstraints(table, base).map(CheckPrefix + _)
    publish(table, version,
      lines ++ secondary ++ bloomLines ++ checks :+ s"${KindPrefix}compact")
    version
  }

  /** PROMOTE a branch into another branch — the merge that turns a
    * validated experiment into production WITHOUT copying data: the
    * NET change `from`'s history made since its fork point (ref seq 0
    * records exactly where the branch was created) is published as
    * one snapshot based on `into`'s head, and `into`'s ref CASes
    * forward. Zero data movement — a promote is a metadata commit
    * whatever the branch weighs.
    *
    * Append-only branches FAST-FORWARD (BASE + added lines). A branch
    * that REWROTE files since the fork (updateWhere-shaped history,
    * hand-published rewrites) REBASES (r15): its net removals replay
    * as RM lines against `into`'s head, its net additions append —
    * provided every removed line is still VERBATIM in `into`'s head
    * manifest. If `into` touched any of the same files (the removed
    * line is gone or its stats changed), the promote REFUSES: that is
    * a true three-way conflict only a human (or a re-run of the
    * branch's logic on the new base) can resolve — the overlapping-RM
    * rule. A rebase with removals is a rewrite to the change feed and
    * is stamped KIND=update (preimage = the removed files' rows,
    * postimage = the added files' — the mirror-correct pair); a pure
    * fast-forward stays unannotated and serves as plain inserts.
    * Removing a CHECK line can never ride a promote — a contract
    * change must be explicit, not a merge side effect.
    *
    * `from` itself is untouched (read it after the promote and it
    * still serves its own head). Conflict semantics as
    * [[branchCommit]]: lost snapshot-id or ref races retry on tiny
    * metadata. `beforeAttempt(intoHead)` is the race seam
    * ([[appendCommit]]'s pattern): it runs after each attempt reads
    * the target head, so a test can advance `into` underneath the
    * promote deterministically. */
  def promoteBranch(s: SparkSession, table: Path, from: String,
                    into: String, maxAttempts: Int = 10,
                    beforeAttempt: Long => Unit = _ => ()): Committed = {
    val fromEntries = refEntries(table, from)
    require(fromEntries.nonEmpty, s"promoteBranch: no ref '$from' at $table")
    val (_, intoKind) = refHead(table, into)
      .map(h => (h._2, h._1)).getOrElse(
        throw new IllegalArgumentException(
          s"promoteBranch: no ref '$into' at $table"))
    require(intoKind == "branch",
      s"promoteBranch: ref '$into' is a $intoKind — tags are immutable")
    val fork = fromEntries.head._3
    val fromHead = fromEntries.last._3
    val forkLines = manifest(table, fork)
    val headLines = manifest(table, fromHead)
    val forkSet = forkLines.toSet
    val headSet = headLines.toSet
    // The branch's NET change since the fork: lines it added, lines it
    // removed (rewrites). Removals rebase as RM deltas below; a
    // removed CHECK line refuses outright (contracts don't merge away).
    val removed = forkLines.filterNot(headSet)
    require(!removed.exists(_.startsWith(CheckPrefix)),
      s"promoteBranch: branch '$from' dropped a CHECK constraint since " +
        s"its fork at v$fork — a contract change cannot ride a promote")
    val removedPaths = removed.map { line =>
      if (isMetaLine(line)) metaFile(line).getOrElse(
        throw new IllegalArgumentException(
          s"promoteBranch: branch '$from' removed table-wide metadata " +
            s"'${line.takeWhile(_ != '\t')}' since its fork — " +
            "unrebasable; compact first"))
      else line.split('\t').head
    }.distinct
    // A per-FILE index line (BLOOM/STATS/ROWS) removed while its data
    // file survives cannot rebase: the replay RM names the FILE, which
    // would drop the kept data line along with the index. (DV removals
    // stand alone by design — folding a deletion vector away is a
    // legitimate net change whose RM names only the DV sidecar.)
    val removedDataPaths =
      removed.filterNot(isMetaLine).map(_.split('\t').head).toSet
    removed.filter(l => l.startsWith(BloomPrefix) ||
        l.startsWith(StatsPrefix) || l.startsWith(RowsPrefix)).foreach {
      m => require(metaFile(m).forall(removedDataPaths.contains),
        s"promoteBranch: branch '$from' dropped index metadata " +
          s"('${m.takeWhile(_ != '\t')}') for a data file it kept — " +
          "unrebasable as a file-level RM; compact first")
    }
    val added = headLines.filterNot(forkSet)
    val addedFiles = added.filterNot(isMetaLine).map(_.split('\t').head)
    var conflicts = 0
    // The TARGET branch's constraints gate the promote: `into` may
    // have declared a stricter CHECK after the fork, and a
    // fast-forward must not be the path that smuggles violating rows
    // past it. Validated INSIDE the retry loop against the FRESH head
    // (r15 — the old single pre-loop validation raced: a CHECK
    // declared on `into` between a lost ref CAS and the retry was
    // silently bypassed, since the retry republished onto the new
    // head unvalidated). Keyed on the head's constraint SET, so the
    // common retry cause — a concurrent append, constraints unchanged
    // — re-pays only the O(chain) metadata probe, never the
    // O(added rows) scan.
    var validated: Option[Seq[String]] = None
    while (conflicts < maxAttempts) {
      val entries = refEntries(table, into)
      val (headSeq, _, intoHead) = entries.last
      beforeAttempt(intoHead)
      val checks = checkConstraints(table, intoHead)
      if (!validated.contains(checks)) {
        if (checks.nonEmpty && addedFiles.nonEmpty)
          violations(s.read.parquet(
            addedFiles.map(f => table.resolve(f).toString): _*), checks)
            .foreach { case (e, n) => require(n == 0L,
              s"promoteBranch($from -> $into): $n row(s) violate CHECK " +
                s"($e) on the target branch — refused before the commit " +
                "point (no partial state published)")
            }
        validated = Some(checks)
      }
      // Overlapping-RM conflict check, per attempt against the FRESH
      // head: every line the branch removed must still sit VERBATIM in
      // `into`'s manifest — if `into` touched the same file (line gone
      // or re-statted), the rebase would silently discard its change.
      if (removed.nonEmpty) {
        val intoSet = manifest(table, intoHead).toSet
        val conflicting = removed.filterNot(intoSet)
        require(conflicting.isEmpty,
          s"promoteBranch($from -> $into): both branches touched " +
            s"${conflicting.map(_.split('\t').head).distinct
              .mkString("[", ", ", "]")} since the fork — a true " +
            "conflict; rebase the branch's logic on the new base or " +
            "resolve manually")
      }
      val target = latestVersion(table).get + 1
      val lines = (BasePrefix + intoHead) +: (
        if (removed.isEmpty) added
        else removedPaths.sorted.map(RmPrefix + _) ++ added :+
          s"${KindPrefix}update")
      try {
        publish(table, target, lines)
        try {
          publishRef(table, into, headSeq + 1, "branch", target)
          return Committed(target, conflicts)
        } catch {
          // Lost the ref CAS: the head MOVED, so the just-published
          // snapshot's BASE is stale — it stays ORPHANED in the log
          // (manifest-only: its data lines are the from-branch's
          // files, still referenced there, so expire() reclaims just
          // the one manifest) and the retry republishes on the fresh
          // head.
          case _: java.nio.file.FileAlreadyExistsException => conflicts += 1
        }
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => conflicts += 1
      }
    }
    throw new IllegalStateException(
      s"promoteBranch: lost $maxAttempts straight races promoting " +
        s"'$from' into '$into'")
  }

  /** Committed versions with their manifest publish times (epoch
    * millis, from the atomic link's mtime) — what `TIMESTAMP AS OF`
    * resolves against. */
  def versionTimes(table: Path): Seq[(Long, Long)] =
    versions(table).map { v =>
      v -> Files.getLastModifiedTime(
        commitsDir(table).resolve(manifestName(v))).toMillis
    }

  /** Committed versions, ascending (the readable history).
    *
    * Scale note (documented, deliberately unoptimized): this lists the
    * whole `_commits/` directory — O(history) dirents per call, cheap
    * until a table accumulates ~10⁶ commits. The production fix is the
    * Delta `_last_checkpoint` idea: a best-effort latest-version hint
    * file updated after each publish, trusted only as a lower bound
    * and probed forward by existence checks (hints can lag, never
    * lead, because versions are immutable once published and expire()
    * only removes BELOW a floor). Not built yet because every fixture
    * and the bench sit 4–5 orders of magnitude under the threshold and
    * a wrong hint is a correctness bug, not a slowdown. */
  def versions(table: Path): Seq[Long] = {
    val dir = commitsDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case ManifestRe(v) => Some(v.toLong)
        case _ => None
      }).toSeq.sorted
  }

  /** Latest committed version, if any commit ever succeeded. */
  def latestVersion(table: Path): Option[Long] = versions(table).lastOption

  // ===== NAMED REFS: tags and branches over the snapshot log =====
  //
  // The Iceberg refs idea re-derived on this layer's primitives: every
  // commit is a SNAPSHOT in one global log (`_commits/`, integer ids);
  // a REF is a named pointer into that log. A TAG is immutable (a
  // release pin); a BRANCH advances — `branchCommit` appends a snapshot
  // whose BASE is the branch head and CASes the ref forward, so two
  // branches interleave snapshots in one log yet each reads a linear
  // history. Zero data is copied at branch time (manifests are file
  // LISTS; both branches share every common file).
  //
  // A ref is an APPEND-ONLY LOG of its own: `_refs/<name>/r%06d.ref`,
  // each file one `<kind>\t<version>` record, head = max seq. Advancing
  // the ref is the same atomic createLink putIfAbsent as publishing a
  // manifest — a racing advance of the same seq fails on the existing
  // name, which IS the compare-and-swap (and the ref's own history
  // falls out for free). A branchCommit that loses the ref race leaves
  // its already-published snapshot ORPHANED in the log — unreachable
  // from any ref, reclaimed by [[expire]] like any lost attempt — and
  // retries from the winner's head; data files are written exactly
  // once (appends commute, the [[appendCommit]] discipline).
  //
  // Scope note, stated loudly: version-UNAWARE reads (`read()` with no
  // version, `latestVersion`) see the LATEST SNAPSHOT in the global
  // log, whatever ref produced it — the raw log, not a branch. Readers
  // that care which line of history they follow read through a ref
  // ([[readRef]]). Production formats make "main" such a ref and
  // default readers onto it; this layer keeps the default reader
  // ref-free so every pre-refs caller is byte-identical, and tables
  // that want main-semantics create the ref explicitly.

  private def refsDir(table: Path): Path = table.resolve("_refs")

  private val RefRe = """r(\d{6})\.ref""".r

  private def refDir(table: Path, name: String): Path = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"ref name '$name' — letters, digits, dot, underscore, dash")
    refsDir(table).resolve(name)
  }

  /** Atomically publish ref record `seq` → (kind, version): createLink
    * putIfAbsent, exactly the manifest commit point. Throws
    * FileAlreadyExistsException when `seq` is taken — the lost CAS. */
  private def publishRef(table: Path, name: String, seq: Long,
                         kind: String, version: Long): Unit = {
    val dir = Files.createDirectories(refDir(table, name))
    val tmp = Files.createTempFile(dir, ".tmp-", ".ref")
    Files.write(tmp, s"$kind\t$version".getBytes(StandardCharsets.UTF_8))
    try Files.createLink(dir.resolve(f"r$seq%06d.ref"), tmp)
    finally Files.deleteIfExists(tmp)
  }

  /** A ref's full advance history, ascending: (seq, kind, version). */
  def refEntries(table: Path, name: String): Seq[(Long, String, Long)] = {
    val dir = refDir(table, name)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case RefRe(seq) =>
          val Array(kind, v) = Files.readAllLines(p).get(0).split('\t')
          Some((seq.toLong, kind, v.toLong))
        case _ => None
      }).toSeq.sortBy(_._1)
  }

  /** The ref's current (kind, version), if the ref exists. */
  def refHead(table: Path, name: String): Option[(String, Long)] =
    refEntries(table, name).lastOption.map { case (_, k, v) => (k, v) }

  /** All refs of a table: (name, kind, headVersion). */
  def refs(table: Path): Seq[(String, String, Long)] = {
    val dir = refsDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
      .flatMap(n => refHead(table, n).map { case (k, v) => (n, k, v) })
  }

  /** Create an IMMUTABLE tag at `version`. Immutability is the commit
    * point itself: a tag is seq 0 of its ref log and nothing ever
    * publishes seq 1 — a second create of the same name loses the
    * createLink race and throws. */
  def tagCreate(table: Path, name: String, version: Long): Unit = {
    require(versions(table).contains(version),
      s"tagCreate: version $version was never committed at $table")
    publishRef(table, name, 0L, "tag", version)
  }

  /** Create a branch pointing at `version` — zero files copied; the
    * branch and its source share every manifest line until the first
    * [[branchCommit]] diverges them. */
  def branchCreate(table: Path, name: String, version: Long): Unit = {
    require(versions(table).contains(version),
      s"branchCreate: version $version was never committed at $table")
    publishRef(table, name, 0L, "branch", version)
  }

  /** Version-unaware writers (appendCommit, transact, mergeCommit,
    * updateWhere, compactCommit) base on the GLOBAL latest snapshot —
    * which, once branch refs exist, may be whichever line of history
    * last interleaved a commit. Basing trunk work on another branch's
    * head would silently merge histories, so those writers REFUSE
    * branched tables (the change feed's stance): write through
    * [[branchCommit]] against an explicit ref instead. */
  private def refuseBranched(table: Path, what: String): Unit =
    require(refs(table).forall(_._2 != "branch"),
      s"$what: $table has branch refs — lines of history interleave in " +
        "its log, and a version-unaware writer would base on whichever " +
        "advanced last; commit through branchCommit(<ref>) instead")

  /** CAS-advance a branch ref to an arbitrary committed version — the
    * ROLLBACK/RETARGET verb (Iceberg's replace-branch): moving a
    * branch back to a known-good snapshot after a bad deploy is one
    * ref record, zero data touched, and the abandoned snapshots stay
    * in the log for forensics until [[expire]] reclaims them. Tags
    * refuse (immutability). Also the seam that drives
    * [[promoteBranch]]'s rewritten-branch refusal in tests — the
    * [[failedCommit]] stance: failure paths must be drivable. */
  def advanceRef(table: Path, name: String, version: Long): Unit = {
    require(versions(table).contains(version),
      s"advanceRef: version $version was never committed at $table")
    val (seq, kind, _) = refEntries(table, name).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no ref '$name' at $table"))
    require(kind == "branch", s"ref '$name' is a $kind — tags are immutable")
    publishRef(table, name, seq + 1, "branch", version)
  }

  /** Snapshot read through a ref — the branch/tag-aware reader. */
  def readRef(s: SparkSession, table: Path, name: String): DataFrame = {
    val (_, v) = refHead(table, name).getOrElse(
      throw new IllegalArgumentException(s"no ref '$name' at $table"))
    read(s, table, Some(v))
  }

  /** APPEND to a branch: publish a snapshot whose BASE is the branch
    * head (global next id — branches interleave in one log), then CAS
    * the ref forward. Data files are written exactly once; on a lost
    * race (snapshot id taken, or the ref advanced underneath us) only
    * tiny metadata retries. Returns the published (version, conflicts
    * absorbed). */
  def branchCommit(s: SparkSession, table: Path, name: String,
                   df: DataFrame, maxAttempts: Int = 10,
                   checkpointEvery: Int = 8): Committed = {
    val (kind0, _) = refHead(table, name).getOrElse(
      throw new IllegalArgumentException(s"no ref '$name' at $table"))
    require(kind0 == "branch", s"ref '$name' is a $kind0 — tags are immutable")
    val dataDir = table.resolve("data").resolve(
      s"branch-$name-" + java.util.UUID.randomUUID().toString.take(8))
    writeData(df, dataDir)
    // Constraints are per-LINE-OF-HISTORY: validate against the branch
    // head's declarations, not the global latest snapshot.
    enforceConstraints(s, table, dataDir,
      refHead(table, name).map(_._2), s"branchCommit($name)")
    val mine = partFiles(table, dataDir)
    var conflicts = 0
    while (conflicts < maxAttempts) {
      val entries = refEntries(table, name)
      val (headSeq, _, headVersion) = entries.last
      val target = latestVersion(table).getOrElse(
        throw new IllegalStateException(
          s"branchCommit: ref '$name' exists but no version does")) + 1
      // A branch delta bases on the BRANCH head, not target−1 — the
      // whole point of interleaving: resolution follows the ref's line
      // of history. Checkpoint on the branch's own chain depth.
      val lines =
        if (chainLength(table, headVersion) + 1 > checkpointEvery)
          manifest(table, headVersion) ++ mine
        else (BasePrefix + headVersion) +: mine
      try {
        publish(table, target, lines)
        try {
          publishRef(table, name, headSeq + 1, "branch", target)
          return Committed(target, conflicts)
        } catch {
          // Lost the ref CAS: someone advanced the branch first. Our
          // published snapshot is orphaned (unreachable from any ref —
          // expire() reclaims its files); retry from the new head.
          case _: java.nio.file.FileAlreadyExistsException =>
            conflicts += 1
        }
      } catch {
        // Snapshot id taken by a concurrent committer — retry with a
        // fresh id; the ref head may or may not have moved.
        case _: java.nio.file.FileAlreadyExistsException => conflicts += 1
      }
    }
    throw new IllegalStateException(
      s"branchCommit: lost $maxAttempts straight races on ref '$name'")
  }

  /** A delta manifest's first line names the version it extends; the
    * rest are this version's ADDED lines. The literal "BASE" can never
    * collide with a data path (those live under data/ or dv/). */
  private val BasePrefix = "BASE\t"

  /** `RM\t<file>` (r13): a REMOVAL inside a delta manifest — the
    * Delta-log add+remove-actions shape that makes PARTIAL REWRITES
    * O(commit) metadata too: an [[updateWhere]] touching 3 of 10⁶
    * files publishes BASE + 3 RM lines + 3 new stats lines, never the
    * full list (checkpoints still bound the chain). Resolution drops
    * the named data line AND every meta line indexing it (BLOOM/STATS/
    * ROWS — a stale skipping index must die with its file). RM deltas
    * are REWRITES to the change feed: [[removedLines]] reports them,
    * so `graft-changes` refuses the version exactly as it refuses a
    * full-manifest rewrite. */
  private val RmPrefix = "RM\t"

  /** The stored lines of version `version`'s manifest file, unresolved
    * (a delta keeps its BASE pointer). */
  private def rawManifest(table: Path, version: Long): Seq[String] = {
    val m = commitsDir(table).resolve(manifestName(version))
    require(Files.isRegularFile(m),
      s"version $version was never committed at $table")
    Files.readAllLines(m, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
  }

  /** The file list of a committed version, with delta chains resolved:
    * a `BASE\tN` head splices in version N's resolved lines; `RM\t<f>`
    * tail lines drop f's data line and every meta line indexing f from
    * the spliced base. Chain depth is bounded by the writers'
    * `checkpointEvery`, so resolution cost is O(live files), not
    * O(history). */
  def manifest(table: Path, version: Long): Seq[String] = {
    val raw = rawManifest(table, version)
    val resolved = raw.headOption match {
      case Some(h) if h.startsWith(BasePrefix) =>
        val base = manifest(table, h.stripPrefix(BasePrefix).trim.toLong)
        val (rm, added) = raw.tail.partition(_.startsWith(RmPrefix))
        if (rm.isEmpty) base ++ added
        else {
          val dead = rm.map(_.substring(RmPrefix.length)).toSet
          base.filterNot { line =>
            if (isMetaLine(line)) metaFile(line).exists(dead)
            else dead.contains(line.split('\t').head)
          } ++ added
        }
      case _ => raw
    }
    // KIND annotations describe one commit, never the table: strip them
    // from every resolution so no later carry/checkpoint inherits one.
    resolved.filterNot(_.startsWith(KindPrefix))
  }

  /** How many manifest FILES a resolution of `version` reads (1 for a
    * full manifest) — the checkpoint-cadence decision and its test
    * witness. */
  def chainLength(table: Path, version: Long): Int = {
    val raw = rawManifest(table, version)
    raw.headOption match {
      case Some(h) if h.startsWith(BasePrefix) =>
        1 + chainLength(table, h.stripPrefix(BasePrefix).trim.toLong)
      case _ => 1
    }
  }

  /** The manifest lines version `version` ADDED over its predecessor —
    * the change-feed primitive ([[graft.sources.TableChangesSource]]
    * plans micro-batches from it). For a delta manifest this is the
    * stored tail (zero extra reads); for a full manifest it is the
    * set difference against version-1's resolved lines (v0, or a
    * rewrite commit, adds everything it lists). */
  /** The manifest lines version `version` REMOVED vs its predecessor —
    * nonempty exactly for REWRITE commits (compaction, transact's
    * copy-on-write), which a change feed cannot represent as
    * appends+deletes. Deltas are pure additions, so only full
    * manifests can remove. */
  def removedLines(table: Path, version: Long): Seq[String] = {
    val raw = rawManifest(table, version)
    raw.headOption match {
      case Some(h) if h.startsWith(BasePrefix) =>
        // An RM-bearing delta removes: resolve exactly what its BASE
        // listed for the named files (data line + indexing meta lines)
        // — the same answer a full-manifest diff would give.
        val dead = raw.tail.collect {
          case l if l.startsWith(RmPrefix) => l.substring(RmPrefix.length)
        }.toSet
        if (dead.isEmpty) Seq.empty
        else manifest(table, h.stripPrefix(BasePrefix).trim.toLong)
          .filter { line =>
            if (isMetaLine(line)) metaFile(line).exists(dead)
            else dead.contains(line.split('\t').head)
          }
      case _ =>
        versions(table).filter(_ < version).lastOption match {
          case None => Seq.empty
          case Some(prev) =>
            val cur = raw.toSet
            manifest(table, prev).filterNot(cur)
        }
    }
  }

  /** The DATA files version `version` removed vs its predecessor —
    * [[removedLines]] narrowed to payload paths (indexing meta lines
    * die with their file but carry no rows). The change feed serves
    * these as `update_preimage` rows for a KIND=update commit. */
  def removedDataFiles(table: Path, version: Long): Seq[String] =
    removedLines(table, version).filterNot(isMetaLine)
      .map(_.split('\t').head)

  def addedLines(table: Path, version: Long): Seq[String] = {
    val raw = rawManifest(table, version)
    (raw.headOption match {
      case Some(h) if h.startsWith(BasePrefix) =>
        raw.tail.filterNot(_.startsWith(RmPrefix))
      case _ =>
        // Full manifest: diff against the closest committed ancestor
        // (batch-id histories may skip versions, so not version−1).
        versions(table).filter(_ < version).lastOption match {
          case None => raw
          case Some(prev) =>
            val prevSet = manifest(table, prev).toSet
            raw.filterNot(prevSet)
        }
    }).filterNot(_.startsWith(KindPrefix))
  }

  /** Snapshot read: latest version by default, time travel via
    * `version`. Plans over exactly the manifest's files — orphans from
    * failed commits are invisible by construction. (Routes through
    * [[statsManifest]] so stats-bearing and plain manifest lines read
    * alike.) */
  def read(s: SparkSession, table: Path, version: Option[Long] = None,
           mergeSchema: Boolean = false): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val relFiles = statsManifest(table, v).map(_._1)
    // A manifest carrying only metadata lines (every data file deleted
    // and compacted away) has no schema to serve — refuse with the
    // cause, not a reduce-on-empty crash.
    require(relFiles.nonEmpty,
      s"read at version $v of $table: the manifest lists no data files")
    readLive(s, table, v, relFiles, mergeSchema)
  }

  /** Plan a read over `relFiles` (the full manifest, or a pruned
    * subset) at version `v`, applying the version's live deletion
    * vectors and schema mappings.
    *
    * Merge-on-read: anti-join the live deletion vectors, each SCOPED
    * to the data files its origin version listed — files appended
    * after a delete are not covered, so re-inserted keys survive
    * (sequence-number semantics, not eternal tombstones). Data files
    * group by the set of DVs covering them (in any sane history a
    * handful of groups); each group anti-joins its own key union.
    * The DV side is O(deleted keys) — broadcast-sized; a compaction
    * commit folds it away entirely. Scoping composes with pruning:
    * a DV covers a pruned subset exactly as it covers the whole.
    *
    * Schema mappings (RENAME/WIDEN) apply per WRITER DIRECTORY — all
    * files of one commit share one footer schema, so grouping by
    * parent dir reads each historical schema once, maps it to the
    * current one, and unions (missing columns surface typed NULLs). */
  private def readLive(s: SparkSession, table: Path, v: Long,
                       relFiles: Seq[String],
                       mergeSchema: Boolean = false): DataFrame = {
    val maps = columnMappings(table, v)
    val dvs = deletionVectors(table, v)
    val keyCols = dvs.map(_._2).distinct
    require(keyCols.size <= 1,
      s"mixed deletion-vector key columns at version $v: $keyCols")
    // A rename could retarget a DV's key column between its origin and
    // this version — refuse the ambiguity; compaction resolves it.
    require(dvs.isEmpty || maps.isEmpty,
      s"version $v carries both deletion vectors and schema mappings " +
        "— compact (a rewrite commit) before combining the two")
    // mergeSchema: a version whose commits span an ADDED column
    // reconciles per-file footers into the union schema at plan time —
    // old files surface typed NULLs. Off by default: single-schema
    // reads should not pay the footer sweep.
    def readFiles(fs: Seq[String]): DataFrame =
      if (maps.isEmpty)
        s.read.option("mergeSchema", mergeSchema.toString)
          .parquet(fs.map(f => table.resolve(f).toString): _*)
      else
        fs.groupBy(f => f.substring(0, f.lastIndexOf('/')))
          .toSeq.sortBy(_._1)
          .map { case (_, group) =>
            val part =
              s.read.parquet(group.map(f => table.resolve(f).toString): _*)
            maps.foldLeft(part) {
              case (d, ("rename", from, to)) if d.columns.contains(from) =>
                d.withColumnRenamed(from, to)
              case (d, ("widen", c, t)) if d.columns.contains(c) =>
                d.withColumn(c, d(c).cast(t))
              // Added column: files written before the ADDCOL commit
              // surface a typed NULL; files written after carry it.
              case (d, ("addcol", c, t)) if !d.columns.contains(c) =>
                d.withColumn(c,
                  org.apache.spark.sql.functions.lit(null).cast(t))
              // Dropped column: stop serving it (older files still
              // carry the bytes until compaction).
              case (d, ("dropcol", c, _)) if d.columns.contains(c) =>
                d.drop(c)
              case (d, _) => d
            }
          }
          .reduce(_.unionByName(_, allowMissingColumns = true))
    if (dvs.isEmpty) readFiles(relFiles)
    else {
      val covered: Map[String, Set[String]] = dvs
        .groupBy(_._3)
        .flatMap { case (origin, group) =>
          val scope = statsManifest(table, origin).map(_._1).toSet
          group.map(dv => dv._1 -> scope)
        }
      val groups = relFiles.groupBy(f =>
        covered.collect { case (dv, scope) if scope.contains(f) => dv }.toSet)
      groups.map { case (dvSet, fs) =>
        val part = readFiles(fs)
        if (dvSet.isEmpty) part
        else {
          val keys = s.read
            .parquet(dvSet.toSeq.sorted.map(table.resolve(_).toString): _*)
            .distinct()
          part.join(keys, Seq(keyCols.head), "left_anti")
        }
      }.reduce(_ unionByName _)
    }
  }
}
