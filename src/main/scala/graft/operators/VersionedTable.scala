package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
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
  * The COMMIT POINT is a single atomic rename of the finished manifest
  * into `_commits/` — data files are written first and mean nothing
  * until a manifest names them, so a crash mid-commit (or mid-write)
  * leaves garbage data files but a perfectly readable previous
  * version: readers only ever see the set of fully-renamed manifests.
  * Because the final name encodes the version, two racing committers
  * of version N cannot both succeed — the second rename fails on the
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
  * Local-filesystem realization of the primitives: java.nio
  * ATOMIC_MOVE for the rename (same deployment note as
  * GraftSession.stagingDir — a real cluster points SPARK_GRAFT_STAGING
  * at a shared mount; an object-store port swaps these few lines for
  * conditional PUTs, the protocol is unchanged).
  */
object VersionedTable {

  private def commitsDir(table: Path): Path = table.resolve("_commits")

  private def manifestName(version: Long): String =
    f"v$version%06d.manifest"

  private val ManifestRe = """v(\d{6})\.manifest""".r

  /** List the parquet part files under a freshly-written output dir,
    * as table-root-relative strings (sorted: the manifest is a stable
    * artifact, not an enumeration-order accident). */
  private def partFiles(table: Path, dataDir: Path): Seq[String] =
    Files.list(dataDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => table.relativize(p).toString)
      .toSeq.sorted

  /** Write `df` as version `version`'s new files and atomically
    * publish the manifest = carried ++ new. Returns the published
    * file list. `carried` is relative paths from a previous manifest
    * that remain live in this version (append/partial-rewrite
    * commits); pass Nil for a full copy-on-write snapshot. */
  def commit(s: SparkSession, table: Path, version: Long,
             df: DataFrame, carried: Seq[String] = Nil): Seq[String] = {
    val dataDir = table.resolve("data").resolve(f"v$version%06d-new")
    df.write.parquet(dataDir.toString)
    publish(table, version, carried ++ partFiles(table, dataDir))
  }

  /** The commit point, isolated so a test/witness can drive the
    * failure path: write the manifest under a dot-temp name (readers
    * skip non-matching names), then ONE atomic rename to the
    * version-encoding final name. */
  def publish(table: Path, version: Long, files: Seq[String]): Seq[String] = {
    val dir = Files.createDirectories(commitsDir(table))
    val tmp = Files.createTempFile(dir, ".tmp-", ".manifest")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(manifestName(version)),
      StandardCopyOption.ATOMIC_MOVE)
    files
  }

  /** Stage version `version`'s data files and its manifest BUT crash
    * before the rename — the atomicity witness. Leaves exactly what a
    * mid-commit failure leaves: orphan data files + a temp manifest
    * no reader resolves. */
  def failedCommit(s: SparkSession, table: Path, version: Long,
                   df: DataFrame): Unit = {
    val dataDir = table.resolve("data").resolve(f"v$version%06d-new")
    df.write.parquet(dataDir.toString)
    val dir = Files.createDirectories(commitsDir(table))
    val tmp = Files.createTempFile(dir, ".tmp-", ".manifest")
    Files.write(tmp,
      partFiles(table, dataDir).mkString("\n").getBytes(StandardCharsets.UTF_8))
    // no rename: the commit never happened as far as any reader knows
  }

  /** Committed versions, ascending (the readable history). */
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

  /** The file list of a committed version. */
  def manifest(table: Path, version: Long): Seq[String] = {
    val m = commitsDir(table).resolve(manifestName(version))
    require(Files.isRegularFile(m),
      s"version $version was never committed at $table")
    Files.readAllLines(m, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
  }

  /** Snapshot read: latest version by default, time travel via
    * `version`. Plans over exactly the manifest's files — orphans from
    * failed commits are invisible by construction. */
  def read(s: SparkSession, table: Path, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val files = manifest(table, v).map(f => table.resolve(f).toString)
    s.read.parquet(files: _*)
  }
}
