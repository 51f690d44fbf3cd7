package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** Protocol-level guarantees of the manifest/commit-log layer that the
  * query-surface witnesses (pipe_table_commit / pipe_time_travel)
  * exercise end-to-end: atomic visibility, optimistic-concurrency
  * conflict on a version collision, file carry-over, and orphan
  * invisibility.
  */
class VersionedTableSpec extends SparkSpec {

  private def freshTable() =
    Files.createTempDirectory("graft_vt_spec_").resolve("t")

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id")
  }

  test("no committed version -> read fails, latest is None") {
    val t = freshTable()
    assert(VersionedTable.latestVersion(t).isEmpty)
    assert(VersionedTable.versions(t).isEmpty)
    intercept[IllegalArgumentException] { VersionedTable.read(spark, t) }
  }

  test("commit then read round-trips; latest resolves the max version") {
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1, 2, 3))
    VersionedTable.commit(spark, t, 1L, df(4, 5))
    assert(VersionedTable.versions(t) == Seq(0L, 1L))
    assert(VersionedTable.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(4L, 5L))
    assert(VersionedTable.read(spark, t, Some(0L)).count() == 3)
  }

  test("append commit carries prior files: old rows + new rows, no rewrite") {
    val t = freshTable()
    val v0Files = VersionedTable.commit(spark, t, 0L, df(1, 2, 3))
    VersionedTable.commit(spark, t, 1L, df(10, 11),
      carried = VersionedTable.manifest(t, 0L))
    val v1 = VersionedTable.manifest(t, 1L)
    assert(v0Files.forall(v1.contains),
      "v1's manifest must list every v0 file verbatim (no data movement)")
    assert(VersionedTable.read(spark, t).count() == 5)
    // Time travel still sees only v0.
    assert(VersionedTable.read(spark, t, Some(0L)).count() == 3)
  }

  test("a crashed commit is invisible; previous version stays readable") {
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1, 2))
    VersionedTable.failedCommit(spark, t, 1L, df(99))
    assert(VersionedTable.versions(t) == Seq(0L),
      "the unrenamed manifest must not appear in the history")
    assert(VersionedTable.read(spark, t).count() == 2)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, t, Some(1L))
    }
  }

  test("expire deletes only files no retained version references") {
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1, 2, 3))
    // v1 APPENDS, carrying v0's files — those must survive v0's expiry.
    VersionedTable.commit(spark, t, 1L, df(4),
      carried = VersionedTable.manifest(t, 0L))
    // v2 rewrites fully — v1's new file becomes reclaimable once v1 dies.
    VersionedTable.commit(spark, t, 2L, df(7, 8))
    VersionedTable.failedCommit(spark, t, 3L, df(99)) // orphan litter
    val (deleted0, expired0) = VersionedTable.expire(t, keepFrom = 1L)
    assert(expired0 == 1)
    // v1 carried every v0 file, so only the orphan attempt's files die.
    assert(VersionedTable.read(spark, t, Some(1L)).count() == 4,
      "carried files must survive the carrier's ancestor expiring")
    val (_, expired1) = VersionedTable.expire(t, keepFrom = 2L)
    assert(expired1 == 1)
    assert(VersionedTable.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(7L, 8L))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, t, Some(1L))
    }
    // Refusing to expire the whole history.
    intercept[IllegalArgumentException] {
      VersionedTable.expire(t, keepFrom = 99L)
    }
    assert(deleted0 >= 1)
  }

  test("appendCommit rebases onto a racing winner without rewriting data") {
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1, 2))
    var raced = false
    val c = VersionedTable.appendCommit(spark, t, df(10, 11),
      beforeAttempt = { target =>
        if (!raced) {
          raced = true
          VersionedTable.commit(spark, t, target, df(5),
            carried = VersionedTable.manifest(t, target - 1))
        }
      })
    assert(c.conflicts == 1 && c.version == 2L)
    // The winner's file list is carried verbatim; both appends are live.
    val v1 = VersionedTable.manifest(t, 1L).toSet
    assert(v1.subsetOf(VersionedTable.manifest(t, 2L).toSet))
    assert(VersionedTable.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 5L, 10L, 11L))
    // The rebase republished the SAME data files (append- dir written
    // once): v2 adds exactly two lines beyond v1's carry.
    assert((VersionedTable.manifest(t, 2L).toSet -- v1).forall(
      _.startsWith("data/append-")))
  }

  test("appendCommit gives up after maxAttempts straight losses") {
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1))
    intercept[IllegalStateException] {
      VersionedTable.appendCommit(spark, t, df(9), maxAttempts = 2,
        beforeAttempt = { target =>
          VersionedTable.commit(spark, t, target, df(target),
            carried = VersionedTable.manifest(t, target - 1))
        })
    }
  }

  test("transact re-runs the op against the winner's snapshot") {
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(10, 20))
    var raced = false
    // op doubles every id; the racing append lands 30 mid-transaction,
    // so serializability demands 30 be doubled too.
    val c = VersionedTable.transact(spark, t,
      op = snap => snap.selectExpr("id * 2 AS id"),
      beforeAttempt = { target =>
        if (!raced) {
          raced = true
          VersionedTable.commit(spark, t, target, df(30),
            carried = VersionedTable.manifest(t, target - 1))
        }
      })
    assert(c.conflicts == 1 && c.version == 2L)
    assert(VersionedTable.read(spark, t).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(20L, 40L, 60L))
    // The lost attempt's files are orphans: expire reclaims them while
    // every retained version stays intact.
    val (deleted, _) = VersionedTable.expire(t, keepFrom = 2L)
    assert(deleted >= 1, "the discarded first-attempt files must be reclaimed")
    assert(VersionedTable.read(spark, t).count() == 3)
  }

  test("deletion vectors: O(k) delete, accumulation, compaction fold") {
    import spark.implicits._
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1, 2, 3, 4, 5))
    VersionedTable.deleteCommit(spark, t, 1L, Seq(2L).toDF("id"), "id")
    VersionedTable.deleteCommit(spark, t, 2L, Seq(4L, 9L).toDF("id"), "id")
    // Data lines untouched by both deletes.
    assert(VersionedTable.statsManifest(t, 2L).map(_._1) ==
      VersionedTable.statsManifest(t, 0L).map(_._1))
    assert(VersionedTable.read(spark, t, Some(1L))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L))
    assert(VersionedTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 5L),
      "DVs must accumulate across versions (a never-present key is a no-op)")
    assert(VersionedTable.read(spark, t, Some(0L)).count() == 5,
      "time travel must see the undeleted snapshot")
    // Stats-range reads refuse DV-bearing versions.
    intercept[IllegalArgumentException] {
      VersionedTable.readRange(spark, t, "id", 0L, 10L)
    }
    // Compaction folds the DVs; expire then reclaims them.
    VersionedTable.commit(spark, t, 3L, VersionedTable.read(spark, t, Some(2L)))
    assert(VersionedTable.deletionVectors(t, 3L).isEmpty)
    val (deleted, _) = VersionedTable.expire(t, keepFrom = 3L)
    assert(deleted >= 3, "expired data files AND dv sidecars must be reclaimed")
    assert(VersionedTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("a re-appended key survives an earlier delete (DV scoping)") {
    import spark.implicits._
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1, 2, 3))
    VersionedTable.deleteCommit(spark, t, 1L, Seq(2L).toDF("id"), "id")
    // Re-insert 2 via an append: the new file postdates the DV's
    // origin, so the DV must NOT cover it.
    VersionedTable.commit(spark, t, 2L, df(2),
      carried = VersionedTable.manifest(t, 1L))
    assert(VersionedTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      "sequence-number semantics: delete-then-reinsert must resurrect " +
        "the key, not tombstone it forever")
    // The ORIGINAL file's copy of 2 is still deleted: deleting 2 again
    // then reading v2 (pre-second-delete) must show it once.
    assert(VersionedTable.read(spark, t, Some(1L))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("deletion vectors survive expiry while a retaining version lives") {
    import spark.implicits._
    val t = freshTable()
    VersionedTable.commit(spark, t, 0L, df(1, 2))
    VersionedTable.deleteCommit(spark, t, 1L, Seq(1L).toDF("id"), "id")
    // Expire v0 only: v1 still references v0's data lines (carried)
    // and its own DV — both must survive.
    VersionedTable.expire(t, keepFrom = 1L)
    assert(VersionedTable.read(spark, t)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("publishing the same version twice fails (optimistic concurrency)") {
    val t = freshTable()
    val files = VersionedTable.commit(spark, t, 0L, df(1))
    // A racing committer of version 0: the atomic rename must refuse
    // the existing target instead of clobbering it.
    intercept[java.nio.file.FileSystemException] {
      VersionedTable.publish(t, 0L, files)
    }
    // The original commit is untouched.
    assert(VersionedTable.manifest(t, 0L) == files)
  }
}
