package graft.stages

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** A versioned parquet MERGE target — the storage-transactional upsert the
  * reference gets from a single Postgres transaction
  * (`sql/deliveries_stg_to_dds.sql:38-56`), re-expressed for immutable
  * columnar storage without requiring Delta/Iceberg jars.
  *
  * Protocol (the same pointer-flip idea lakehouse formats use):
  *   1. every merge computes `existing ⊳⊲ batch` with the [[Merge]]
  *      rewrites and writes it to a brand-new version directory `v<n>`;
  *   2. only after the write fully succeeds is the `_CURRENT` pointer file
  *      replaced — written to a temp name, then ATOMIC_MOVE'd over.
  * A reader resolves `_CURRENT` first, so a crash anywhere before the flip
  * leaves the previous version intact and readable; a half-written `v<n>`
  * is invisible garbage, never corruption. Because the merges themselves
  * are idempotent, re-running a failed batch converges to the same table —
  * together with write-then-advance watermark ordering this is the
  * engine's exactly-once story (SURVEY.md §7.3).
  *
  * The pointer is durable: a new `MergeTable` on the same root resumes
  * from the last committed version (restartability — what the in-memory
  * round-1 sink lacked). On object stores without atomic rename this flip
  * maps onto the store's conditional-put, exactly as Delta's LogStore does.
  */
final class MergeTable(val root: String, keys: Seq[String],
                       lockStaleMs: Long = MergeTable.DefaultLockStaleMs) {

  private def pointerPath: Path = Paths.get(root, "_CURRENT")

  /** The committed version directory, if any merge ever committed. */
  def currentVersion: Option[String] =
    if (Files.exists(pointerPath))
      Some(new String(Files.readAllBytes(pointerPath), StandardCharsets.UTF_8).trim)
    else None

  private def currentData(spark: SparkSession): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(Paths.get(root, v).toString))

  def read(spark: SparkSession, schemaIfEmpty: StructType): DataFrame =
    currentData(spark).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schemaIfEmpty))

  /** Time travel: read a specific committed version (`v0`, `v1`, …).
    * Version directories are immutable once written, so any retained
    * version is a consistent snapshot — the same contract Delta's
    * `versionAsOf` exposes.
    */
  def readVersion(spark: SparkSession, version: String): DataFrame =
    spark.read.parquet(Paths.get(root, version).toString)

  /** Small-file compaction: rewrite the CURRENT version into `numFiles`
    * parquet files as a new commit — same rows, fewer files; the
    * `OPTIMIZE` of lakehouse formats. The update-mode streaming merges
    * append one file per batch partition, so a long-lived table
    * accumulates footers faster than data; periodic compaction keeps scan
    * planning cost bounded. Runs through the same CAS commit as any
    * merge, so it is crash-safe and loudly fails under a concurrent
    * writer; previous versions stay intact for time travel until
    * [[vacuum]]. No-op on an empty table.
    */
  def compact(spark: SparkSession, numFiles: Int = 1): Unit = {
    require(numFiles >= 1, "must compact to at least one file")
    if (currentVersion.isDefined)
      commit(read(spark, new StructType())) {
        case Some(existing) => existing.repartition(numFiles)
        case None => throw new IllegalStateException(
          s"MergeTable $root: _CURRENT disappeared between the compaction's " +
            "version check and its commit — concurrent vacuum/manual deletion?")
      }
  }

  /** Drop all committed versions except the newest `keepLast` (never the
    * current one). Old versions are what time travel reads, so retention
    * is a policy knob, not garbage: this is `VACUUM`.
    */
  def vacuum(keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val cur = currentVersion.map(_.drop(1).toLong).getOrElse(return)
    val entries = Files.list(Paths.get(root))
    try entries.forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("v") && name.drop(1).forall(_.isDigit) &&
          name.drop(1).toLong <= cur - keepLast) {
        val tree = Files.walk(p)
        try tree.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(Files.delete(_))
        finally tree.close()
      }
    } finally entries.close()
  }

  /** SCD1 merge-commit: incoming wins on key collision. With
    * `evolveSchema`, columns present on only one side are null-filled on
    * the other (additive schema evolution, like `MERGE` with
    * `autoMerge`); without it, a schema drift fails loudly.
    *
    * Concurrency contract: a `MergeTable` is a SINGLE-WRITER table — run
    * one committer per root (the reference's Airflow DAG serializes its
    * merge the same way, one task instance per run). Concurrent commits
    * are not merged or queued; they are DETECTED: each commit
    * compare-and-swaps on the `_CURRENT` pointer content, so when two
    * writers race, exactly one flip wins and the loser throws
    * [[java.util.ConcurrentModificationException]] with nothing committed
    * (its staged data is cleaned up; re-running the loser on the new
    * current version converges, because merges are idempotent).
    */
  def upsert(batch: DataFrame, evolveSchema: Boolean = false): Unit = commit(batch) {
    case Some(existing) => mergeEvolved(existing, batch, evolveSchema)(
      Merge.upsert(_, _, keys))
    case None           => batch
  }

  /** Snapshot-replace commit: the new version holds exactly `snapshot`
    * (`INSERT OVERWRITE` / `CREATE OR REPLACE` semantics — for recomputed
    * artifacts like a curation survivor set, where the new state is
    * derived from table ∪ batch rather than merged row-by-row). Runs
    * through the same stage + CAS flip as the merges, so it is crash-safe,
    * conflict-detected, and previous versions stay time-travelable.
    */
  def replace(snapshot: DataFrame): Unit = commit(snapshot) { _ => snapshot }

  /** SCD0 merge-commit: first write wins. Same single-writer contract and
    * conflict detection as [[upsert]].
    */
  def insertIgnore(batch: DataFrame, evolveSchema: Boolean = false): Unit = commit(batch) {
    case Some(existing) => mergeEvolved(existing, batch, evolveSchema)(
      Merge.insertIgnore(_, _, keys))
    case None           => batch.dropDuplicates(keys)
  }

  private def mergeEvolved(existing: DataFrame, batch: DataFrame, evolve: Boolean)
                          (merge: (DataFrame, DataFrame) => DataFrame): DataFrame =
    if (!evolve) merge(existing, batch)
    else {
      import org.apache.spark.sql.functions.{col, lit}
      def widen(df: DataFrame, to: StructType): DataFrame =
        to.fields.foldLeft(df) { (d, f) =>
          if (d.columns.contains(f.name)) d
          else d.withColumn(f.name, lit(null).cast(f.dataType))
        }
      merge(widen(existing, batch.schema), widen(batch, existing.schema))
    }

  /** Commit = stage + compare-and-swap flip.
    *
    * The merge output is written to a per-commit UNIQUE staging directory
    * (two racing writers never write into the same path), then a short
    * lock-protected critical section — pointer reads/renames only, no
    * Spark work — re-reads `_CURRENT` and fails the flip if it moved since
    * this commit read its base version. On a filesystem the lock is an
    * atomic `createFile`; on an object store both the lock and the
    * pointer move map onto conditional-put (if-none-match / if-match),
    * exactly as Delta's LogStore does. The loser's staging directory is
    * deleted; committed `v<n>` directories stay immutable.
    */
  private def commit(batch: DataFrame)(merge: Option[DataFrame] => DataFrame): Unit = {
    val spark = batch.sparkSession
    val base = currentVersion
    val next = s"v${base.map(_.drop(1).toLong + 1).getOrElse(0L)}"
    val token = java.util.UUID.randomUUID().toString
    val stage = Paths.get(root, s"_stage_$token")
    merge(base.map(v => spark.read.parquet(Paths.get(root, v).toString)))
      .write.mode("overwrite").parquet(stage.toString)
    val lock = Paths.get(root, "_COMMIT_LOCK")
    try {
      acquireCommitLock(lock, token)
      try {
        if (currentVersion != base)
          throw new java.util.ConcurrentModificationException(
            s"MergeTable $root: _CURRENT moved from $base to $currentVersion " +
              s"since this merge read it — concurrent writer won; re-run this batch")
        // a pre-existing v<next> is orphan garbage from a writer that died
        // after its data write but before its flip (_CURRENT never pointed
        // at it, and we hold the lock): supersede it
        val target = Paths.get(root, next)
        if (Files.exists(target)) deleteTree(target)
        Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
        flipPointer(next, token)
      } finally Files.deleteIfExists(lock)
    } finally {
      // loser cleanup: staged data never committed
      if (Files.exists(stage)) deleteTree(stage)
    }
  }

  /** File-level commit for writers that already hold finished parquet part
    * files (the [[graft.lake]] DSv2 catalog, whose EXECUTORS write the
    * files — the driver only promotes them): the data files in `staged`
    * become the next version under the same lock + CAS flip as the
    * DataFrame commits. With `carryForward`, the current version's data
    * files are first hard-linked (copy fallback) into the new version —
    * O(files) metadata work, no data rewrite — giving append semantics;
    * without it the new version holds exactly the staged files
    * (truncate/replace semantics).
    *
    * `expectedBase` pins the snapshot the caller PLANNED against
    * (`Some(None)` = planned against an empty table): if `_CURRENT` moved
    * since, the commit throws with nothing changed — the
    * snapshot-isolation conflict check a row-level rewrite needs, since
    * its output was derived from that snapshot. `None` skips the check
    * (blind appends serialize on the lock; last committer sees the other's
    * files because carry-forward re-reads `_CURRENT` under the lock).
    *
    * @return the committed version name (`v<n>`)
    */
  def commitStagedFiles(staged: Path, carryForward: Boolean,
                        expectedBase: Option[Option[String]] = None): String = {
    val token = java.util.UUID.randomUUID().toString
    val lock = Paths.get(root, "_COMMIT_LOCK")
    try {
      acquireCommitLock(lock, token)
      try {
        val base = currentVersion
        expectedBase.foreach { eb =>
          if (base != eb)
            throw new java.util.ConcurrentModificationException(
              s"MergeTable $root: _CURRENT moved from $eb to $base since this " +
                "write planned against it — concurrent writer won; re-run the statement")
        }
        val next = s"v${base.map(_.drop(1).toLong + 1).getOrElse(0L)}"
        val target = Paths.get(root, next)
        if (Files.exists(target)) deleteTree(target)   // orphan from a dead writer
        Files.createDirectories(target)
        if (carryForward) base.foreach { v =>
          eachDataFile(Paths.get(root, v)) { f =>
            val dst = target.resolve(f.getFileName)
            try Files.createLink(dst, f)
            catch { case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
              Files.copy(f, dst) }
          }
        }
        eachDataFile(staged) { f =>
          // part names embed task UUIDs so collisions with carried files
          // can't happen in practice; stay safe anyway
          val preferred = target.resolve(f.getFileName.toString)
          val dst = if (Files.exists(preferred))
            target.resolve(s"staged-$token-${f.getFileName}") else preferred
          Files.move(f, dst)
        }
        flipPointer(next, token)
        next
      } finally Files.deleteIfExists(lock)
    } finally {
      if (Files.exists(staged)) deleteTree(staged)
    }
  }

  /** Flip `_CURRENT` to `next`: write to a per-commit unique temp name,
    * then ATOMIC_MOVE over — racing flips never collide on the scratch
    * file, and readers only ever see a complete pointer.
    */
  private def flipPointer(next: String, token: String): Unit = {
    val tmp = Paths.get(root, s"_CURRENT.$token.tmp")
    Files.write(tmp, next.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteTree(p: Path): Unit = {
    val tree = Files.walk(p)
    try tree.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
    finally tree.close()
  }

  /** Data files of a version/staging directory: skips `_SUCCESS`,
    * `_temporary` leftovers and hidden files, exactly as Spark's own file
    * index does.
    */
  private def eachDataFile(dir: Path)(f: Path => Unit): Unit = {
    val s = Files.list(dir)
    try s.forEach { p =>
      val n = p.getFileName.toString
      if (!n.startsWith("_") && !n.startsWith(".") && Files.isRegularFile(p)) f(p)
    } finally s.close()
  }

  /** Take the commit lock, or fail loudly with the holder's identity.
    *
    * The lock file carries `<owner-token> <epoch-millis>` so a stuck
    * table is diagnosable, and a holder that DIED between `createFile`
    * and its finally-cleanup does not brick the table forever (driver
    * ADVICE.md finding): once the lock's modification time is older than
    * `lockStaleMs`, contenders may take it over. Takeover is itself
    * race-free — the dead lock is first CLAIMED by an atomic rename to a
    * per-contender unique name, so exactly one contender wins the claim
    * and re-creates the lock; the rest fail with the usual concurrent-
    * commit error. The critical section is pointer reads/renames only
    * (milliseconds — the corpus-scale merge write happens BEFORE the
    * lock), so the default threshold is generous: any lock that old
    * belongs to a dead process, not a slow one. [[breakLock]] is the
    * manual override when the operator knows the holder is gone.
    */
  private def acquireCommitLock(lock: Path, token: String): Unit = {
    def tryCreate(): Boolean =
      try {
        Files.write(lock,
          s"$token ${System.currentTimeMillis()}".getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }

    if (tryCreate()) return
    val heldFor =
      try Some(System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis)
      catch { case _: java.nio.file.NoSuchFileException => None } // holder just released
    heldFor match {
      case Some(age) if age < lockStaleMs =>
        val holder =
          try new String(Files.readAllBytes(lock), StandardCharsets.UTF_8).trim
          catch { case _: java.io.IOException => "<unreadable>" }
        throw new java.util.ConcurrentModificationException(
          s"MergeTable $root: another commit holds $lock (owner '$holder', " +
            s"held ${age}ms < stale threshold ${lockStaleMs}ms) — concurrent " +
            "writer; re-run this batch, or breakLock() if the holder is known dead")
      case Some(_) =>
        // stale: claim the dead holder's lock by atomic rename — exactly
        // one contender wins; losers see NoSuchFile and fall through to
        // the re-create race below
        val claimed = Paths.get(root, s"_COMMIT_LOCK.stale.$token")
        try {
          Files.move(lock, claimed, StandardCopyOption.ATOMIC_MOVE)
          Files.deleteIfExists(claimed)
        } catch { case _: java.nio.file.NoSuchFileException => () }
      case None => () // released between create-fail and mtime read: retry
    }
    if (!tryCreate())
      throw new java.util.ConcurrentModificationException(
        s"MergeTable $root: lost the lock re-acquisition race on $lock — " +
          "another contender took over; re-run this batch")
  }

  /** Explicit repair: delete a leftover `_COMMIT_LOCK` without waiting out
    * the staleness threshold. Only safe when the operator has verified no
    * committer is live — exactly the contract of Delta's
    * `FSCK`/lock-break escape hatches.
    *
    * @return true iff a lock file existed and was removed
    */
  def breakLock(): Boolean = Files.deleteIfExists(Paths.get(root, "_COMMIT_LOCK"))
}

object MergeTable {
  /** Commit-lock staleness threshold: the critical section is pointer
    * I/O only, so 10 minutes is orders of magnitude past any live
    * holder — a lock that old is a crashed committer's leftover.
    */
  val DefaultLockStaleMs: Long = 10L * 60 * 1000

  /** Fresh table rooted in a new temp directory, deleted at JVM exit
    * (tests, scratch targets). Durable tables pass a real root instead.
    */
  def scratch(keys: Seq[String]): MergeTable =
    new MergeTable(TempDirs.scratch("graft_mergetable_"), keys)
}
