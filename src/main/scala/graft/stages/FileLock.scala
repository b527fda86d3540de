package graft.stages

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** THE file-based mutex used by every metadata critical section in the
  * engine (MergeTable commits, lake-catalog DDL): atomic `CREATE_NEW` of
  * a lock file carrying `<owner-token> <epoch-millis>`, loud failure on
  * contention, and stale-holder takeover so a crashed process can never
  * brick its table (driver ADVICE.md finding).
  *
  * Takeover protocol: a lock older than `staleMs` is CLAIMED by an atomic
  * rename to a per-contender unique name (exactly one contender wins the
  * rename), then VERIFIED by content — a contender that raced slowly
  * enough to rename a freshly re-created LIVE lock sees non-stale content,
  * restores the file (rename preserves the original mtime, so a restored
  * orphan whose owner already released still ages out naturally), and
  * backs off. Holders re-verify ownership via [[verifyOwner]] before any
  * destructive step, so the residual worst case of any race is loud
  * failure, never two winners mutating shared state.
  *
  * On object stores both the create and the claim map onto conditional-put
  * (if-none-match / if-match), exactly as Delta's LogStore does.
  */
object FileLock {

  def acquire(lock: Path, token: String, staleMs: Long,
              what: String, retryHint: String): Unit = {
    def tryCreate(): Boolean =
      try {
        Files.write(lock,
          s"$token ${System.currentTimeMillis()}".getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }

    if (tryCreate()) return
    val observed =
      try {
        val content = new String(Files.readAllBytes(lock), StandardCharsets.UTF_8).trim
        val age = System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis
        Some((content, age))
      } catch { case _: java.io.IOException => None } // holder just released
    observed match {
      case Some((holder, age)) if age < staleMs =>
        throw new java.util.ConcurrentModificationException(
          s"$what: another writer holds $lock (owner '$holder', held ${age}ms " +
            s"< stale threshold ${staleMs}ms) — $retryHint")
      case Some((staleContent, _)) =>
        val claimed = lock.resolveSibling(s"${lock.getFileName}.stale.$token")
        try {
          Files.move(lock, claimed, StandardCopyOption.ATOMIC_MOVE)
          val got = new String(Files.readAllBytes(claimed), StandardCharsets.UTF_8).trim
          if (got != staleContent) {
            // stole a LIVE lock: put it back (its mtime is untouched by the
            // renames) and back off
            try Files.move(claimed, lock, StandardCopyOption.ATOMIC_MOVE)
            catch { case _: java.nio.file.FileSystemException => Files.deleteIfExists(claimed) }
            throw new java.util.ConcurrentModificationException(
              s"$what: raced a concurrent takeover of $lock (claimed a live lock " +
                s"owned by '$got' and restored it) — $retryHint")
          }
          Files.deleteIfExists(claimed)
        } catch { case _: java.nio.file.NoSuchFileException => () }
      case None => () // released between create-fail and read: retry
    }
    if (!tryCreate())
      throw new java.util.ConcurrentModificationException(
        s"$what: lost the lock re-acquisition race on $lock — another contender " +
          s"took over; $retryHint")
  }

  /** Holders call this before any destructive step: proceed only while the
    * lock file still carries THIS holder's token.
    */
  def verifyOwner(lock: Path, token: String, what: String, retryHint: String): Unit = {
    val owner =
      try new String(Files.readAllBytes(lock), StandardCharsets.UTF_8).trim
      catch { case _: java.io.IOException => "" }
    if (!owner.startsWith(token))
      throw new java.util.ConcurrentModificationException(
        s"$what: lock was taken over mid-operation (now owned by '$owner') — " +
          s"nothing changed; $retryHint")
  }

  /** Release only a lock this holder still owns — a contender that took
    * the lock over must not have its lock deleted by the previous
    * holder's cleanup.
    */
  def releaseIfOwner(lock: Path, token: String): Unit = {
    val owner =
      try new String(Files.readAllBytes(lock), StandardCharsets.UTF_8).trim
      catch { case _: java.io.IOException => "" }
    if (owner.startsWith(token)) Files.deleteIfExists(lock)
  }

  /** Acquire → verify → run → release-if-owner, in one shape. */
  def withLock[T](lock: Path, staleMs: Long, what: String,
                  retryHint: String)(body: => T): T = {
    val token = java.util.UUID.randomUUID().toString
    acquire(lock, token, staleMs, what, retryHint)
    try {
      verifyOwner(lock, token, what, retryHint)
      body
    } finally releaseIfOwner(lock, token)
  }
}
