package graft.stages

import java.nio.file.{Files, Path}

/** Scratch directories for test/bench targets, cleaned up at JVM exit.
  * Streaming drains and scratch MergeTables write corpus-scale parquet
  * under the system temp dir; without cleanup, repeated verify/bench loops
  * accumulate unbounded disk. Production targets pass a real root and
  * manage retention with [[MergeTable.vacuum]] instead.
  */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  sys.addShutdownHook {
    created.forEach { p =>
      try {
        val tree = Files.walk(p)
        try tree.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
        finally tree.close()
      } catch { case _: Exception => () } // best effort at exit
    }
  }

  def scratch(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    created.add(dir)
    dir.toString
  }

  private val stable = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One scratch path PER NAME per JVM — for queries whose scratch write is
    * overwrite-mode and re-run many times in a bench session. A fresh
    * [[scratch]] per invocation leaks a full copy of the data per run until
    * JVM exit; reusing the path bounds the session's disk at one copy.
    */
  def scratchStable(name: String): String =
    stable.computeIfAbsent(name, n => scratch(n))

  /** Recursive delete — THE one definition of destructive tree removal
    * (MergeTable commits, catalog drops, write aborts all route here, so a
    * fix to e.g. concurrent-delete races reaches every caller).
    */
  def deleteTree(p: Path): Unit = {
    val tree = Files.walk(p)
    try tree.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
    finally tree.close()
  }
}
