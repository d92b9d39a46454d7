package graft

/** Best-effort recursive delete for harness scratch trees (stream sink
  * dirs, throwaway checkpoint dirs, the RAM-backed local-dir root) —
  * ONE copy of the idiom; three hand-rolled walk/delete variants had
  * already diverged in error handling (r18 review).
  *
  * Tolerance is per ENTRY, not per tree: shutdown-time callers race
  * Spark's own ShutdownHookManager deleting subtrees of the same root,
  * and an entry vanishing mid-walk must not abandon the rest of the
  * cleanup (that abandonment leaked RAM-backed /dev/shm trees). Built
  * on the java.io.File API, whose listFiles/delete report failure by
  * return value instead of exceptions mid-iteration. Returns true when
  * the root no longer exists afterwards. */
object Scratch {
  def deleteRecursively(root: java.io.File): Boolean = {
    Option(root.listFiles()).foreach(_.foreach(deleteRecursively(_)))
    root.delete()
    !root.exists()
  }

  def deleteRecursively(root: java.nio.file.Path): Boolean =
    deleteRecursively(root.toFile)
}
