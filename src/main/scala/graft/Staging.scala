package graft

/** Once-per-process staging registry, shared by every site that writes
  * reusable fixture-derived files (streaming replay chunks, the DPP
  * partitioned table, binary payloads): double-checked and synchronized so
  * concurrent invocations in one JVM never double-write, and a repeated
  * query run skips the rewrite entirely. Keyed by target directory; the
  * write must be idempotent per key (it runs exactly once per process).
  */
object Staging {
  private val staged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensureStaged(key: String)(write: => Unit): Unit =
    if (!staged.contains(key)) staged.synchronized {
      if (!staged.contains(key)) { write; staged.add(key) }
    }
}
