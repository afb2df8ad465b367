package graft

/** Run a setup action at most once per JVM per key.
  *
  * Registry rows that demonstrate a STORAGE LAYOUT (a partitioned copy,
  * a multi-generation directory) must lay that layout down before the
  * measured read — but the laydown is setup, not the operation, so bench
  * reps and repeated gate invocations must not re-time a full table
  * rewrite. Keyed per JVM rather than exists-on-disk so a stale layout
  * from another testdata generation can never satisfy a fresh process.
  */
object OncePerJvm {
  private val done = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Runs `setup` if `key` has not been claimed by this JVM yet.
    * First caller wins the claim; a setup that THROWS releases it so a
    * later call can retry instead of reading a half-written layout. */
  def apply(key: String)(setup: => Unit): Unit =
    if (done.add(key)) {
      try setup
      catch { case e: Throwable => done.remove(key); throw e }
    }
}
