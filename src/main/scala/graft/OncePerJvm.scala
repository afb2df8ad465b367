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
  private val done =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Runs `setup` if `key` has not completed in this JVM yet. The setup
    * executes inside `computeIfAbsent`'s per-key mapping, so a
    * CONCURRENT caller for the same key BLOCKS until the winner's setup
    * finishes — it can never proceed into a half-written layout. A
    * setup that throws leaves the key unclaimed, so a later call
    * retries instead of trusting a partial laydown. */
  def apply(key: String)(setup: => Unit): Unit =
    done.computeIfAbsent(key, _ => { setup; java.lang.Boolean.TRUE })
}
