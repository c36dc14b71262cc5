package graft

import org.apache.spark.sql.SparkSession

/** Weak-keyed memoized session clones — the gate-session pattern shared
  * by the streaming oracle, the runtime-filter rule driver, and the AQE
  * skew gate.
  *
  * `SparkSession.newSession` shares the SparkContext, catalog, and cache
  * but owns an independent SQLConf, so per-gate knobs set ONCE on the
  * clone never touch the caller's session. The caller's runtime conf is
  * folded in first; only the gate's own knobs diverge.
  *
  * Keys are held WEAKLY: a strong `parent → clone` map would pin every
  * stopped parent session (and its SessionState) for the life of the
  * JVM — the leak `Tables`' weak/LRU caches already guard against. The
  * clone does not reference its parent (only the shared context), so
  * the value never pins the key.
  */
object SessionClones {

  private val caches =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.Map[SparkSession, SparkSession]]()

  /** The memoized clone of `parent` for `tag`, created (and `configure`d
    * exactly once) on first use. Distinct tags get independent clones. */
  def cloned(tag: String, parent: SparkSession)
            (configure: SparkSession => Unit): SparkSession = {
    val cache = caches.computeIfAbsent(tag, _ =>
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[SparkSession, SparkSession]()))
    // synchronizedMap's mutex is the wrapper itself — compound get/put
    // must hold it (per its contract)
    cache.synchronized {
      val existing = cache.get(parent)
      if (existing != null) existing
      else {
        val s = parent.newSession()
        parent.conf.getAll.foreach { case (k, v) =>
          try s.conf.set(k, v)
          catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf
        }
        configure(s)
        cache.put(parent, s)
        s
      }
    }
  }
}
