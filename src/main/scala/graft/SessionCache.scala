package graft

import org.apache.spark.sql.SparkSession

/** Session-keyed train-once memo — the shared mechanics behind the
  * Bench build entries (`dsir_train_build` et al.): at most
  * [[maxEntries]] live (session, key) entries, stopped sessions purged
  * on every access, LRU eviction.
  *
  * The fit itself runs OUTSIDE the map monitor: entries publish as
  * lazily-forced holders, so the monitor is held only for map
  * bookkeeping. Two threads racing the SAME key share one fit (the
  * holder's lazy val synchronizes on the holder alone), while fits for
  * different keys proceed in parallel — round-9 ADVICE flagged the
  * previous shape, which executed the full featurization scan and
  * driver collect while holding one global lock, serializing every
  * concurrent session through one fit. Stopped-session purging also
  * drops the strong SparkSession references the ADVICE noted.
  *
  * [[onEvict]] runs for every FORCED value leaving the cache through
  * LRU eviction or [[clear]] — the hook the DataFrame caches use to
  * unpersist their storage blocks eagerly instead of leaving them to
  * GC + ContextCleaner (round-12 ADVICE: per-sweep Bench clears and
  * long-lived multi-dir sessions accumulated stale persisted frames in
  * executor storage). Unforced holders evict silently (nothing was
  * built), and stopped-session purges skip the hook (their blocks died
  * with the context). The hook runs outside the map monitor.
  */
final class SessionCache[V](maxEntries: Int = 4,
    onEvict: V => Unit = (_: V) => ()) {
  private final class Holder(build: () => V) {
    @volatile var forced = false
    lazy val value: V = { val v = build(); forced = true; v }
  }

  private val m =
    scala.collection.mutable.LinkedHashMap[(SparkSession, String), Holder]()

  private def evictHook(h: Holder): Unit =
    if (h.forced) {
      try onEvict(h.value)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  def getOrCompute(s: SparkSession, key: String)(build: => V): V = {
    val evicted = List.newBuilder[Holder]
    val h = m.synchronized {
      m.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      // re-insert on hit = LRU order; a miss reserves the slot with an
      // unforced holder so a concurrent same-key caller joins this fit
      val hh = m.remove((s, key)).getOrElse(new Holder(() => build))
      m.put((s, key), hh)
      while (m.size > maxEntries) {
        evicted += m.head._2
        m.remove(m.head._1)
      }
      hh
    }
    evicted.result().foreach(evictHook)
    h.value
  }

  def clear(): Unit = {
    val all = m.synchronized {
      val vs = m.values.toList
      m.clear()
      vs
    }
    all.foreach(evictHook)
  }
}
