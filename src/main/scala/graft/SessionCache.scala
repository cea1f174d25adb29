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
  */
final class SessionCache[V](maxEntries: Int = 4) {
  private final class Holder(build: () => V) { lazy val value: V = build() }

  private val m =
    scala.collection.mutable.LinkedHashMap[(SparkSession, String), Holder]()

  def getOrCompute(s: SparkSession, key: String)(build: => V): V = {
    val h = m.synchronized {
      m.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      // re-insert on hit = LRU order; a miss reserves the slot with an
      // unforced holder so a concurrent same-key caller joins this fit
      val hh = m.remove((s, key)).getOrElse(new Holder(() => build))
      m.put((s, key), hh)
      while (m.size > maxEntries) m.remove(m.head._1)
      hh
    }
    h.value
  }

  def clear(): Unit = m.synchronized(m.clear())
}
