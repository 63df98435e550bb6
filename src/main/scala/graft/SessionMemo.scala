package graft

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Session-scoped memo for build-once artifacts (bucketed tables, ANN
  * indexes, dedup signature snapshots): the session-lifetime analog of a
  * persisted index/layout artifact at 100 TB, so repeated queries measure
  * probe/steady-state cost instead of re-paying the build.
  *
  * Two leak classes this design closes (round-2 advice):
  *  - a bare identity-hash key can recur after GC and hand a new session an
  *    artifact bound to a stopped session's plan — here every entry pins its
  *    owning session with a strong reference (so it cannot be collected out
  *    from under its key) and is returned only when the requesting session
  *    IS that object (`eq`); a hash collision between live sessions rebuilds
  *    instead of cross-wiring;
  *  - entries of stopped sessions are evicted on every access, each through
  *    its release hook (unpersist etc.), so cached DataFrames and their
  *    sessions are not retained for the JVM lifetime.
  */
object SessionMemo {

  private final case class Entry(session: SparkSession, value: Any,
      release: Any => Unit)

  private val entries = TrieMap.empty[String, Entry]

  /** Get or build the artifact for (session, key). `release` runs when the
    * entry is evicted after its session stops (best-effort: eviction happens
    * on the next SessionMemo access from any caller).
    */
  def getOrElseUpdate[T](session: SparkSession, key: String)(build: => T)(
      release: T => Unit): T = {
    evictStopped()
    val k = s"${System.identityHashCode(session)}:$key"
    entries.get(k) match {
      case Some(e) if e.session eq session => e.value.asInstanceOf[T]
      case stale =>
        stale.foreach(e => scala.util.Try(e.release(e.value)))
        val e = Entry(session, build, release.asInstanceOf[Any => Unit])
        entries.put(k, e)
        e.value.asInstanceOf[T]
    }
  }

  private def evictStopped(): Unit =
    entries.keys.foreach { k =>
      entries.get(k).filter(_.session.sparkContext.isStopped).foreach { _ =>
        entries.remove(k).foreach(e => scala.util.Try(e.release(e.value)))
      }
    }
}
