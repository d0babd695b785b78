package graft.core

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Scoped ownership for persist-backed lazy plans.
  *
  * Several operators persist a shared intermediate that BACKS the returned
  * lazy plan (e.g. the shingle set both sides of a dedup self-join read),
  * so the release can only happen after the caller's action completes.
  * Before round 5 that contract was "call `clearCache()` after your
  * action" — fine for Verify/Bench, but a library caller who never clears
  * accumulates one cache entry per call. This scope closes it: wrap the
  * plan construction AND the action in [[scoped]], and every persist the
  * library [[track]]ed inside is unpersisted on exit — success or failure.
  *
  * {{{
  * val pairs = CacheScope.scoped {
  *   Dedup.minHashDedupPairs(docs, w = 3, tau = 0.5).collect()
  * } // shingle + signature caches released here
  * }}}
  *
  * Outside any scope [[track]] is a no-op and the documented
  * caller-releases contract still applies — existing callers are
  * unaffected. Scopes nest: an inner scope releases only its own persists.
  * The registration is thread-local, so build and act on the plan from the
  * thread that opened the scope (actions may fan out to executor threads —
  * that is fine; it is the driver-side construction that must stay on the
  * scope's thread).
  */
object CacheScope {
  private val active = new ThreadLocal[mutable.Buffer[DataFrame]]

  /** Register a just-persisted frame with the enclosing scope (no-op
    * without one); returns the frame for inline use. */
  def track(df: DataFrame): DataFrame = {
    val buf = active.get()
    if (buf != null) buf += df
    df
  }

  /** Run `body` (plan construction + action); on exit release every
    * persist tracked by this scope, including from nested library calls. */
  def scoped[T](body: => T): T = {
    val prev = active.get()
    val buf = mutable.Buffer.empty[DataFrame]
    active.set(buf)
    try body
    finally {
      if (prev == null) active.remove() else active.set(prev)
      buf.foreach(_.unpersist(false))
    }
  }
}
