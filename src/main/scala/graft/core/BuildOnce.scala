package graft.core

import scala.collection.concurrent.TrieMap

/** Memoized side-effecting layout build, at most once per (JVM, key).
  *
  * `TrieMap.getOrElseUpdate` alone evaluates the builder OUTSIDE the
  * map's atomic update, so two concurrent first calls for the same key
  * can both run it — racing two `mode("overwrite")` jobs onto the same
  * deterministic scratch path and potentially leaving a corrupt layout
  * every later probe reads (ADVICE r10). One lock per cache serializes
  * only first-time builds (rare: once per (JVM, fixture dir)); cache
  * hits stay lock-free on the TrieMap read path.
  */
final class BuildOnce[K, V] {
  private val built = TrieMap.empty[K, V]
  /** TrieMap's signature, so converting a cache touches one line. */
  def getOrElseUpdate(key: K, build: => V): V =
    built.get(key) match {
      case Some(v) => v
      case None    => synchronized { built.getOrElseUpdate(key, build) }
    }
}
