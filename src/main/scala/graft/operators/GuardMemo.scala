package graft.operators

/** Bounded per-path check memo shared by the probe-time staleness guards
  * ([[AnnIndex.staleGuard]], [[DedupIndex.staleGuard]],
  * [[TextIndex.staleGuard]]): `shouldCheck` returns true at most once per
  * `intervalNanos` per path, and the map is LRU-capped (r18 ADVICE — an
  * unbounded ConcurrentHashMap grows for the JVM's life in a long-lived
  * serving process that cycles index paths, e.g. rebuilds landing at
  * fresh timestamped paths every few minutes for months). Access-ordered
  * LinkedHashMap under a lock: guard checks run on the probe-construction
  * cadence, so a coarse lock costs nothing measurable, and eviction drops
  * the least-recently-PROBED path — exactly the one least likely to need
  * its memo again.
  */
private[graft] final class GuardMemo(maxEntries: Int = 1024) {
  private val m =
    new java.util.LinkedHashMap[String, java.lang.Long](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
        size() > maxEntries
    }

  /** True when `path` has not been checked within `intervalNanos` —
    * and records the check time when it is. `intervalNanos <= 0` forces
    * every call (the spec setting).
    */
  def shouldCheck(path: String, intervalNanos: Long): Boolean = m.synchronized {
    val now = System.nanoTime()
    val last = m.get(path)
    if (last != null && intervalNanos > 0 && now - last < intervalNanos) false
    else { m.put(path, now); true }
  }

  /** Entries currently memoized — the LRU-bound spec hook. */
  def size: Int = m.synchronized(m.size())
}
