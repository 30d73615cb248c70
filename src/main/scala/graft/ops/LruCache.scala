package graft.ops

/** Bounded access-order LRU for session-keyed cached values — the
  * joinGet-cache pattern (functions/ChDialect.scala) generalized for
  * caches that hold persisted DataFrames: at most `cap` entries, the
  * eldest is evicted on insert, and `onEvict` runs on what is dropped
  * so the holder can unpersist it. On a long-lived session over many
  * fixture directories the persists then age out instead of
  * accumulating (round-15 verdict, "what's wrong" #2).
  *
  * Concurrency contract:
  *  - lookups/inserts are O(1) under the map's mutex;
  *  - the VALUE BUILD runs OUTSIDE the lock (a Spark job inside the
  *    mutex would serialize unrelated keys) — two threads racing on
  *    the same cold key may both build, `putIfAbsent` keeps the first;
  *  - the losing duplicate is dropped WITHOUT `onEvict`: a duplicate
  *    build of the same key persists the same logical plan, and
  *    Spark's CacheManager keys cache entries by plan — unpersisting
  *    the loser would evict the winner's cache entry too;
  *  - `onEvict` for genuinely evicted (distinct-key) entries runs
  *    after the map operation, off the mutex.
  */
final class LruCache[K, V](cap: Int, onEvict: V => Unit) {
  private val evicted = new java.util.concurrent.ConcurrentLinkedQueue[(K, V)]()
  private val m = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        if (size() > cap) { evicted.add((e.getKey, e.getValue)); true }
        else false
    })

  /** Observable build count so specs can assert both caching (no
    * rebuild on a hot key) and eviction (rebuild after falling out).
    */
  val builds = new java.util.concurrent.atomic.AtomicLong(0)

  def getOrBuild(k: K)(build: => V): V = {
    val cached = m.get(k) // synchronized, O(1)
    val v =
      if (cached != null) cached
      else {
        builds.incrementAndGet()
        val b = build // OUTSIDE the lock
        val raced = m.putIfAbsent(k, b) // synchronized, O(1)
        if (raced != null) raced else b
      }
    // run evict hooks off the mutex — but NOT for a key that was
    // re-inserted since eviction: the rebuilt value shares the evicted
    // one's logical plan, and Spark's CacheManager keys cache entries
    // by plan, so unpersisting the old frame would silently un-cache
    // the new entry too (same hazard as the putIfAbsent race above;
    // the containsKey check narrows the window to the instants between
    // this poll and the hook — acceptable for caches of idempotent
    // rebuildable frames)
    var e = evicted.poll()
    while (e != null) {
      if (!m.containsKey(e._1)) onEvict(e._2)
      e = evicted.poll()
    }
    v
  }

  def get(k: K): Option[V] = Option(m.get(k))
  def size: Int = m.size()
}
