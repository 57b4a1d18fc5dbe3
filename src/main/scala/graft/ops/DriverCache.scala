package graft.ops

/** Bounded driver-side artifact memo (VERDICT r18 Next #3): the ANN
  * serve path keeps per-store artifacts on the driver — k×dim centroid
  * sets, PQ codebooks, snapshot-keyed serve frames, fixture query rows
  * — which the previous `ConcurrentHashMap`s grew one entry per store
  * directory FOREVER: gate zones mint a fresh dir per execution, so a
  * long-lived tailer serving many stores leaked without bound.
  *
  * This is an access-order `LinkedHashMap` under its own monitor,
  * evicting least-recently-used past `max`. Eviction is always safe:
  * every consumer treats a miss as "recompute and re-insert" with
  * values derived deterministically from fingerprinted on-disk state,
  * so a bound can only cost a recompute, never change a result (zero
  * hash changes — DriverCacheSpec churns 1,000 stores through a cache
  * and pins both the bound and value fidelity). Driver-side only and
  * low-traffic (a handful of ops per serve CALL, not per row), so one
  * monitor is cheaper than lock-striping.
  */
private[graft] final class DriverCache[K, V](val max: Int) {
  require(max > 0, "DriverCache bound must be positive")
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > max
  }
  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
  def size: Int = m.synchronized(m.size())
  private[graft] def clear(): Unit = m.synchronized { m.clear() }
}
