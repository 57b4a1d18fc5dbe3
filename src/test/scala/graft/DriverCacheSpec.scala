package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DriverCache, IndexStore, VectorOps}

/** VERDICT r18 Next #3/#4 — the driver-side resource bounds:
  * [[DriverCache]] (the ANN artifact memos) holds its LRU bound under
  * a 1,000-store churn with value fidelity, and the lock interner
  * never hands two threads different monitors for one store while
  * staying bounded. */
class DriverCacheSpec extends AnyFunSuite {

  test("a 1,000-store churn holds the cache at its bound, evicts LRU, " +
       "and never serves a wrong value") {
    val c = new DriverCache[String, Int](64)
    for (i <- 1 to 1000) {
      c.put(s"store-$i", i)
      // the hot key is touched every round and must survive all
      // eviction pressure (access-order, not insertion-order)
      if (i == 1) c.put("hot", -1)
      assert(c.get("hot").contains(-1), s"hot key evicted at churn $i")
    }
    assert(c.size <= 64, s"bound violated: ${c.size}")
    assert(c.get("store-1000").contains(1000))
    assert(c.get("store-1").isEmpty, "LRU must have evicted the oldest")
    // a miss is a recompute signal, never a wrong value
    for (i <- 900 to 1000; v <- c.get(s"store-$i")) assert(v == i)
  }

  test("VectorOps artifact caches are DriverCache-bounded (a gate-zone " +
       "churn cannot grow them without limit)") {
    assert(VectorOps.centsCache.max == 64)
    assert(VectorOps.storeMetaCache.max == 256)
    assert(VectorOps.storeFramesCache.max == 256)
    assert(VectorOps.queryRowsCache.max == 64)
  }

  test("lock interner: held locks survive eviction pressure; churn " +
       "stays bounded; an acquired lock is always the interned one " +
       "(two-monitor hazard, VERDICT r18 #4)") {
    val key = s"/spec/lockboundary/${System.nanoTime()}"
    val held = IndexStore.lockJvm(key)
    try {
      // churn far past the interner bound: the held lock must never be
      // evicted (eviction skips locked/queued entries)
      for (i <- 1 to 6000) IndexStore.intern(s"/spec/churn/$i")
      assert(IndexStore.interned(key, held),
        "a HELD lock was evicted — two-monitor hazard reopened")
      assert(IndexStore.lockMapSize <= 4096 + 1,
        s"interner unbounded: ${IndexStore.lockMapSize}")
    } finally held.unlock()

    // post-release, the key is evictable; a later acquisition must get
    // whatever is CURRENTLY interned even while a churn thread keeps
    // evicting — across many rounds this crosses eviction boundaries
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val churner = new Thread(() => {
      var i = 0
      while (!stop.get()) { IndexStore.intern(s"/spec/churn2/$i"); i += 1 }
    })
    churner.start()
    try {
      for (_ <- 1 to 2000) {
        val l = IndexStore.lockJvm(key)
        try assert(IndexStore.interned(key, l),
          "lockJvm returned a stale (evicted) monitor")
        finally l.unlock()
      }
    } finally { stop.set(true); churner.join() }
  }

  test("mutual exclusion through the interner under eviction churn: " +
       "no two workers inside the same store's critical section") {
    val key = s"/spec/mutex/${System.nanoTime()}"
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    var counter = 0L // deliberately unsynchronized: the lock is the fence
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val churner = new Thread(() => {
      var i = 0
      while (!stop.get()) { IndexStore.intern(s"/spec/churn3/$i"); i += 1 }
    })
    churner.start()
    val workers = (1 to 8).map(_ => new Thread(() => {
      for (_ <- 1 to 500) {
        val l = IndexStore.lockJvm(key)
        try {
          if (active.incrementAndGet() != 1) overlaps.incrementAndGet()
          counter += 1
          active.decrementAndGet()
        } finally l.unlock()
      }
    }))
    try {
      workers.foreach(_.start()); workers.foreach(_.join())
    } finally { stop.set(true); churner.join() }
    assert(overlaps.get() == 0, s"${overlaps.get()} overlapping entries")
    assert(counter == 8L * 500,
      s"lost increments under churn: $counter — the monitor was not unique")
  }
}
