package graft

import org.apache.spark.sql.functions._
import graft.ops.IndexStore

/** VERDICT r18 Next #2 — the adversarial maintenance-interleaving
  * matrix. q180 pins forget→refine through the catalog oracle; this
  * spec drives the CROSS-OPERATION interleavings deterministically and
  * concurrently (fence disabled = the object-store condition, no
  * advisory locks):
  *
  *   1. a forget landing BETWEEN a replacement's frame read and its
  *      commit (the q180 hazard at primitive level, injected exactly);
  *   2. compact racing forget, both start orders, unfenced;
  *   3. replacement racing replacement (two compactions) — the
  *      append-biased OCC carry would DUPLICATE the winner's rewrite,
  *      so the loser must abort on the manifest's replace marker and
  *      [[IndexStore.compact]] must retry from the winner's head;
  *   4. a crash between a forget's tombstone parquet write and its
  *      manifest commit — the orphan is invisible and vacuumable.
  *
  * Invariants asserted throughout: no resurrection (a forgotten owner
  * never reappears on any read path), no lost tombstone, no lost
  * delta, no duplicated row. */
class MaintenanceRaceSpec extends SparkSpec {
  import spark.implicits._

  private def buildStore(owners: Seq[Long]): String = {
    val dir = java.nio.file.Files.createTempDirectory("mrace").toString
    IndexStore.setProps(dir, Map("modalities" -> "text"))
    IndexStore.commitRebuild(dir) {
      owners.map(o => ((o % 2).toInt, s"h$o", o))
        .toDF("cell", "h", "owner").repartition(1)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
      owners.map(o => ((o % 2).toInt, o, Seq(o)))
        .toDF("cell", "doc_id", "sig").repartition(1)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/vectors")
    }
    dir
  }

  private def liveOwners(dir: String): Set[Long] =
    IndexStore.frames(spark, dir, IndexStore.snapshot(dir))._1
      .select(col("owner")).collect().map(_.getLong(0)).toSet

  private def ownerRows(dir: String): Seq[Long] =
    IndexStore.frames(spark, dir, IndexStore.snapshot(dir))._1
      .select(col("owner")).collect().map(_.getLong(0)).toSeq.sorted

  test("1. forget lands between a scoped replacement's frame read and " +
       "its commit: the tombstone is carried, the rewrite's physical " +
       "copy of the forgotten row never resurrects, compaction folds") {
    val owners = (0L until 10L)
    val dir = buildStore(owners)
    val head = IndexStore.snapshot(dir)
    // the replacement's READ happens here, pre-forget: cell-0 rows
    // including owner 4 — exactly what a refine stages
    val cell0Codes = IndexStore.frames(spark, dir, head)._1
      .filter(col("cell") === 0).collect().toSeq
    val cell0Vecs = IndexStore.frames(spark, dir, head)._2
      .filter(col("cell") === 0).collect().toSeq
    assert(cell0Codes.exists(_.getAs[Long]("owner") == 4L))
    val baseScope = head.copy(
      codes = head.codes.filter(_.startsWith("cell=0/")),
      vectors = head.vectors.filter(_.startsWith("cell=0/")),
      tombs = Nil)
    IndexStore.commitReplace(dir, baseScope) {
      cell0Codes.map(r => (0, r.getAs[String]("h"), r.getAs[Long]("owner")))
        .toDF("cell", "h", "owner").repartition(1)
        .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
      cell0Vecs.map(r => (0, r.getAs[Long]("doc_id"),
          r.getSeq[Long](r.fieldIndex("sig"))))
        .toDF("cell", "doc_id", "sig").repartition(1)
        .write.mode("append").partitionBy("cell").parquet(s"$dir/vectors")
      // the injected interleaving: a takedown commits AFTER the
      // rewrite was staged from pre-forget frames, BEFORE the
      // replacement publishes
      IndexStore.forget(spark, dir, "text",
        Seq(4L).toDF("owner"), Some("mid-replace-takedown"))
      ()
    }
    assert(IndexStore.snapshot(dir).tombs.nonEmpty,
      "the replacement dropped the mid-flight tombstone (lost takedown)")
    assert(liveOwners(dir) == owners.toSet - 4L,
      "resurrection: the rewrite's pre-forget copy of owner 4 is served")
    IndexStore.compact(spark, dir)
    assert(IndexStore.snapshot(dir).tombs.isEmpty,
      "compaction must fold the carried tombstone into a physical drop")
    assert(liveOwners(dir) == owners.toSet - 4L)
    // physical: no retained data file contains the forgotten owner
    val snap = IndexStore.snapshot(dir)
    val raw = spark.read.option("basePath", s"$dir/codes")
      .parquet(snap.codes.map(f => s"$dir/codes/$f"): _*)
    assert(raw.filter(col("owner") === 4L).isEmpty,
      "the fold left the forgotten row physically present")
  }

  test("2. compact racing forget, unfenced, both start orders: no lost " +
       "tombstone, no resurrection, no lost row") {
    for (forgetFirst <- Seq(true, false)) {
      val owners = (0L until 12L)
      val dir = buildStore(owners)
      IndexStore.fenceDisabledForTest = true
      try {
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        def thread(body: => Unit) = new Thread(() =>
          try body catch { case t: Throwable => errs.add(t); () })
        val tForget = thread {
          IndexStore.forget(spark, dir, "text",
            Seq(3L).toDF("owner"), Some(s"race-$forgetFirst"))
          ()
        }
        val tCompact = thread { IndexStore.compact(spark, dir); () }
        val (first, second) =
          if (forgetFirst) (tForget, tCompact) else (tCompact, tForget)
        first.start(); Thread.sleep(30); second.start()
        first.join(); second.join()
        assert(errs.isEmpty, s"maintenance thread died: ${errs.peek()}")
      } finally IndexStore.fenceDisabledForTest = false
      assert(liveOwners(dir) == owners.toSet - 3L,
        s"forgetFirst=$forgetFirst: expected exactly owners minus the " +
        s"takedown, got ${liveOwners(dir)}")
      assert(ownerRows(dir) == (owners.toSet - 3L).toSeq.sorted,
        s"forgetFirst=$forgetFirst: duplicated or lost rows")
      // whatever the interleaving, the NEXT compaction converges to a
      // physically clean store
      IndexStore.compact(spark, dir)
      assert(IndexStore.snapshot(dir).tombs.isEmpty)
      assert(ownerRows(dir) == (owners.toSet - 3L).toSeq.sorted)
    }
  }

  test("3. replacement racing replacement: the OCC carry would duplicate " +
       "the winner's rewrite, so the loser aborts on the replace marker " +
       "and compact() retries from the winner's head — rows exactly once") {
    val owners = (0L until 16L)
    val dir = buildStore(owners)
    IndexStore.fenceDisabledForTest = true
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val ts = (1 to 2).map(_ => new Thread(() =>
        try { IndexStore.compact(spark, dir); () }
        catch { case t: Throwable => errs.add(t); () }))
      ts.foreach(_.start()); ts.foreach(_.join())
    } finally IndexStore.fenceDisabledForTest = false
    assert(errs.isEmpty, s"compaction thread died: ${errs.peek()}")
    assert(ownerRows(dir) == owners.sorted,
      "replacement-vs-replacement race duplicated or lost rows")
  }

  test("3b. the guard itself: a commitReplace staged against a base " +
       "below a landed replacement fails by name, never publishes") {
    val dir = buildStore(0L until 6L)
    val stale = IndexStore.snapshot(dir)
    IndexStore.compact(spark, dir) // lands a replace-marked manifest
    val vAfter = IndexStore.headVersion(dir)
    val thrown = intercept[IndexStore.ConcurrentReplacementException] {
      IndexStore.commitReplace(dir, stale) { () }
    }
    assert(thrown.baseVersion == stale.version)
    assert(IndexStore.headVersion(dir) == vAfter,
      "the aborted replacement must publish nothing")
    assert(ownerRows(dir) == (0L until 6L).sorted)
  }

  test("4. crash between a forget's tombstone write and its manifest " +
       "commit: the orphan is invisible to every reader and vacuum " +
       "reclaims it") {
    val owners = (0L until 8L)
    val dir = buildStore(owners)
    // the crash artifact: tombstone parquet on disk, no commit
    Seq(("text", 2L)).toDF("modality", "id")
      .repartition(1).write.mode("append").partitionBy("modality")
      .parquet(s"$dir/tombs")
    assert(IndexStore.snapshot(dir).tombs.isEmpty,
      "an uncommitted tombstone file must not enter any snapshot")
    assert(liveOwners(dir) == owners.toSet,
      "an uncommitted tombstone file must not subtract rows")
    val reclaimed = IndexStore.vacuum(dir)
    assert(reclaimed >= 1, "vacuum must reclaim the orphaned tombstone file")
    // the takedown REPLAYED after the crash commits normally
    IndexStore.forget(spark, dir, "text", Seq(2L).toDF("owner"),
      Some("post-crash-retry"))
    assert(liveOwners(dir) == owners.toSet - 2L)
    IndexStore.compact(spark, dir)
    assert(IndexStore.snapshot(dir).tombs.isEmpty)
    assert(liveOwners(dir) == owners.toSet - 2L)
  }
}
