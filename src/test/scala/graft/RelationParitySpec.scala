package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupLedger, IndexStore}

/** Round 21: the declared-schema readers construct their relation
  * DIRECTLY (cached InMemoryFileIndex + HadoopFsRelation) instead of
  * through `spark.read.schema(ddl).parquet(files)`. These tests pin
  * that the direct construct is observably IDENTICAL to the reader
  * path — same schema, same scan shape, same partition pruning, same
  * rows — and that the frame memo can never serve a stale fileset. */
class RelationParitySpec extends SparkSpec {
  import spark.implicits._

  private def freshLedger(): String = {
    val dir = java.nio.file.Files.createTempDirectory("relpar").toString + "/led"
    val hist = (0L until 64L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i end"))
      .toDF("doc_id", "text")
    DedupLedger.buildLedger(hist, dir)
    dir
  }

  test("declared read: schema, plan shape and rows match the reader path") {
    val dir = freshLedger()
    val snap = IndexStore.snapshot(dir)
    val (_, sigs) = IndexStore.frames(spark, dir, snap,
      Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL),
      declaredSchema = true)
    val reader = spark.read.schema(IndexStore.VECTORS_DDL)
      .option("basePath", s"$dir/vectors")
      .parquet(snap.vectors.map(f => s"$dir/vectors/$f"): _*)
    assert(sigs.schema == reader.schema,
      "direct relation must expose the reader path's schema " +
        "(data cols then partition col, same nullability)")
    // partition pruning + scan shape parity on a cell-filtered read
    def shape(df: org.apache.spark.sql.DataFrame): String = {
      val d = df.filter(col("cell") === 3).select(col("doc_id"))
      d.collect() // finalize (AQE discipline: same Dataset's action)
      d.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
    }
    assert(shape(sigs) == shape(reader),
      "cell-pruned executed plan must match the reader path's")
    val a = sigs.orderBy("doc_id").collect().toSeq
    val b = reader.orderBy("doc_id").collect().toSeq
    assert(a == b, "rows must be identical")
  }

  test("frame memo: same snapshot reuses the plan; an append never serves stale") {
    val dir = freshLedger()
    val snap = IndexStore.snapshot(dir)
    def read() = IndexStore.frames(spark, dir, snap,
      Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL),
      declaredSchema = true)._2
    assert(read() eq read(),
      "same (session, fileset, ddl) must hit the frame memo")
    val before = read().count()
    DedupLedger.appendSurvivors(
      Seq((1000L, "omega psi chi phi upsilon tau extra doc"))
        .toDF("doc_id", "text"), dir, tag = "relpar-append")
    val snap2 = IndexStore.snapshot(dir)
    val after = IndexStore.frames(spark, dir, snap2,
      Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL),
      declaredSchema = true)._2
    assert(!(after eq read()), "a new fileset must construct a new frame")
    assert(after.count() == before + 1,
      "post-append read must see exactly the appended signature row")
    // the PINNED old snapshot still reads the old fileset (time travel)
    assert(read().count() == before,
      "the pinned snapshot's memoized frame must not see the append")
  }

  test("diffFrames with declared ledger DDLs matches the inference path") {
    val dir = freshLedger()
    val v1 = IndexStore.snapshot(dir)
    DedupLedger.appendSurvivors(
      Seq((2000L, "nu xi omicron pi rho sigma fresh doc"))
        .toDF("doc_id", "text"), dir, tag = "relpar-diff")
    val head = IndexStore.snapshot(dir)
    val (dx, dv) = IndexStore.diffFrames(spark, dir, v1, head,
      Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL),
      declaredSchema = true)
    val (ix, iv) = IndexStore.diffFrames(spark, dir, v1, head)
    assert(dx.orderBy("owner").collect().toSeq ==
      ix.select(dx.columns.map(col): _*).orderBy("owner").collect().toSeq)
    assert(dv.orderBy("doc_id").collect().toSeq ==
      iv.select(dv.columns.map(col): _*).orderBy("doc_id").collect().toSeq)
  }
}
