package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Connected components for dedup clustering — the step AFTER near-dup
  * pair mining (q49/q50/q55 emit pairs; a pipeline needs per-document
  * cluster ids to pick one canonical doc per cluster).
  *
  * Algorithm: alternating min-label hook + pointer jumping, the
  * standard shuffle-based CC scheme (cf. the "large-star/small-star"
  * family). Each iteration is two joins + an aggregation — all
  * key-partitioned, no driver-side graph state; the only driver values
  * are the per-iteration change count and the loop bound. Convergence is
  * O(log n) iterations on paths/cliques (pointer jumping halves tree
  * depth each round), so a 100 TB edge set costs ~tens of shuffles, each
  * map-side combined.
  */
object GraphOps {

  /** (id, root) for every vertex, root = min id of its component.
    *
    * `vertices`: one `id` column (isolated vertices keep root = id).
    * `edges`: `src`/`dst` columns, undirected (symmetrized internally).
    * Lineage is truncated per iteration. `checkpointDir = None` uses
    * executor-local checkpoints (fast; lost on executor churn) — right
    * for local mode and short jobs. Pass a reliable dir (HDFS/S3) on a
    * real cluster: a lost executor then re-reads the checkpoint instead
    * of recomputing the whole iteration chain from the source.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame = {
    val sc = vertices.sparkSession.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    def pin(df: DataFrame, eager: Boolean): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager) else df.localCheckpoint(eager)
    val sym = pin(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct(), eager = true)

    var roots = pin(vertices.select(col("id"))
      .join(sym.groupBy(col("src").as("id")).agg(min(col("dst")).as("nmin")),
            Seq("id"), "left")
      .select(col("id"), least(col("id"), coalesce(col("nmin"), col("id"))).as("root")),
      eager = true)

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // hook: the smallest root among my neighbors' roots
      val nbrRoot = sym
        .join(roots.select(col("id").as("dst"), col("root").as("dst_root")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_root")).as("nbr_root"))
      // jump: my root's root (root is total on vertices, so inner join)
      val jump = roots.select(col("id"), col("root"))
        .join(roots.select(col("id").as("root"), col("root").as("root_root")), "root")
      // lazy checkpoints: the change-count action below materializes the
      // whole chain, so each iteration still runs ONE job
      val hooked = pin(jump
        .join(nbrRoot, Seq("id"), "left")
        .select(col("id"),
          least(col("root"), col("root_root"),
                coalesce(col("nbr_root"), col("root"))).as("hook_root"),
          col("root").as("old_root")),
        eager = false)
      // second pointer jump in the SAME job: root labels only ever
      // decrease, so jumping again over the hooked roots is free
      // convergence — tree depth quarters instead of halves per
      // materialization, near-halving the iteration (and Spark job)
      // count on long chains. The lazy checkpoint on `hooked` makes the
      // self-join below read one cached RDD, not recompute the joins.
      val hookMap = hooked
        .select(col("id").as("hook_root"), col("hook_root").as("jump_root"))
      val next = pin(hooked
        .join(hookMap, "hook_root")
        .select(col("id"),
          least(col("hook_root"), col("jump_root")).as("new_root"),
          col("old_root")),
        eager = false)
      changed = next.filter(col("new_root") =!= col("old_root")).count()
      roots = next.select(col("id"), col("new_root").as("root"))
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter iterations")
    roots
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q75: dedup-cluster assignment. Edges link consecutive doc_ids
    // within a language (deterministic multi-hop chains, so convergence
    // genuinely requires the iterative propagation); output is per-cluster
    // membership stats keyed by the canonical (min) doc id.
    "q75_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val e = docs.as("a").join(docs.as("b"),
          col("a.lang") === col("b.lang") &&
          col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      val verts = docs.select(col("doc_id").as("id"))
      connectedComponents(verts, e)
        .groupBy(col("root").as("cluster_root"))
        .agg(count(lit(1)).as("n_docs"), max(col("id")).as("max_id"))
        .orderBy(col("cluster_root"))
    })
  )

  val oracles: Map[String, String] = Map(
    // consecutive-id chains make components = gaps-and-islands runs, so
    // the oracle needs window functions, not recursion
    "q75_dedup_clusters" ->
      """WITH marked AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN lag(doc_id) OVER (PARTITION BY lang ORDER BY doc_id)
        |              = doc_id - 1
        |         THEN 0 ELSE 1 END AS brk
        |  FROM documents),
        |isl AS (
        |  SELECT doc_id, lang,
        |    sum(brk) OVER (PARTITION BY lang ORDER BY doc_id
        |                   ROWS UNBOUNDED PRECEDING) AS island
        |  FROM marked)
        |SELECT min(doc_id) AS cluster_root, count(*) AS n_docs,
        |  max(doc_id) AS max_id
        |FROM isl GROUP BY lang, island ORDER BY cluster_root""".stripMargin
  )
}
