package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator catalog: one named query per implemented
  * operator from SURVEY.md §2 (plus the mandated LLM-pipeline extension
  * ops), each paired with ANSI SQL in `oracleSql` that DuckDB runs over
  * the same parquet tables for the hash-compare correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Cleaning.queries ++
      ops.TimeWindows.queries ++ ops.TextOps.queries ++ ops.VectorOps.queries ++
      ops.DedupOps.queries ++ ops.Advanced.queries ++
      ops.FunctionFamilies.queries ++ ops.PipelineOps.queries ++
      ops.PipelineOps.queries2 ++ ops.GraphOps.queries ++ ops.CurationOps.queries ++
      ops.SemanticOps.queries ++ ops.DedupLedger.queries ++ ops.BpeOps.queries ++ ops.TickOps.queries ++ jobs.JobRecordGate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Cleaning.oracles ++
      ops.TimeWindows.oracles ++ ops.TextOps.oracles ++ ops.VectorOps.oracles ++
      ops.DedupOps.oracles ++ ops.Advanced.oracles ++
      ops.FunctionFamilies.oracles ++ ops.PipelineOps.oracles ++
      ops.GraphOps.oracles ++ ops.CurationOps.oracles ++
      ops.SemanticOps.oracles ++ ops.DedupLedger.oracles ++ ops.BpeOps.oracles ++ ops.TickOps.oracles ++ jobs.JobRecordGate.oracles
}
