package graft.ops

/** Scratch (round 21, deleted or kept as a study main): prove the
  * direct-relation construct (InMemoryFileIndex + HadoopFsRelation +
  * baseRelationToDataFrame) produces the SAME schema and physical plan
  * as `spark.read.schema(ddl).option("basePath", ...).parquet(files)`
  * before readOrEmpty switches to it. */
object RelCompare {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val seed = DedupLedger.ensureHistoryLedger(s, d)
    val snap = IndexStore.snapshot(seed)
    val ddl = "cell INT, doc_id BIGINT, sig ARRAY<BIGINT>"
    val base = s"$seed/vectors"
    val files = snap.vectors.map(f => s"$base/$f")

    val a = s.read.schema(ddl).option("basePath", base).parquet(files: _*)
    println("== reader path schema: " + a.schema.toDDL)
    println(a.schema.map(f => s"${f.name}:${f.dataType}:${f.nullable}").mkString(", "))

    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val idx = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      s, files.map(new org.apache.hadoop.fs.Path(_)),
      Map("basePath" -> base), Some(schema))
    val ps = idx.partitionSchema
    println("== idx.partitionSchema: " +
      ps.map(f => s"${f.name}:${f.dataType}:${f.nullable}").mkString(", "))
    val dataSchema = org.apache.spark.sql.types.StructType(
      schema.filterNot(f => ps.exists(_.name.equalsIgnoreCase(f.name))))
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      idx, ps, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map("basePath" -> base))(s)
    val b = s.baseRelationToDataFrame(rel)
    println("== relation path schema: " + b.schema.toDDL)
    println(b.schema.map(f => s"${f.name}:${f.dataType}:${f.nullable}").mkString(", "))

    import org.apache.spark.sql.functions.col
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.filter(col("cell") === 3).select(col("doc_id"), col("sig"))
        .queryExecution.executedPlan.toString
    val sa = shape(a); val sb = shape(b)
    println("== plans equal (modulo ids): " +
      (sa.replaceAll("#\\d+", "#x") == sb.replaceAll("#\\d+", "#x")))
    println("---- reader plan ----"); println(sa)
    println("---- relation plan ----"); println(sb)
    // row parity
    val ca = a.count(); val cb = b.count()
    println(s"== counts: $ca vs $cb equal=${ca == cb}")
    val ha = a.selectExpr("sum(hash(cell, doc_id, sig))").head.getLong(0)
    val hb = b.selectExpr("sum(hash(cell, doc_id, sig))").head.getLong(0)
    println(s"== content hash equal: ${ha == hb}")
    s.stop()
  }
}
