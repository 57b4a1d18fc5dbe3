package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom expressions, so pure-SQL
  * users (spark.sql / thrift) get the same surface as the Column API:
  *
  *   graft.functions.GraftFunctions.registerAll(spark)
  *   spark.sql("SELECT is_similar_rgb(c, 'rgb(1,2,3)', 5) FROM t")
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "is_similar_rgb", exprs => IsSimilarRgb(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "ldot", exprs => LongArrayDot(exprs(0), exprs(1)), "scala_udf")
  }
}
