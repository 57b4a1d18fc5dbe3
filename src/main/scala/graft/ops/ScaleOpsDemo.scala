package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable demo of the skew/bucketing toolbox on synthetic skewed data.
  * Run: sbt "runMain graft.ops.ScaleOpsDemo"
  */
object ScaleOpsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rows = (0 until 5000).map { i =>
      (if (i % 20 == 0) s"k${i % 37}" else "HOT", i.toLong, s"v$i")
    }
    val fact = rows.toDF("key", "uid", "payload")
    val dim = ((0 until 37).map(i => (s"k$i", s"d$i")) :+ ("HOT", "dHOT"))
      .toDF("key", "attr")

    val plainN = fact.join(dim, "key").count()
    val salted = ScaleOps.saltedEquiJoin(fact, dim, "key", "uid", 8)
    println(s"[demo] plain=$plainN salted=${salted.count()} (must match)")

    val agg = ScaleOps.saltedCollectList(fact, "key", "payload", "uid", 8)
    println("[demo] HOT key collected size: " +
      agg.filter($"key" === "HOT").select(size($"payloads")).head.getInt(0))
    spark.stop()
  }
}
