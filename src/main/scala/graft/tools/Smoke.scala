package graft.tools

import org.apache.spark.sql.SparkSession

/** Manual smoke driver: runs SparkEntry.entry the way the round driver does,
  * plus a couple of error-path probes through the SQL surface. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = graft.SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()}")
    df.show(5, truncate = false)

    graft.functions.VectorFunctions.register(spark)
    // probe: dimension mismatch should fail loudly, not return garbage
    try {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").collect()
      println("[smoke] PROBE-FAIL: dimension mismatch did not raise")
    } catch {
      case e: Throwable => println(s"[smoke] dim-mismatch raises: ${e.getMessage.linesIterator.next()}")
    }
    // probe: wrong element type should be rejected at analysis time
    try {
      spark.sql("SELECT vec_dot(array(1, 2), array(3, 4))").collect()
      println("[smoke] PROBE-FAIL: int arrays accepted")
    } catch {
      case e: Throwable => println(s"[smoke] type-check rejects int arrays: ${e.getMessage.linesIterator.next()}")
    }
    spark.stop()
  }
}
