package graft.tools

import org.apache.spark.sql.SparkSession

/** Print N samples of the Bench calibration sentinel at $SPARK_GRAFT_CPUS —
  * for recording the per-core-count calm references in BENCH_CALIB.json
  * from a host verified idle (/proc/stat):
  *
  *   SPARK_GRAFT_CPUS=8 sbt 'runMain graft.tools.CalibProbe 7'
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // sentinel JIT warm-up, untimed (the Bench protocol)
    val samples = (0 until n).map { _ => Thread.sleep(300); calibrate() }
    val med = samples.sorted.apply(samples.length / 2)
    println(f"[calib] cpus=$cpus samples=${samples.map(v => f"$v%.4f").mkString("[", ",", "]")} median=$med%.4f")
    spark.stop()
  }
}
