package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries in isolation (warm-up + 2 timed runs,
  * the Bench protocol) — for chasing one query's regression without paying
  * for the whole suite:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt 'runMain graft.tools.TimeQuery cms_heavy_ngrams dedup_minhash'
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench calibration sentinel, so isolated re-timings carry the same
    // host-contention evidence as the suite artifact they are checked against
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 22).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // sentinel JIT warm-up, untimed
    println(f"[time] calib=${calibrate()}%.3f")
    val names = if (args.nonEmpty) args.toSeq else sys.error("pass query names")
    names.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      graft.CacheScope.releaseAll()
      val t1 = once()
      val t2 = once()
      graft.CacheScope.releaseAll()
      println(f"[time] $name%-28s best=${math.min(t1, t2)}%.3f runs=[$t1%.3f, $t2%.3f]")
    }
    spark.stop()
  }
}
