package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named SparkEntry queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * plans/rNN/:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt 'runMain graft.tools.ExplainDump plans/r15 before cms_heavy_ngrams ...'
  *
  * Writes `<outDir>/<query>_<tag>.txt`. Plans are captured AFTER one
  * warm-up count() so one-time index builds / registrations don't leak
  * into the captured plan, and the plan reflects the steady state Bench
  * times.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <tag> <query>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count() // warm-up: index builds, registrations
      graft.CacheScope.releaseAll()
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      graft.CacheScope.releaseAll()
      println(s"[explain] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
