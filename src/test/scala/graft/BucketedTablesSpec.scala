package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BucketedTables

/** The bucketing contract: co-located storage makes the repeated-join hot
  * path shuffle-free, and results are identical to the plain-parquet path. */
class BucketedTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("same-key same-count bucketed join: zero Exchange, identical result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val stats = docs.groupBy(col("doc_id"))
      .agg(max(col("n_chars")).as("mx")) // second table keyed on doc_id
    BucketedTables.writeBucketed(docs, "docs_b", "doc_id", 8, s"$dir/docs")
    BucketedTables.writeBucketed(stats, "stats_b", "doc_id", 8, s"$dir/stats")
    // force the sort-merge path: a broadcast join would dodge the shuffle
    // for the wrong reason and make the assertion vacuous
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = BucketedTables.table(spark, "docs_b")
        .join(BucketedTables.table(spark, "stats_b"), "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // the stored per-bucket sort: since SPARK-32859 the scan only REPORTS
      // its ordering under the legacy conf, so by default a (cheap, runs on
      // presorted single-file buckets) Sort remains; with the conf on it
      // must vanish — this pins the knob writeBucketed's doc promises
      withConfs(
        "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
        val j2 = BucketedTables.table(spark, "docs_b")
          .join(BucketedTables.table(spark, "stats_b"), "doc_id")
        val p2 = j2.queryExecution.executedPlan.toString
        assert(!p2.contains("Exchange") && !p2.contains("Sort "),
          s"sorted bucketed join must neither shuffle nor re-sort:\n$p2")
      }
      // identical rows vs the plain-parquet join
      val plainJ = docs.join(stats, "doc_id")
      assert(j.exceptAll(plainJ).count() == 0 &&
        plainJ.exceptAll(j).count() == 0)
      val plainPlan = plainJ.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        s"control: the unbucketed join should shuffle:\n$plainPlan")
    }
    // groupBy on the bucket key also consumes the stored partitioning
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val g = BucketedTables.table(spark, "docs_b")
        .groupBy(col("doc_id")).agg(count(lit(1)))
      val gplan = g.queryExecution.executedPlan.toString
      assert(!gplan.contains("Exchange"),
        s"groupBy on bucket key must not shuffle:\n$gplan")
    }
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")
  }

  test("mismatched bucket counts still join correctly (one side re-shuffles)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed2").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    BucketedTables.writeBucketed(docs, "docs_b8", "doc_id", 8, s"$dir/b8")
    BucketedTables.writeBucketed(docs.select(col("doc_id")), "docs_b4",
      "doc_id", 4, s"$dir/b4")
    val n = BucketedTables.table(spark, "docs_b8")
      .join(BucketedTables.table(spark, "docs_b4"), "doc_id").count()
    assert(n == docs.count())
    spark.sql("DROP TABLE IF EXISTS docs_b8")
    spark.sql("DROP TABLE IF EXISTS docs_b4")
  }
}
