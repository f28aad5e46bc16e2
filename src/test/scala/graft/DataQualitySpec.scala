package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DataQuality
import graft.operators.DataQuality._

/** One-pass profile/expectation gate: exact stats, verdict logic, and the
  * plan shape (a single aggregate, however many checks ride it). */
class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Some("en"), 10.0),
    (2L, Some("en"), 20.0),
    (3L, None, 30.0),
    (4L, Some("de"), -5.0),
    (4L, Some("xx"), 1000.0)).toDF("id", "lang", "v")

  test("profile: nulls, distincts, numeric stats per column") {
    val p = DataQuality.profile(df, Seq("id", "lang", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) == 5 && id.getLong(2) == 0 && id.getLong(4) == 4)
    assert(id.getDouble(5) == 1.0 && id.getDouble(6) == 4.0)
    val lang = p("lang")
    assert(lang.getLong(2) == 1)
    assert(lang.getDouble(3) == 0.2)
    assert(lang.getLong(4) == 3) // en, de, xx — nulls excluded
    assert(lang.isNullAt(5) && lang.isNullAt(6) && lang.isNullAt(7))
    val v = p("v")
    assert(v.getDouble(5) == -5.0 && v.getDouble(6) == 1000.0)
    assert(v.getDouble(7) == 211.0) // (10+20+30-5+1000)/5
    // approx path returns the same shape (values within HLL tolerance)
    val ap = DataQuality.profile(df, Seq("id"), approxDistinct = true)
      .head()
    assert(math.abs(ap.getLong(4) - 4L) <= 1)
  }

  test("expectations: verdicts, observed values, one aggregate pass") {
    val out = DataQuality.runExpectations(df, Seq(
      expectRowCountBetween(1, 10),
      expectRowCountBetween(6, 10),
      expectMaxNullFrac("lang", 0.25),
      expectMaxNullFrac("lang", 0.1),
      expectUnique("id"),
      expectValuesBetween("v", 0.0, 100.0),
      expectAcceptedValues("lang", Seq("en", "de"), 0.7)))
    val rows = out.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows(0) == (("row_count_between_1_10", 5.0, true)))
    assert(rows(1) == (("row_count_between_6_10", 5.0, false)))
    assert(rows(2) == (("null_frac_lang_le_0.25", 0.2, true)))
    assert(rows(3) == (("null_frac_lang_le_0.1", 0.2, false)))
    assert(rows(4) == (("unique_id", 4.0, false))) // id 4 duplicated
    assert(rows(5) == (("values_v_in_0.0_100.0", 2.0, false)))
    assert(rows(6)._1 == "accepted_lang_ge_0.7")
    assert(rows(6)._2 == 0.75 && rows(6)._3)
    // ONE pass over the input, however many checks ride it: the source is
    // scanned exactly once (the distinct adds its Expand + exchange above
    // that single scan — never a job per check)
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val scans = flatten(out.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    assert(scans == 1, s"expected exactly one source scan, saw $scans")
  }

  test("empty input: profile counts zero rows without dividing by it") {
    val empty = df.filter($"id" < 0)
    val p = DataQuality.profile(empty, Seq("id")).head()
    assert(p.getLong(1) == 0 && p.getLong(4) == 0)
    val e = DataQuality.runExpectations(empty,
      Seq(expectAcceptedValues("lang", Seq("en"), 0.5))).head()
    assert(!e.getBoolean(2) && e.getDouble(1) == 0.0)
  }
}
