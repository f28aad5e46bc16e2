package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{BooleanType, StringType}

/**
 * SQL table-valued functions over raw crawl segments — the pure-SQL face
 * of [[graft.sources.WarcSource]], same splice-the-logical-plan discipline
 * as [[TextIndexTvf]] (the result is a real relation; filters, joins and
 * aggregates compose in the enclosing query):
 *
 *   SELECT warcType, count(1) FROM graft_warc('/crawl/seg-0.warc.gz', false)
 *   GROUP BY 1
 *   SELECT url, text FROM graft_warc_docs('/crawl/seg-0.warc.gz')
 *   WHERE length(text) > 200
 *
 * (globs work in the path argument — any Hadoop-visible glob)
 *
 * `graft_warc(glob[, keepPayload])` surfaces the record framing (census
 * passes want `keepPayload=false` — header-only, payload bytes never leave
 * the task read buffer); `graft_warc_docs(glob)` is the crawl→documents
 * bridge; `graft_warc_media(glob)` the crawl→media bridge;
 * `graft_warc_revisits(glob)` the crawler's own dedup verdicts (joinable
 * against the URL-dedup family straight from SQL);
 * `graft_warc_dispositions(glob[, minQuality])` the per-record drop census
 * (what fraction of a crawl was discarded, and why).
 */
object WarcTvf {

  private def strLit(e: Expression, fn: String, what: String): String =
    e match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        l.value.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a non-null string literal")
    }

  private def boolLit(e: Expression, fn: String, what: String): Boolean =
    e match {
      case l: Literal if l.dataType == BooleanType && l.value != null =>
        l.value.asInstanceOf[Boolean]
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a boolean literal")
    }

  def injectInto(ext: SparkSessionExtensions): Unit = {
    ext.injectTableFunction((
      FunctionIdentifier("graft_warc"),
      new ExpressionInfo("graft.sources.WarcSource", "graft_warc"),
      (args: Seq[Expression]) => {
        require(args.size == 1 || args.size == 2,
          "graft_warc(pathGlob[, keepPayload])")
        val glob = strLit(args(0), "graft_warc", "pathGlob")
        val keep = if (args.size == 2)
          boolLit(args(1), "graft_warc", "keepPayload") else true
        graft.sources.WarcSource
          .readWarc(SparkSession.active, glob, keepPayload = keep)
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_warc_docs"),
      new ExpressionInfo("graft.sources.WarcSource", "graft_warc_docs"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_warc_docs(pathGlob)")
        val glob = strLit(args(0), "graft_warc_docs", "pathGlob")
        graft.sources.WarcSource
          .warcToDocuments(
            graft.sources.WarcSource.readWarc(SparkSession.active, glob))
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_warc_media"),
      new ExpressionInfo("graft.sources.WarcSource", "graft_warc_media"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_warc_media(pathGlob)")
        val glob = strLit(args(0), "graft_warc_media", "pathGlob")
        graft.sources.WarcSource
          .warcToMedia(
            graft.sources.WarcSource.readWarc(SparkSession.active, glob))
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_warc_dispositions"),
      new ExpressionInfo("graft.sources.WarcSource",
        "graft_warc_dispositions"),
      (args: Seq[Expression]) => {
        require(args.size == 1 || args.size == 2,
          "graft_warc_dispositions(pathGlob[, minQuality])")
        val glob = strLit(args(0), "graft_warc_dispositions", "pathGlob")
        val minQ = if (args.size == 2) args(1) match {
          case l: Literal if l.value != null &&
              l.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
            l.value.toString.toDouble
          case _ => throw new IllegalArgumentException(
            "graft_warc_dispositions: minQuality must be a numeric literal")
        } else 0.0
        graft.sources.WarcSource
          .warcToDispositions(
            graft.sources.WarcSource.readWarc(SparkSession.active, glob),
            minQuality = minQ)
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_warc_revisits"),
      new ExpressionInfo("graft.sources.WarcSource", "graft_warc_revisits"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_warc_revisits(pathGlob)")
        val glob = strLit(args(0), "graft_warc_revisits", "pathGlob")
        graft.sources.WarcSource
          .warcToRevisits(
            graft.sources.WarcSource.readWarc(SparkSession.active, glob))
          .queryExecution.logical: LogicalPlan
      }))
  }
}
