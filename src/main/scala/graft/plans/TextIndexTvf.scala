package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * SQL table-valued functions over the stored text index — the pure-SQL
 * serving surface for [[graft.operators.TextIndex]]:
 *
 *   SELECT * FROM graft_bm25('/path/to/index', 'vector query dup')
 *   SELECT * FROM graft_bm25('/path/to/index', 'vector query dup', 50)
 *   SELECT * FROM graft_phrase('/path/to/index', 'big data', 10)
 *   SELECT * FROM graft_near('/path/to/index', 'table join hash', 4, 30)
 *
 * Each call plans the SAME DataFrame the Scala API builds (bucket-pruned
 * posting scans, broadcast stats, decimal scoring) and splices its logical
 * plan into the enclosing query, so joins against the corpus, filters and
 * further aggregation all compose — this is a TVF, not a collected UDF
 * result. Arguments must be literals: the index path and terms select
 * PARTITIONS at planning time, which is the entire point of the index.
 */
object TextIndexTvf {

  private def strLit(e: Expression, fn: String, what: String): String =
    e match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        l.value.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a non-null string literal (partition pruning " +
          "happens at planning time)")
    }

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case l: Literal if l.dataType == IntegerType && l.value != null =>
      l.value.asInstanceOf[Int]
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal")
  }

  private def words(s: String): Seq[String] =
    s.trim.split("\\s+").filter(_.nonEmpty).toSeq

  def injectInto(ext: SparkSessionExtensions): Unit = {
    ext.injectTableFunction((
      FunctionIdentifier("graft_bm25"),
      new ExpressionInfo("graft.operators.TextIndex", "graft_bm25"),
      (args: Seq[Expression]) => {
        require(args.size == 2 || args.size == 3,
          "graft_bm25(indexPath, 'terms ...'[, topN])")
        val path = strLit(args(0), "graft_bm25", "indexPath")
        val terms = words(strLit(args(1), "graft_bm25", "terms"))
        val n = if (args.size == 3) intLit(args(2), "graft_bm25", "topN")
                else 20
        graft.operators.TextIndex
          .bm25SearchIndexed(SparkSession.active, path, terms, n = n)
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo("graft.operators.TextIndex", "graft_text_stats"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_text_stats(indexPath)")
        graft.operators.TextIndex
          .textIndexStats(SparkSession.active,
            strLit(args(0), "graft_text_stats", "indexPath"))
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_phrase"),
      new ExpressionInfo("graft.operators.TextIndex", "graft_phrase"),
      (args: Seq[Expression]) => {
        require(args.size == 2 || args.size == 3,
          "graft_phrase(indexPath, 'exact phrase'[, topN])")
        val path = strLit(args(0), "graft_phrase", "indexPath")
        val phrase = words(strLit(args(1), "graft_phrase", "phrase"))
        val n = if (args.size == 3) intLit(args(2), "graft_phrase", "topN")
                else 20
        graft.operators.TextIndex
          .phraseSearchIndexed(SparkSession.active, path, phrase, n = n)
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_near"),
      new ExpressionInfo("graft.operators.TextIndex", "graft_near"),
      (args: Seq[Expression]) => {
        require(args.size == 3 || args.size == 4,
          "graft_near(indexPath, 'terms ...', slop[, topN])")
        val path = strLit(args(0), "graft_near", "indexPath")
        val terms = words(strLit(args(1), "graft_near", "terms"))
        val slop = intLit(args(2), "graft_near", "slop")
        val n = if (args.size == 4) intLit(args(3), "graft_near", "topN")
                else 20
        graft.operators.TextIndex
          .proximitySearchIndexed(SparkSession.active, path, terms,
            slop = slop, n = n)
          .queryExecution.logical: LogicalPlan
      }))
  }
}
