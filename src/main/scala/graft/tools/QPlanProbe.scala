package graft.tools
import org.apache.spark.sql.SparkSession
object QPlanProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, s"some text $i")).toDF("doc_id","text")
    val q = graft.operators.TextAnalysis.quality(df, "doc_id", "text")
    val opt = q.queryExecution.optimizedPlan.toString
    println(s"[qplan] text_stats occurrences=${"text_stats".r.findAllIn(opt).size}")
    println(s"[qplan] plan chars=${opt.length}")
    // timing: 200k short docs, interleaved
    val big = spark.range(200000).selectExpr("id AS doc_id",
      "concat('the quick brown fox, and a dog of value; it runs to the park in time is good doc ', id) AS text")
      .localCheckpoint()
    def t(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    def fast() = graft.operators.TextAnalysis.quality(big, "doc_id", "text").agg(org.apache.spark.sql.functions.sum("quality_score")).collect()
    def spec() = graft.operators.TextAnalysis.qualitySpec(big, "doc_id", "text").agg(org.apache.spark.sql.functions.sum("quality_score")).collect()
    fast(); spec()
    val fs = (0 until 3).map(_ => t(fast()))
    val ss = (0 until 3).map(_ => t(spec()))
    println(f"[qplan] kernel min=${fs.min}%.3f spec min=${ss.min}%.3f speedup=${ss.min/fs.min}%.2fx")
    spark.stop()
  }
}
