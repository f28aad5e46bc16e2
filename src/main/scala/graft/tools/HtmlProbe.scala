package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * A/B probe for the HTML→text extraction hot path: the chained-regex
 * specification (`WarcSource.htmlText`, ~22 regexp_replace passes) vs the
 * single-pass native kernel (`html_to_text`, two linear scans) over a
 * synthetic html corpus shaped like real pages (tags, entities, a script
 * and style block, numeric refs). Interleaved A/B/A/B timing — this host's
 * wall clock drifts ±60% between back-to-back runs, so only interleaved
 * minima are comparable. Prints per-variant min seconds and the ratio;
 * also cross-checks value equality on the corpus (count of differing rows
 * must be 0).
 */
object HtmlProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    // ~4 KB page per row: paragraphs with entities + one script/style block
    val para = "<p>Lorem ipsum &amp; dolor &#8212; sit amet, " +
      "consectetur&nbsp;adipiscing elit, sed do eiusmod tempor " +
      "incididunt ut labore. Caf&eacute; &#x2019;quote&#8217; " +
      "latency &lt;10ms at the 99th percentile &#38; beyond.</p>"
    val page = "<html><head><title>Doc</title><style>p{margin:0}</style>" +
      "<script>var t=performance.now();</script></head><body>" +
      "<!-- boilerplate -->" + (para * 12) + "</body></html>"
    val docs = spark.range(nDocs)
      .select(concat(lit(page), lit("<p>doc "), col("id"), lit("</p>"))
        .as("h"))
      .localCheckpoint()

    val chain = graft.sources.WarcSource.htmlText(col("h"))
    val kernel = call_function("html_to_text", col("h"))
    val diff = docs.filter(!(chain <=> kernel)).count()
    println(s"[html] value diffs=$diff over $nDocs docs")
    require(diff == 0, "kernel diverged from the regex chain")

    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(sum(length(c))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(chain); time(kernel) // JIT/codegen warm-up, untimed
    val (as, bs) = (Array.fill(4)(0.0), Array.fill(4)(0.0))
    (0 until 4).foreach { i => as(i) = time(chain); bs(i) = time(kernel) }
    val (a, b) = (as.min, bs.min)
    println(f"[html] chain min=$a%.3f s  kernel min=$b%.3f s  " +
      f"speedup=${a / b}%.2fx  (chain runs: ${as.map(v => f"$v%.2f").mkString(",")}; " +
      s"kernel runs: ${bs.map(v => f"$v%.2f").mkString(",")})")

    // same A/B for the quality score, over the extracted TEXT (the gate's
    // real input shape)
    graft.operators.TextAnalysis.register(spark)
    val texts = docs.select(call_function("html_to_text", col("h")).as("t"))
      .localCheckpoint()
    val qChain = graft.operators.TextAnalysis.qualityScore(col("t"))
    val qKernel = call_function("quality_score", col("t"))
    val qDiff = texts.filter(!(qChain <=> qKernel)).count()
    println(s"[quality] value diffs=$qDiff over $nDocs docs")
    require(qDiff == 0, "quality kernel diverged from the Column formula")
    def timeQ(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      texts.select(sum(c)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    timeQ(qChain); timeQ(qKernel)
    val (qa, qb) = (Array.fill(4)(0.0), Array.fill(4)(0.0))
    (0 until 4).foreach { i => qa(i) = timeQ(qChain); qb(i) = timeQ(qKernel) }
    println(f"[quality] chain min=${qa.min}%.3f s  kernel min=${qb.min}%.3f s  " +
      f"speedup=${qa.min / qb.min}%.2fx")
    spark.stop()
  }
}
