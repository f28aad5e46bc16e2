package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Micro-probe for the crawl routing layer's FIXED cost: times repeated
 * `warcToDocuments` runs over the tiny committed fixture (so the measured
 * time is planning + whole-stage-codegen compile + ~19 rows of eval) and
 * prints the generated-code size. Run when the routing expressions change
 * to see whether the bench-entry movement is compile cost (fixed,
 * amortizes per executor at scale) or per-row work (doesn't).
 */
object RoutingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fx = args.headOption.getOrElse(
      "src/test/resources/fixtures/warc_gen13/seg-00000.warc.gz")
    def docs() = graft.sources.WarcSource.warcToDocuments(
      graft.sources.WarcSource.readWarc(spark, fx))
    def run(): Long = {
      val t0 = System.nanoTime()
      docs().collect()
      (System.nanoTime() - t0) / 1000000
    }
    // run 1 pays analysis+codegen+JIT cold; later runs show what Spark's
    // generated-class cache (keyed on source text) saves for a REPEATED
    // identical plan — the bench's best-of-2 shape
    println(s"[routing] runs ms: ${(1 to 4).map(_ => run()).mkString(", ")}")
    val qe = docs().queryExecution
    val t0 = System.nanoTime()
    val opt = qe.optimizedPlan
    println(s"[routing] optimize ms=${(System.nanoTime() - t0) / 1000000}")
    println(s"[routing] optimizedPlan chars=${opt.toString.length}")
    opt.foreach(n => println(s"[routing]   node ${n.nodeName} " +
      s"chars=${n.simpleStringWithNodeId().length + n.argString(100000).length}"))
    println(s"[routing] root=${opt.nodeName} barrier-mentions=" +
      "graft_barrier".r.findAllIn(opt.toString.toLowerCase).length)
    println(s"[routing] ANALYZED root=${qe.analyzed.nodeName} barrier-mentions=" +
      "graft_barrier".r.findAllIn(qe.analyzed.toString.toLowerCase).length)
    opt.foreach {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        println(s"[routing] FILTER det=${f.condition.deterministic} " +
          s"cond head: ${f.condition.toString.take(200)}")
      case _ =>
    }
    val cg = org.apache.spark.sql.execution.debug.codegenString(qe.executedPlan)
    println(s"[routing] codegen chars=${cg.length}")
    spark.stop()
  }
}
