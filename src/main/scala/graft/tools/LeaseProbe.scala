package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Subprocess arm of the CROSS-PROCESS writer-lease test (the reference's
 * multi-process concurrent-writer suite, tests/test_concurrent_inserts.py:
 * 20-195): holds `path`'s writer lease for `ms` milliseconds, printing
 * `HELD` once acquired so the parent test can race against a lease that is
 * genuinely owned by ANOTHER PROCESS — the same-JVM gate
 * (StreamingIngest.jvmLeases) is invisible across processes, so this is
 * the only way the FILE lease itself arbitrates.
 *
 *   java -cp … graft.tools.LeaseProbe hold <artifactPath> <holdMs>
 */
object LeaseProbe {
  def main(args: Array[String]): Unit = args match {
    case Array("hold", path, ms) =>
      val spark = SparkSession.builder().master("local[1]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      graft.index.WriterLock.withLease(spark, path) {
        // parent synchronizes on this line, never on timing
        println("HELD")
        Console.out.flush()
        Thread.sleep(ms.toLong)
      }
      println("RELEASED")
      Console.out.flush()
      spark.stop()
    case other =>
      sys.error(s"usage: LeaseProbe hold <path> <holdMs>; got ${other.mkString(" ")}")
  }
}
