package graft.index

import org.apache.spark.sql.{Row, SparkSession}

/**
 * JVM-local memo for the tiny single-row build-constant tables the stored
 * artifacts carry (`idxmeta`: bucket counts, shingle/band geometry,
 * positions flag). Every index SERVING call resolves these constants, and
 * `spark.read.parquet(...).head()` is a full Spark job (file listing +
 * schema inference + a one-task collect) — pure fixed overhead repeated on
 * every probe of an artifact whose constants, by contract, only change on
 * a rebuild.
 *
 * Entries are keyed on the directory's modification time, so a rebuild
 * (files renamed into the dir by the committer, then `_SUCCESS`) naturally
 * invalidates — no writer coordination, correct across processes. This is
 * METADATA memoization (build constants), the same class as the
 * tier-manifest cache and the query layer's corpus-size memo: query
 * results are never cached here.
 */
object ParquetMetaCache {
  private case class Entry(mtime: Long, row: Row)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** `spark.read.parquet(dir).head()`, memoized on `dir`'s mtime. Throws
    * `FileNotFoundException` when the dir is missing (callers that treat a
    * missing meta as "no index yet" already catch exactly that). */
  def headRow(spark: SparkSession, dir: String): Row = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val mtime = fs.getFileStatus(p).getModificationTime
    val e = cache.get(dir)
    if (e != null && e.mtime == mtime) e.row
    else {
      val row = spark.read.parquet(dir).head()
      cache.put(dir, Entry(mtime, row))
      row
    }
  }

  /** Test hook / explicit invalidation. */
  def invalidate(dir: String): Unit = cache.remove(dir)
}
