package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Data LAYOUT for multi-dimensional scan pruning: Z-order (Morton)
 * clustering plus an explicit per-file zone map — the two halves of the
 * "skip 99% of 100 TB" story for range predicates on more than one column.
 *
 * Why this exists: a single `sortWithinPartitions(x)` makes parquet
 * row-group stats selective on `x` and useless on `y`. Interleaving the
 * bits of (x, y) into one Morton key and range-partition-sorting by it
 * gives every file a TIGHT bounding box in BOTH dimensions, so any engine
 * consulting min/max stats — parquet row-group pushdown, or the explicit
 * [[zonemap]] below — skips all files whose box misses the predicate.
 * This is the layout device behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
 * re-expressed Spark-first: one stats aggregate (broadcast), a pure
 * bit-arithmetic key (codegen'd, engine-replayable — no UDF), one range
 * shuffle, sorted files.
 *
 * The zone map is the file-level analog of the ANN index's shard manifest:
 * `(file, min/max per column)` — O(#files) rows, collected to the driver
 * (bounded: file count, not row count) and turned into an explicit file
 * list, because vanilla Spark prunes parquet at ROW-GROUP level only;
 * file-level pruning needs a manifest, and this is that manifest.
 *
 * Quantization maps each column onto a 2^bits lattice between its global
 * min and max: `clamp(floor((x - min) / (max - min) * 2^bits))`. All
 * arithmetic is fixed-order double math + integer bit ops, so an external
 * SQL oracle replays the key bit-for-bit (verified by the `zorder_key`
 * CORRECTNESS entry).
 */
object Layout {

  /** Lattice cell of `c` on `2^bits` cells between mn and mx (clamped;
    * a constant column lands every row in cell 0). */
  def quantize(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val cells = lit((1L << bits).toDouble)
    val u = (c.cast(DoubleType) - mn) / (mx - mn)
    when(mx === mn, lit(0L))
      .otherwise(least(greatest(floor(u * cells), lit(0.0)),
        cells - lit(1.0)).cast(LongType))
  }

  /** Morton interleave of the low `bits` bits of each cell: bit `b` of
    * dimension `i` lands at position `b * n + i`. Pure long bit ops —
    * whole-stage-codegen'd, no UDF. */
  def interleaveBits(cells: Seq[Column], bits: Int): Column = {
    require(cells.nonEmpty && cells.size * bits <= 62,
      s"${cells.size} dims x $bits bits must fit a signed long")
    cells.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * cells.size + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /**
   * Append a `zkey` Morton key over `cols`. Global min/max come from ONE
   * partial-aggregated row broadcast back — the only exchange; the key
   * itself is map-side arithmetic.
   */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(cols.head)).cast(DoubleType).as(s"__mn0"),
      (max(col(cols.head)).cast(DoubleType).as(s"__mx0") +:
        cols.tail.zipWithIndex.flatMap { case (c, i) =>
          Seq(min(col(c)).cast(DoubleType).as(s"__mn${i + 1}"),
            max(col(c)).cast(DoubleType).as(s"__mx${i + 1}"))
        }): _*)
    val withStats = df.crossJoin(broadcast(stats))
    val cells = cols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), col(s"__mn$i"), col(s"__mx$i"), bits)
    }
    withStats.withColumn("zkey", interleaveBits(cells, bits))
      .drop(cols.indices.flatMap(i => Seq(s"__mn$i", s"__mx$i")): _*)
  }

  /**
   * Rewrite `df` at `path` clustered by the Morton key over `cols`:
   * range-partition on zkey into `nFiles` output tasks, sort within each,
   * drop the key (it is derivable). Every output file then covers a tight
   * box in all `cols` — that locality, not the key itself, is the product.
   * One shuffle; at 100 TB run it per ingest partition (day/source) like
   * any OPTIMIZE job, not over the whole table at once.
   */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
      nFiles: Int, bits: Int = 16): Unit =
    zorderKey(df, cols, bits)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(path)

  /** Per-file zone map of `cols` at `path`: `(file, min_c, max_c, ...)`.
    * O(#files) result rows — the manifest an engine prunes with. */
  def zonemap(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(cols.head)).as(s"min_${cols.head}"),
        (max(col(cols.head)).as(s"max_${cols.head}") +:
          cols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)

  /** Materialize [[zonemap]] beside the data (`<path>_zonemap`) — pay the
    * stats pass once per layout rewrite; [[prunedRead]] then plans from the
    * manifest without touching the data files at all. Stored adjacent, not
    * inside `path`: a manifest inside the directory would join every
    * subsequent `spark.read.parquet(path)` as data. */
  def writeZonemap(spark: SparkSession, path: String,
      cols: Seq[String]): Unit =
    zonemap(spark, path, cols).coalesce(1)
      .write.mode("overwrite").parquet(s"${path.stripSuffix("/")}_zonemap")

  /** [[prunedRead]] driven by the stored manifest — with a CRASH-SAFETY NET:
    * any data file present on disk but absent from the manifest (a writer
    * died between its data append and its manifest append) is read
    * UNPRUNED and unioned in, instead of being silently omitted forever.
    * The orphan check is an O(#files) driver listing diff, the same bound
    * the manifest collect already carries; in the steady state the orphan
    * set is empty and the plan is identical to before. */
  def prunedReadStored(spark: SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    val residual = ranges.map { case (c, lo, hi) =>
      col(c).cast(DoubleType) >= lo && col(c).cast(DoubleType) <= hi
    }.reduce(_ && _)
    val zmPath = s"${path.stripSuffix("/")}_zonemap"
    val zmFs = new org.apache.hadoop.fs.Path(zmPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // manifest entirely missing (a crashed manifest rewrite's worst case):
    // degrade to the unpruned scan instead of failing every reader — the
    // next writeZonemap restores pruning
    if (!zmFs.exists(new org.apache.hadoop.fs.Path(zmPath)))
      return spark.read.parquet(path).filter(residual)
    val zm =
      try spark.read.parquet(zmPath)
      catch { case e: org.apache.spark.sql.AnalysisException =>
        // a torn manifest rewrite (dir exists, no readable footers) must
        // degrade to the unpruned scan, not fail every reader; results are
        // exact either way — only pruning is lost until the next rewrite
        Console.err.println(s"[layout] zonemap at $zmPath unreadable " +
          s"($e); serving unpruned until it is rewritten")
        return spark.read.parquet(path).filter(residual)
      }
    // input_file_name() URIs (percent-ESCAPED) and listing URIs (unescaped
    // Hadoop paths) must compare equal: go through Path -> URI -> decoded
    // path on both sides — a table dir containing a space or '%' would
    // otherwise misclassify every manifested file as an orphan and serve
    // each row twice. Normalize the manifest ONCE into a set: the orphan
    // check must stay O(#files), it runs on every pruned read.
    def norm(f: String) =
      new org.apache.hadoop.fs.Path(f).toUri.getPath
    val manifested = zm.select(col("file")).collect()
      .map(r => norm(r.getString(0))).toSet
    val orphans = listDataFiles(spark, path)
      .filterNot(f => manifested(norm(f))).toSeq.sorted
    val pruned = prunedRead(spark, path, ranges, Some(zm))
    if (orphans.isEmpty) pruned
    else pruned.unionByName(spark.read.parquet(orphans: _*).filter(residual))
  }

  /** Data files currently under `path` (recursive, Hadoop-FS; hidden and
    * commit-marker files excluded) — O(#files) driver metadata, the same
    * bound the manifest itself carries. */
  private def listDataFiles(spark: SparkSession,
      path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Set.empty
    val rootUri = fs.makeQualified(p).toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(p, true)
    val out = Set.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      // hidden-ness is a property of EVERY path component under the root,
      // not just the leaf: a recursive listing descends into _staging_<id>
      // and _temporary dirs whose inner part files have plain names —
      // classifying those as data would surface uncommitted writes
      // (explicit leaf paths bypass Spark's own hidden-path filter)
      val rel = s.getPath.toUri.getPath.stripPrefix(rootUri)
        .stripPrefix("/")
      if (!rel.split('/').exists(c =>
          c.startsWith("_") || c.startsWith(".")))
        out += s.getPath.toString
    }
    out.result()
  }

  /**
   * Append `df` to an existing z-ordered table as a NEW clustered slice
   * and refresh ONLY the appended files' manifest rows — the incremental
   * OPTIMIZE-per-ingest-partition path [[zorderWrite]]'s doc prescribes
   * (a daily ingest must not rewrite yesterday's 100 TB, nor rescan it to
   * rebuild the manifest).
   *
   * The slice is clustered against its OWN min/max lattice (the Morton key
   * is derivable scratch space, never stored, so per-slice quantization is
   * free to differ — what matters is that each new FILE covers a tight box
   * in every dimension, which per-slice stats give). The manifest gains
   * one row per appended file, computed by scanning ONLY the new files —
   * identified as the post-append minus pre-append listing, O(#files)
   * driver metadata. Appends are assumed single-writer per table (the
   * ingest-job contract); the stats pass never touches pre-existing data.
   */
  def zorderAppend(df: DataFrame, cols: Seq[String], path: String,
      nFiles: Int, bits: Int = 16, sliceId: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path.stripSuffix("/"))
    val fs = root.getFileSystem(conf)
    val clustered = zorderKey(df, cols, bits)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
    def manifestRows(files: Seq[String]) =
      spark.read.parquet(files: _*)
        .groupBy(input_file_name().as("file"))
        .agg(min(col(cols.head)).as(s"min_${cols.head}"),
          (max(col(cols.head)).as(s"max_${cols.head}") +:
            cols.tail.flatMap(c =>
              Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)
        .coalesce(1)
    val zmPath = s"${path.stripSuffix("/")}_zonemap"
    sliceId match {
      case None =>
        // legacy non-idempotent path: two writes; a crash between them
        // leaves orphan files that prunedReadStored's safety net still reads
        val before = listDataFiles(spark, path)
        clustered.write.mode("append").parquet(path)
        val fresh = (listDataFiles(spark, path) -- before).toSeq.sorted
        if (fresh.nonEmpty)
          manifestRows(fresh).write.mode("append").parquet(zmPath)
      case Some(id) =>
        // RECOVERABLE protocol (the streaming-_stream-marker discipline):
        // 1. done-marker exists → the whole slice committed before: no-op.
        // 2. scrub leftovers of a previous crashed attempt — the staging
        //    dir AND any already-installed `slice_<id>_` files (their name
        //    carries the id, so a half-done install is fully reversible).
        // 3. write to _staging_<id> (underscore ⇒ invisible to readers),
        //    rename each file in as `slice_<id>_<name>`, append the
        //    manifest rows, THEN create the marker. A crash at any point
        //    re-runs from step 2 without duplication; a crash after the
        //    manifest append but before the marker only re-installs
        //    IDENTICAL manifest rows after scrubbing... which would double
        //    them — so the manifest rows for this id are also scrubbed by
        //    rewriting the zonemap without them before re-append.
        require(id.matches("[A-Za-z0-9_-]+"), s"unsafe sliceId: $id")
        // File names carry the id, and ids may contain the `_` delimiter —
        // a raw `slice_<id>_` prefix would make slice `a`'s crash scrub
        // match (and DELETE) slice `a_b`'s committed files. Encode `_` as
        // `.` (outside the id charset, so the map is injective) — the tag
        // then contains no `_`, which makes `slice_<tag>_` prefixes
        // mutually non-nesting: the first `_` after "slice_" always ends
        // the tag, so distinct ids can never prefix-match each other.
        // MIGRATION CAVEAT: files a PRE-encoding writer half-installed for
        // an id containing `_` (legacy name `slice_a_b_*`) are invisible to
        // the new prefix, so replaying such a crashed append duplicates
        // that slice's rows. Legacy names are inherently ambiguous (the
        // original bug), so they cannot be scrubbed safely by pattern —
        // clean such leftovers manually before replaying; underscore-free
        // ids (tag == id) migrate with no caveat.
        val tag = id.replace('_', '.')
        val marker = new org.apache.hadoop.fs.Path(root, s"_slice_$id")
        if (fs.exists(marker)) return
        val staging = new org.apache.hadoop.fs.Path(root, s"_staging_$id")
        if (fs.exists(staging)) fs.delete(staging, true)
        val prefix = s"slice_${tag}_"
        val leftovers = listDataFiles(spark, path)
          .filter(f => new org.apache.hadoop.fs.Path(f).getName
            .startsWith(prefix))
        if (leftovers.nonEmpty) {
          leftovers.foreach(f =>
            fs.delete(new org.apache.hadoop.fs.Path(f), false))
          // scrub any manifest rows a crashed attempt already appended —
          // the manifest is O(#files) rows by construction, so a driver
          // collect + rewrite is bounded and avoids overwrite-from-self
          if (fs.exists(new org.apache.hadoop.fs.Path(zmPath))) {
            val zm = spark.read.parquet(zmPath)
            // match the file BASENAME against the exact slice prefix — a
            // substring contains() could hit the prefix anywhere in the
            // path (e.g. a parent dir name) and scrub an innocent row
            val base = element_at(split(col("file"), "/"), -1)
            val kept = zm.filter(!base.startsWith(prefix)).collect()
            spark.createDataFrame(
                spark.sparkContext.parallelize(kept.toSeq, 1), zm.schema)
              .write.mode("overwrite").parquet(zmPath)
          }
        }
        clustered.write.mode("overwrite").parquet(staging.toString)
        val staged = listDataFiles(spark, staging.toString)
        val installed = staged.toSeq.sorted.map { f =>
          val src = new org.apache.hadoop.fs.Path(f)
          val dst = new org.apache.hadoop.fs.Path(root,
            prefix + src.getName)
          if (!fs.rename(src, dst))
            sys.error(s"zorderAppend: rename $src -> $dst failed")
          dst.toString
        }
        fs.delete(staging, true)
        if (installed.nonEmpty)
          manifestRows(installed).write.mode("append").parquet(zmPath)
        fs.create(marker, true).close()
    }
  }

  /**
   * Read only the files whose zone-map box intersects every `(col, lo, hi)`
   * range, with the residual row filter applied on top (files overlap box
   * edges). The manifest collect is bounded by FILE count; at 100 TB
   * persist [[zonemap]]'s output once per layout rewrite and read it back
   * here instead of recomputing — the pruning logic is unchanged.
   */
  def prunedRead(spark: SparkSession, path: String,
      ranges: Seq[(String, Double, Double)],
      precomputedZonemap: Option[DataFrame] = None): DataFrame = {
    val zm = precomputedZonemap.getOrElse(
      zonemap(spark, path, ranges.map(_._1)))
    val keep = ranges.map { case (c, lo, hi) =>
      col(s"max_$c").cast(DoubleType) >= lo &&
        col(s"min_$c").cast(DoubleType) <= hi
    }.reduce(_ && _)
    val files = zm.filter(keep).select(col("file"))
      .collect().map(_.getString(0))
    val residual = ranges.map { case (c, lo, hi) =>
      col(c).cast(DoubleType) >= lo && col(c).cast(DoubleType) <= hi
    }.reduce(_ && _)
    if (files.isEmpty) spark.read.parquet(path).filter(residual).limit(0)
    else spark.read.parquet(files: _*).filter(residual)
  }
}
