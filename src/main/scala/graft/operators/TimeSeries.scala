package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series operators Spark lacks natively, built Spark-first.
 *
 * The headline is the AS-OF JOIN (point-in-time / attribution join): for
 * every left row, the single most recent right row with right.ts <= left.ts
 * on the same key. Engines with native support (DuckDB `ASOF JOIN`, Pandas
 * `merge_asof`, kdb `aj`) are the semantic spec; a naive Spark translation —
 * a range join (`l.ts >= r.ts`) + per-left-row max — explodes to
 * O(|L| × matches) intermediate rows, which at 100 TB of events is the
 * difference between a working pipeline and an OOM.
 *
 * The scalable shape used here is union + ordered carry-forward:
 * tag both inputs, union them (map-side), and run ONE window per key ordered
 * by (ts, side): `last(right_payload, ignoreNulls)` carries the latest right
 * row forward into each left row. Exactly one shuffle (the window partition
 * by key), per-row O(1) state, no intermediate blow-up, and skew equals key
 * skew (same as any per-key window — salt upstream if one user dominates).
 */
object TimeSeries {

  /**
   * Backward (inclusive) as-of join: each left row picks the right row with
   * the greatest `right.tsCol <= left.tsCol` on equal `keys`. Right columns
   * come back `prefix`-ed; left rows with no prior right row get nulls —
   * LEFT OUTER semantics, like DuckDB's `ASOF LEFT JOIN`.
   *
   * `right` must be unique per (keys, tsCol) — pre-aggregate it otherwise
   * (ties would make ANY engine's as-of pick arbitrary; requiring the
   * dedupe keeps this operator a single shuffle and the semantics total).
   */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoinBackward: at least one key column")
    require(rightCols.nonEmpty, "asofJoinBackward: rightCols is empty")
    val leftCols = left.columns.toSeq
    require(!rightCols.contains(tsCol),
      s"asofJoinBackward: list right's '$tsCol' via the prefix, not rightCols")

    val lTagged = left.select(
      keys.map(col) ++:
        col(tsCol).as("__ts") +:
        lit(1).as("__side") +:
        struct(leftCols.map(col): _*).as("__l") +:
        lit(null).cast(structTypeOf(right, rightCols :+ tsCol)).as("__r") +: Nil: _*)
    // a NULL right timestamp can never satisfy right.ts <= left.ts (ASOF
    // semantics) — without this filter the ascending sort would place it
    // FIRST and carry a phantom match into every left row of the key.
    // NULL LEFT timestamps need no special case: they also sort first, so
    // no (filtered, non-null) right row precedes them and they emit the
    // outer-null row, same as the SQL spec.
    // NULL-KEY right rows are likewise dropped: the window's partitionBy
    // groups NULL keys together, but an ASOF equality condition never
    // matches NULLs (DuckDB spec) — without the filter a NULL-key left row
    // would pick up a phantom "match" from NULL-key right rows. NULL-key
    // LEFT rows still emit, with the outer-null payload.
    val rTagged = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(
      keys.map(col) ++:
        col(tsCol).as("__ts") +:
        lit(0).as("__side") +:
        lit(null).cast(structTypeOf(left, leftCols)).as("__l") +:
        struct((rightCols :+ tsCol).map(col): _*).as("__r") +: Nil: _*)

    // side=0 before side=1 at equal ts => the inclusive (<=) bound
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outLeft = leftCols.map(c => col(s"__l.$c").as(c))
    val outRight = rightCols.map(c => col(s"__match.$c").as(s"$prefix$c")) :+
      col(s"__match.$tsCol").as(s"$prefix$tsCol")
    carried.select(outLeft ++ outRight: _*)
  }

  /**
   * Exponentially time-decayed engagement score per key: for each key,
   *
   *   score = sum_i value_i * exp(-lambda * age_days_i)
   *
   * with age measured back from the corpus' max timestamp (a deterministic
   * reference — no wall-clock, so reruns and the oracle agree byte-for-byte).
   * This is the standard recency-weighted user/doc scoring used for
   * freshness-aware sampling and ranking-feature generation.
   *
   * Shape at 100 TB: the reference timestamp is ONE global max (map-side
   * partials, a broadcastable 1-row result); the decay weight is computed
   * map-side per row; the per-key score is one map-side-combined aggregation
   * — the wordcount cost class. Per-row contributions are quantized to
   * fixed-point longs (floor(x * 2^20 + 0.5)) before the sum so the result
   * is partition-order independent and engine-replayable.
   */
  def timeDecayScores(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, lambdaPerDay: Double = 0.1): DataFrame = {
    val ref = events.agg(max(unix_micros(col(tsCol))).as("__ref_us"))
    val ageDays = (col("__ref_us") - unix_micros(col(tsCol))) / 8.64e10
    val q = floor(col(valueCol) * exp(lit(-lambdaPerDay) * ageDays) *
      1048576.0 + 0.5).cast("long")
    events.crossJoin(broadcast(ref))
      .select(col(keyCol), q.as("__q"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__q")).cast("double") / 1048576.0, 6)
          .as("decayed_score"))
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c, df.schema(c).dataType,
        nullable = true)))
}
