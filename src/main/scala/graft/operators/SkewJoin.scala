package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-proof equi-join: the classic salting rewrite for power-law keys,
 * packaged so the result is BYTE-IDENTICAL to the plain join.
 *
 * The problem at 100 TB: a shuffle join hash-partitions both sides on the
 * key, so one dominant key (the null-ish user, the default label, the
 * viral document) lands its entire row set in ONE reducer — that task runs
 * hours while 999 executors idle, or OOMs. AQE's skew-join splitter
 * (`spark.sql.adaptive.skewJoin`) handles many cases post-hoc by splitting
 * oversized partitions; salting is the PLANNED fix when the skew is known
 * and extreme (AQE can only split a partition it can measure, and a
 * sort-merge join's sort on the hot partition already paid the cost).
 *
 * Rewrite: the fact side gets a deterministic per-row salt in
 * `[0, nSalts)` (xxhash64 of a caller-named row-identity column — a pure
 * codegen'd builtin, so a recomputed stage reproduces the same salts;
 * never `rand()`, whose retry non-determinism can drop/duplicate rows in
 * a recomputed stage. The salt is internal — dropped before the result —
 * so unlike the repo's oracle-replayed hashes it does not need the
 * md5-low-60 idiom, and xxhash64 is an order of magnitude cheaper per
 * row than md5 + hex conv);
 * the dim side is replicated `nSalts`× with a generated salt column, and
 * the join key becomes `(key, salt)` — the hot key now spreads over
 * `nSalts` reducers. Cost: dim rows shuffled `nSalts`× (choose the
 * smaller side as `dim`; if dim broadcasts, you don't need salting).
 *
 * Join types: inner / left_outer / left_semi / left_anti — each fact row
 * carries exactly ONE salt, so fact-side multiplicity is preserved.
 * right/full are rejected: the replicated dim side would emit its
 * unmatched rows `nSalts` times.
 */
object SkewJoin {

  private val supported =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factIdCol: String, nSalts: Int, joinType: String = "inner",
      seed: String = "salt"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    require(supported(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, " +
        s"not '$joinType' (a replicated dim side would multiply its " +
        "unmatched rows)")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(lit(seed), col(factIdCol)), lit(nSalts.toLong)))
    val replicated = dim
      .withColumn("__salt", explode(
        sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
