package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Banded (bucketed) temporal range join: for each left row, attach
 * every right row sharing its key whose `rightTs` falls in the
 * trailing window `(leftTs − windowUs, leftTs]`. Left rows with no
 * match survive with NULL payload (left-outer semantics); NULL keys
 * and NULL timestamps never match, mirroring SQL comparison.
 *
 * The naive formulation — an inequality theta-join on
 * `key = key AND ts BETWEEN …` — plans as a per-key cartesian: every
 * (left, right) pair under a key is materialized before the range
 * filter runs, O(|L|·|R|) per key, which dies on any hot key at
 * scale. This operator keeps the join an EQUI-join: both sides bucket
 * by `floor(ts / windowUs)`; a trailing window of length `windowUs`
 * spans at most two adjacent buckets, so the right side replicates to
 * `(bin, bin + 1)` and the join runs on `(key, bin)` with the exact
 * range predicate as a residual filter. Each right row matches a left
 * bin through exactly one of its two replicas (the replicas carry
 * distinct bins), so no dedup pass is needed.
 *
 * Scale shape: one shuffle of |L| + 2|R| rows hash-partitioned on
 * (key, bin) — the time dimension spreads a hot key across buckets,
 * AQE's skew-join split handles what remains — versus the naive
 * plan's unbounded per-key pair blowup. Sort-merge or hash join both
 * apply; the residual range filter runs during the probe, not after a
 * materialized cross product.
 */
object RangeJoin {

  /**
   * @param right    must share ONLY `key` with `left`'s column names;
   *                 payload/timestamp columns are expected pre-renamed
   *                 by the caller (same contract as a SQL USING join)
   * @param windowUs trailing-window length in the units of the ts
   *                 columns (micros by convention), > 0
   */
  def joinTrailingWindow(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val overlap = right.columns.toSet.intersect(left.columns.toSet) - key
    require(overlap.isEmpty,
      s"right columns must be pre-renamed; clash with left on: $overlap")

    // `div` floors toward zero — fine for epoch-positive timestamps;
    // a NULL ts yields a NULL bin, which never equi-joins. The right
    // key and bin get UNIQUE names before the join: left and right
    // often share lineage (self-joins like "clicks vs views of one
    // event table"), where dataframe-qualified references (l(key),
    // drop(r(key))) resolve ambiguously and can silently keep the
    // wrong side's column.
    val l = left.withColumn("__bin", expr(s"`$leftTs` div ${windowUs}L"))
    val r = right
      .withColumnRenamed(key, "__rkey")
      .filter(col("__rkey").isNotNull && col(rightTs).isNotNull)
      .withColumn("__rbin", expr(s"`$rightTs` div ${windowUs}L"))
      .withColumn("__jbin", explode(array(col("__rbin"), col("__rbin") + 1)))
      .drop("__rbin")
    l.join(r,
        col(key) === col("__rkey") && col("__bin") === col("__jbin") &&
          col(rightTs) > col(leftTs) - windowUs && col(rightTs) <= col(leftTs),
        "left")
      .drop("__rkey", "__bin", "__jbin")
  }
}
