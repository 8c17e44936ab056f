package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-SKIPPING output layout — the scan-pruning half of the storage
 * design ([[Bucketed]] is the join half). Parquet footers carry
 * min/max statistics per row group; Spark's pushed filters skip any
 * row group whose range can't match. That statistic is worthless on a
 * randomly-ordered table (every row group spans the whole domain) and
 * decisive on a clustered one: lay the table out so each row group
 * owns a narrow slice of the filter column and a selective scan reads
 * 1/files of the data. At 100 TB this is the difference between a
 * point query touching ~128 MB and touching the whole table — no
 * index structure, no extra storage, just write order.
 *
 *  - [[writeRangeSorted]]: global range partition + in-file sort on
 *    ONE column — optimal skipping for that column, none for others.
 *  - [[writeZOrdered]]: interleave quantile-bucketed bits of TWO
 *    columns into a Morton (Z-curve) key and range-sort by it — each
 *    file owns a rectangle of the 2-D grid, so filters on EITHER
 *    column skip most files (the classic lakehouse multi-dimensional
 *    clustering trade: neither column skips as well as its dedicated
 *    sort, both skip far better than the other's).
 *
 * Both shapes are one range exchange at write time (sampled range
 * boundaries, so the write parallelizes evenly even on skewed
 * domains). LayoutSpec proves the effect by measuring the scan
 * operator's actual output rows under a pushed point filter.
 */
object Layout {

  /**
   * Diagnostic: execute `df` and return the number of rows its
   * parquet scan operators actually emitted — the direct measure of
   * row-group skipping (total rows minus whatever the footer stats
   * pruned). Materializes the frame via collect, so call it on
   * SELECTIVE probes only (that is what it measures anyway). Used by
   * LayoutSpec and the 10× smoke so both assert the same metric.
   */
  def scanOutputRows(df: DataFrame): Long = {
    // collect() executes df's own QueryExecution — count() would plan
    // a separate one whose scan metrics we couldn't read
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(s.metrics("numOutputRows").value)
      case o => o.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).sum
  }

  /** Range-partition into `numFiles` files sorted by `key`:
    * non-overlapping per-file [min,max] ranges on `key`. */
  def writeRangeSorted(df: DataFrame, key: String, numFiles: Int,
      path: String): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)
  }

  /** Morton key of `a` and `b`, each quantile-bucketed into
    * 2^`bitsPerDim` bins so skew in either domain can't collapse the
    * grid. Boundaries come from one approx-quantile pass (driver gets
    * 2·2^bits doubles — constant, never the data). */
  private def mortonKey(df: DataFrame, a: String, b: String,
      bitsPerDim: Int): Column = {
    val bins = 1 << bitsPerDim
    val qs = (1 until bins).map(_.toDouble / bins).toArray
    // relativeError 1/(4·bins): bin edges land within a quarter-bin
    // of the true quantiles — plenty for a layout decision. ONE
    // aggregation pass for both columns (the per-column overload
    // would scan df once per dimension).
    val Array(aEdges, bEdges) =
      df.stat.approxQuantile(Array(a, b), qs, 1.0 / (4 * bins))
    def bin(c: String, edges: Array[Double]): Column =
      edges.foldLeft(lit(0)) { (acc, e) =>
        acc + when(col(c).cast("double") >= e, 1).otherwise(0)
      }
    val (aBin, bBin) = (bin(a, aEdges), bin(b, bEdges))
    (0 until bitsPerDim).foldLeft(lit(0)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(aBin, i).bitwiseAND(lit(1)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bBin, i).bitwiseAND(lit(1)), 2 * i))
    }
  }

  /** Z-order `df` by (`a`, `b`) into `numFiles` files: range-partition
    * + sort on the Morton key, so each file's footer carries a tight
    * [min,max] on BOTH columns. */
  def writeZOrdered(df: DataFrame, a: String, b: String, bitsPerDim: Int,
      numFiles: Int, path: String): Unit = {
    require(numFiles > 0 && bitsPerDim > 0 && bitsPerDim <= 15,
      s"bad layout params: files=$numFiles bits=$bitsPerDim")
    val z = "__z_" + a + "_" + b
    df.withColumn(z, mortonKey(df, a, b, bitsPerDim))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }
}
