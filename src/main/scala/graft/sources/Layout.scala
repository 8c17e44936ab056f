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

  /**
   * Materialize a seeded shuffle deal ([[graft.dedup.Dedup.shuffleDeal]]
   * output: id, shard, pos) as the ON-DISK layout a training reader
   * consumes: one directory per shard (`shard=<i>/`), rows inside each
   * shard's files sorted by `pos` — so epoch 0 IS "read shard dirs in
   * order, stream each file" with zero runtime sorting, and a
   * 1000-reader job maps one shard (or a contiguous file range) per
   * reader with no coordination beyond the directory listing.
   *
   * Shape: ONE hash exchange on shard (each task holds whole shards),
   * then shard-local sorts — the same no-total-order discipline as
   * the deal itself; the sort prefix includes the shard column so
   * rows belonging to different shards in one task stay grouped for
   * the partitioned write. Per-file `pos` ordering is pinned in
   * LayoutSpec; write cost at 10× in the scale smoke.
   */
  def writeSharded(deal: DataFrame, shardCol: String, posCol: String,
      path: String): Unit =
    deal.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)

  /** N-dimensional Morton key: each column quantile-bucketed into
    * 2^`bitsPerDim` bins so skew in any domain can't collapse the
    * grid, then the bin bits round-robin interleaved (bit i of dim k
    * at position i·D + (D−1−k) — the 2-dim case reproduces the classic
    * a-odd/b-even layout). Boundaries come from ONE approx-quantile
    * pass over all columns (driver gets D·2^bits doubles — constant,
    * never the data). */
  private def mortonKey(df: DataFrame, cols: Seq[String],
      bitsPerDim: Int): Column = {
    val d = cols.length
    val bins = 1 << bitsPerDim
    val qs = (1 until bins).map(_.toDouble / bins).toArray
    // relativeError 1/(4·bins): bin edges land within a quarter-bin
    // of the true quantiles — plenty for a layout decision. ONE
    // aggregation pass for every column (the per-column overload
    // would scan df once per dimension).
    val edges = df.stat.approxQuantile(cols.toArray, qs, 1.0 / (4 * bins))
    def bin(c: String, es: Array[Double]): Column =
      es.foldLeft(lit(0)) { (acc, e) =>
        acc + when(col(c).cast("double") >= e, 1).otherwise(0)
      }
    val binCols = cols.zip(edges.toSeq).map { case (c, es) => bin(c, es) }
    (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, i) =>
      binCols.zipWithIndex.foldLeft(acc) { case (a, (bc, k)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bc, i).bitwiseAND(lit(1)).cast("long"),
          i * d + (d - 1 - k)))
      }
    }
  }

  /** Z-order `df` by `cols` into `numFiles` files: range-partition +
    * sort on the N-dim Morton key, so each file's footer carries a
    * tight [min,max] on EVERY listed column. Skipping per column
    * weakens as D grows (each file owns a D-cube; a point filter on
    * one column touches bins^(D−1) cells) — 2-4 dims is the useful
    * range, which the bit-budget guard enforces loosely. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bitsPerDim: Int,
      numFiles: Int, path: String): Unit = {
    require(cols.size >= 2, s"z-order needs >= 2 columns, got ${cols.size}")
    require(numFiles > 0 && bitsPerDim > 0 && bitsPerDim * cols.size <= 62,
      s"bad layout params: files=$numFiles bits=$bitsPerDim dims=${cols.size}")
    val z = "__z_" + cols.mkString("_")
    df.withColumn(z, mortonKey(df, cols, bitsPerDim))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Two-column convenience overload. */
  def writeZOrdered(df: DataFrame, a: String, b: String, bitsPerDim: Int,
      numFiles: Int, path: String): Unit =
    writeZOrdered(df, Seq(a, b), bitsPerDim, numFiles, path)
}
