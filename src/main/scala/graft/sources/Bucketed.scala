package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed-table plumbing for SHUFFLE-FREE repeated joins — the
 * storage-layout half of the scale design. A join between two tables
 * bucketed (and sorted) by the join key with the same bucket count
 * needs NO exchange on either side: each task sort-merges bucket i of
 * the left with bucket i of the right straight off the parquet files.
 * At 100 TB this converts the dominant recurring cost of a star-schema
 * or CDC-apply pipeline (re-shuffling the fact table for every join)
 * into a one-time write-side layout decision.
 *
 * Bucket count is the parallelism floor for downstream joins — pick
 * ~(table size / 128 MB) at write time; both sides of a co-located
 * join must agree on it (Spark can coalesce a multiple into the
 * smaller count, but identical counts keep the plan trivially
 * shuffle-free).
 *
 * Bucketing metadata lives in the session catalog (saveAsTable), which
 * is the supported Spark surface for bucketed reads — a bare
 * `.parquet(path)` read cannot recover bucket spec. The explicit
 * `path` option keeps the data external to the warehouse so dropping
 * the catalog entry never deletes data.
 */
object Bucketed {

  /** Write `df` as a bucketed+sorted external parquet table. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      key: String, numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.write
      .mode(mode)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
  }

  /**
   * Equi-join two same-bucket-count tables on their bucket key. The
   * plan this produces is the point: sort-merge join with ZERO
   * exchanges (asserted in BucketedJoinSpec) — bucket pruning and the
   * sorted layout make the merge a streaming pass per bucket pair.
   */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
