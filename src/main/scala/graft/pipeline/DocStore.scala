package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PLAIN standing document store — (doc_id, text), doc_id-sorted, with
 * the shared standing-structure lifecycle
 * (write/foldBatch/open/compactThrough/maintainThrough, lease,
 * [[graft.sources.DirSwap]]) and none of [[CuratedCorpus]]'s curation:
 * every folded document lands. What it is for: a consumer that must
 * POINT-READ text for ids an index surfaced — the verify leg of
 * [[graft.dedup.SignatureIndex.probe]] — when the pipeline keeps ALL
 * documents (cluster labeling assigns labels to duplicates too, so a
 * curating store would drop exactly the rows the labels describe).
 * The doc_id sort inside files is the layout half of the probe-read
 * contract ([[graft.sources.PointReads]]): footer stats prune the
 * text scan to the candidate ids' files.
 *
 * Layout under `path`: `docs/__batch=<b>/` with (doc_id, text);
 * `__batch = -1` is the base snapshot, each fold appends its own
 * partition (replay-idempotent — batch-keyed dynamic partition
 * overwrite; re-landing a batch overwrites its own rows). Compaction
 * folds SETTLED batches only ([[compactThrough]], the
 * [[graft.dedup.SignatureIndex.compactThrough]] discipline).
 */
object DocStore {

  /** Base-snapshot marker in the `__batch` partition column. */
  val BaseBatch = -1L

  private val Schema = "doc_id LONG, text STRING, __batch LONG"
  private val SwapTables = Seq("docs")

  /** Collision-free scratch location for the harness. */
  def scratchPath(sourceDir: String): String =
    graft.Scratch.path("graft_docstore", sourceDir)

  /** Base-snapshot write (the build verb — leased). */
  def write(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    graft.sources.Lease.withLease(docs.sparkSession, path) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
      Seq("docs", ".compact", ".old_docs").foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .withColumn("__batch", lit(BaseBatch))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(s"$path/docs")
    }

  /** Fold one batch as its own partition — batch-sized bytes,
    * replay-idempotent. */
  def foldBatch(path: String, batchDocs: DataFrame, idCol: String,
      textCol: String, batchId: Long): Unit = {
    require(batchId != BaseBatch && batchId >= 0,
      s"fold batch ids must be ≥ 0 (got $batchId; $BaseBatch is the base)")
    recoverSwap(batchDocs.sparkSession, path)
    batchDocs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("__batch", lit(batchId))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch")
      .parquet(s"$path/docs")
  }

  /** Finish a crashed [[compactThrough]] swap — the reader-first
    * preamble ([[graft.dedup.SignatureIndex.recoverSwap]] rationale).
    * No-op on a healthy table. */
  def recoverSwap(spark: SparkSession, path: String): Unit =
    graft.sources.DirSwap.recover(spark, path, SwapTables)

  /** The composed (doc_id, text) table across the base and every
    * fold, from any session. */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schema).parquet(s"$path/docs")
      .select("doc_id", "text")

  /** Fold every SETTLED batch (id ≤ `throughBatch`) into the base,
    * restoring file count and the global doc_id sort the point-read
    * contract wants. */
  def compactThrough(spark: SparkSession, path: String,
      throughBatch: Long, targetFileBytes: Long = 128L << 20): Unit =
    graft.sources.Lease.withLease(spark, path) {
      graft.sources.DirSwap.recover(spark, path, SwapTables)
      val dir = new org.apache.hadoop.fs.Path(s"$path/docs")
      val bytes = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(dir).getLength
      val files = math.max(1L,
        (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      val settled = col("__batch") <= throughBatch
      spark.read.schema(Schema).parquet(s"$path/docs")
        .withColumn("__batch",
          when(settled, lit(BaseBatch)).otherwise(col("__batch")))
        .repartitionByRange(files, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(graft.sources.DirSwap.stagingDir(path, "docs"))
      graft.sources.DirSwap.swapStaged(spark, path, SwapTables)
    }

  /** Compact everything — run only once the fold stream settled. */
  def compact(spark: SparkSession, path: String): Unit =
    compactThrough(spark, path, Long.MaxValue)

  /** Fold partitions currently standing (listing only). */
  def foldCount(spark: SparkSession, path: String): Int =
    graft.sources.BatchPartitions.ids(spark, s"$path/docs")
      .count(_ != BaseBatch)

  /** In-loop cadence: compact once `maxFolds` SETTLED folds stand.
    * Returns true iff it compacted. */
  def maintainThrough(spark: SparkSession, path: String, maxFolds: Int,
      throughBatch: Long): Boolean = {
    require(maxFolds >= 1, s"maxFolds must be >= 1, got $maxFolds")
    val due = graft.sources.BatchPartitions.ids(spark, s"$path/docs")
      .count(b => b != BaseBatch && b <= throughBatch) >= maxFolds
    if (due) compactThrough(spark, path, throughBatch)
    due
  }

  /** Retire the table. */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }
}
