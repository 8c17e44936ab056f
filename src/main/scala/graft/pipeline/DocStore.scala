package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{StandingStore, TableSpec}

/**
 * PLAIN standing document store — (doc_id, text), doc_id-sorted, a
 * THIN wrapper over the shared [[graft.sources.StandingStore]]
 * lifecycle with none of [[CuratedCorpus]]'s curation: every folded
 * document lands. What it is for: a consumer that must POINT-READ
 * text for ids an index surfaced — the verify leg of
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
 * overwrite). Compaction folds SETTLED batches only
 * ([[compactThrough]]); all write/fold/swap/maintain mechanics are
 * the store's.
 */
object DocStore {

  /** Base-snapshot marker in the `__batch` partition column. */
  val BaseBatch: Long = StandingStore.BaseBatch

  private def store(path: String) = new StandingStore(path, Seq(
    TableSpec("docs", "doc_id LONG, text STRING, __batch LONG",
      Seq("doc_id"), retractCol = Some("doc_id"))))

  /** Collision-free scratch location for the harness. */
  def scratchPath(sourceDir: String): String =
    graft.Scratch.path("graft_docstore", sourceDir)

  /** Base-snapshot write (the build verb — leased). */
  def write(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val s = store(path)
    s.withLease(docs.sparkSession) {
      s.clearForRewrite(docs.sparkSession)
      s.landBase(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("text")), "docs")
    }
  }

  /** Fold one batch as its own partition — batch-sized bytes,
    * replay-idempotent. */
  def foldBatch(path: String, batchDocs: DataFrame, idCol: String,
      textCol: String, batchId: Long): Unit = {
    val s = store(path)
    s.recoverSwapForWrite(batchDocs.sparkSession)
    s.landFold(batchDocs.select(col(idCol).as("doc_id"),
      col(textCol).as("text")), "docs", batchId)
  }

  /** Finish a crashed [[compactThrough]] swap — the reader-first
    * preamble ([[graft.dedup.SignatureIndex.recoverSwap]] rationale).
    * No-op on a healthy table. */
  def recoverSwap(spark: SparkSession, path: String): Unit =
    store(path).recoverSwap(spark)

  /** Retract documents by id — O(ids) tombstone write; [[open]]
    * filters immediately, [[compactThrough]] purges physically
    * ([[graft.sources.StandingStore.retract]]'s contract). */
  def retract(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String, batchId: Long): Unit = {
    store(path).retract(ids, idCol, batchId)
  }

  /** The composed (doc_id, text) table across the base and every
    * fold, from any session. */
  def open(spark: SparkSession, path: String): DataFrame =
    store(path).open(spark, "docs")

  /** [[open]] AS OF fold batch `throughBatch`
    * ([[graft.sources.StandingStore.openAt]]'s contract). */
  def openAt(spark: SparkSession, path: String,
      throughBatch: Long): DataFrame =
    store(path).openAt(spark, "docs", throughBatch)

  /** Highest batch id ever folded (the store's shared verb — monotone
    * across compactions via the persisted marker). */
  def batchWatermark(spark: SparkSession, path: String): Long =
    store(path).batchWatermark(spark)

  /** Fold every SETTLED batch (id ≤ `throughBatch`) into the base,
    * restoring file count and the global doc_id sort the point-read
    * contract wants. */
  def compactThrough(spark: SparkSession, path: String,
      throughBatch: Long, targetFileBytes: Long = 128L << 20): Unit =
    store(path).compactThrough(spark, throughBatch,
      Map("docs" -> targetFileBytes))

  /** Compact everything — run only once the fold stream settled. */
  def compact(spark: SparkSession, path: String): Unit =
    compactThrough(spark, path, Long.MaxValue)

  /** Fold partitions currently standing (listing only). */
  def foldCount(spark: SparkSession, path: String): Int =
    store(path).foldCount(spark)

  /** In-loop cadence: compact once `maxFolds` SETTLED folds stand.
    * Returns true iff it compacted. */
  def maintainThrough(spark: SparkSession, path: String, maxFolds: Int,
      throughBatch: Long): Boolean =
    store(path).maintainThrough(spark, maxFolds, throughBatch)()

  /** Retire the table. */
  def delete(spark: SparkSession, path: String): Unit =
    store(path).delete(spark)
}
