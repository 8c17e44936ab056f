package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED minhash-signature table — the durable twin of the
 * session-RAM band index ([[Dedup.corpusNearDupIndex]]) every
 * incremental near-dup consumer probes, with the same standing
 * lifecycle as [[ClusterIndex]] / [[graft.ann.IvfIndex]]. What it
 * buys at 100 TB: a RESTARTED fold/ingest loop loads fixed-width
 * signature rows (NumHashes strings per doc) instead of re-signing
 * the corpus — tokenize + shingle + minhash over every document is
 * the dominant restart cost, and it is exactly the work this table
 * makes once-per-document instead of once-per-session. The
 * exact-Jaccard verify then joins ONLY candidate ids back onto the
 * corpus text ([[Dedup.probeAtRestSignatures]] — candidates are
 * batch-bounded, and a doc_id-sorted corpus layout or a runtime
 * bloom filter bounds the text read at cluster scale).
 *
 * Layout under `path`: `sigs/__batch=<b>/` with (doc_id, sig),
 * doc_id-sorted inside files; `__batch = -1` is the corpus snapshot,
 * each fold appends its own partition. Folds are REPLAY-IDEMPOTENT
 * (batch-keyed dynamic partition overwrite). Signatures are
 * per-document facts — duplicate rows would only waste candidate
 * work, never change a verdict (banding dedups candidates) — but
 * compaction still folds SETTLED batches only
 * ([[compactThrough]], the [[graft.ann.IvfIndex.compactThrough]]
 * discipline), so a replay after compaction overwrites its own
 * standing partition instead of re-landing beside base copies.
 *
 * Probe equality with the in-RAM index and the composed
 * cross-session loop (probe → fold edges → fold signatures → a LATER
 * SESSION probes the folded content without re-signing anything) are
 * pinned in SignatureIndexSpec.
 */
object SignatureIndex {

  /** Base-snapshot marker in the `__batch` partition column. */
  val BaseBatch = -1L

  private val Schema = "doc_id LONG, sig ARRAY<STRING>, __batch LONG"
  private val SwapTables = Seq("sigs")

  /** Collision-free scratch location for the harness (see
    * [[graft.Scratch]]); production keys by corpus-snapshot id. */
  def scratchPath(sourceDir: String): String =
    graft.Scratch.path("graft_sigs", sourceDir)

  /** Corpus-snapshot write: sign every document once and land the
    * base partition. Runs under the root's lease (the build verb,
    * like every standing structure here). */
  def write(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    graft.sources.Lease.withLease(docs.sparkSession, path) {
      // clean slate without dropping the root (the held lease lives
      // there)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
      Seq("sigs", ".compact", ".old_sigs").foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
      signed(docs, idCol, textCol)
        .withColumn("__batch", lit(BaseBatch))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(s"$path/sigs")
    }

  /** Fold one batch's signatures as its own partition — batch-sized
    * bytes, replay-idempotent (dynamic overwrite keyed by the
    * stream's batch id; ids ≥ 0, distinct per batch). */
  def foldBatch(path: String, batchDocs: DataFrame, idCol: String,
      textCol: String, batchId: Long): Unit =
    foldBatchSigned(path, signed(batchDocs, idCol, textCol), batchId)

  /** [[foldBatch]] over ALREADY-COMPUTED signatures (doc_id, sig) —
    * the face a router that signed the batch for its own probe uses,
    * so the tokenize+shingle+digest work is paid once per batch, not
    * once per consumer. */
  def foldBatchSigned(path: String, batchSigs: DataFrame,
      batchId: Long): Unit = {
    require(batchId != BaseBatch && batchId >= 0,
      s"fold batch ids must be ≥ 0 (got $batchId; $BaseBatch is the base)")
    // heal a crashed compact swap before writing (the shared
    // write-path preamble — see CuratedCorpus.foldBatch)
    recoverSwap(batchSigs.sparkSession, path)
    batchSigs.select(col("doc_id"), col("sig"))
      .withColumn("__batch", lit(batchId))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch")
      .parquet(s"$path/sigs")
  }

  /** Finish a crashed [[compactThrough]] swap — what a READER-FIRST
    * consumer (a router that probes before it folds) must run before
    * [[open]], or a crash inside the swap window leaves the live dir
    * missing and every retry fails before the fold's own recovery
    * can run. Safe on a healthy table (no-op). */
  def recoverSwap(spark: SparkSession, path: String): Unit =
    graft.sources.DirSwap.recover(spark, path, SwapTables)

  private def signed(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      Dedup.minhashSignature(col(textCol)).as("sig"))

  /** The composed signature table — (doc_id, sig) across the base
    * and every fold, from any session. Feed to
    * [[Dedup.probeAtRestSignatures]]. */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schema).parquet(s"$path/sigs")
      .select("doc_id", "sig")

  /** Fold every SETTLED batch (id ≤ `throughBatch`) into the base —
    * restores the probe-side file count; from `foreachBatch(N)` call
    * with `throughBatch = N - 1` so a replay of the current batch
    * still overwrites its own standing partition. */
  def compactThrough(spark: SparkSession, path: String,
      throughBatch: Long, targetFileBytes: Long = 128L << 20): Unit =
    graft.sources.Lease.withLease(spark, path) {
      graft.sources.DirSwap.recover(spark, path, SwapTables)
      val dir = new org.apache.hadoop.fs.Path(s"$path/sigs")
      val bytes = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(dir).getLength
      val files = math.max(1L,
        (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      val settled = col("__batch") <= throughBatch
      spark.read.schema(Schema).parquet(s"$path/sigs")
        .withColumn("__batch",
          when(settled, lit(BaseBatch)).otherwise(col("__batch")))
        .repartitionByRange(files, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(graft.sources.DirSwap.stagingDir(path, "sigs"))
      graft.sources.DirSwap.swapStaged(spark, path, SwapTables)
    }

  /** Compact everything — run only once the fold stream settled. */
  def compact(spark: SparkSession, path: String): Unit =
    compactThrough(spark, path, Long.MaxValue)

  /** Fold partitions currently standing (listing only). */
  def foldCount(spark: SparkSession, path: String): Int =
    graft.sources.BatchPartitions.ids(spark, s"$path/sigs")
      .count(_ != BaseBatch)

  /** The in-loop cadence: compact settled folds once `maxFolds` of
    * them have accumulated ([[ClusterIndex.maintainThrough]]
    * discipline). Returns true iff it compacted. */
  def maintainThrough(spark: SparkSession, path: String, maxFolds: Int,
      throughBatch: Long): Boolean = {
    require(maxFolds >= 1, s"maxFolds must be >= 1, got $maxFolds")
    val due = graft.sources.BatchPartitions.ids(spark, s"$path/sigs")
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
