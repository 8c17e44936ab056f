package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED cluster-assignment table — the at-rest form of the
 * standing (doc_id, cluster) structure that [[Clusters.resolve]]
 * produces and [[Clusters.incrementalResolve]] maintains, with the
 * same write / append / probe / delete lifecycle as
 * [[graft.ann.IvfIndex]]. Separates the two costs a production dedup
 * service must not conflate:
 *
 *   - RESOLVE (rare): the log-round connected-components pass over
 *     the whole corpus — [[write]], run per corpus snapshot;
 *   - FOLD (constant): land one batch's documents and merge the
 *     clusters its edges touch — [[foldBatch]], per ingest batch,
 *     batch-sized work against the resident table;
 *   - OPEN (probe): read the composed table back — [[open]], what
 *     every consumer (diversity sampler, cluster labeling, keeper
 *     filters) joins against, in THIS session or any later one.
 *
 * A session-RAM assignment table (the pre-round-10 shape) re-runs the
 * corpus resolve every session; at 100 TB the resolve is hours of
 * cluster time and the fold is the only recurring cost, so the table
 * must outlive the session that built it.
 *
 * Layout under `path`:
 *   - `assignments/__batch=<b>/` — (doc_id, cluster) parquet;
 *     `__batch = -1` is the base snapshot, each fold appends its own
 *     `__batch = <id>` partition holding ONLY that batch's documents.
 *     Rows are sorted by doc_id within files so point/range probes by
 *     doc_id prune row groups via parquet footer stats (a
 *     multi-executor warehouse would additionally bucket by doc_id
 *     for a shuffle-free probe join).
 *   - `relabel/__batch=<b>/` — (old_cluster, new_cluster) per fold:
 *     the batch-sized record of which standing clusters that batch
 *     MERGED. Appending this map instead of rewriting the corpus
 *     table is what makes a fold O(|batch|): the corpus-sized
 *     `assignments` files are never touched after their own batch.
 *
 * [[open]] composes: read every relabel map (each ≤ |batch| rows of
 * touched clusters — KB-scale; driver-side by construction), chase
 * the chains into one final map (labels are component-min doc ids,
 * so chains strictly decrease — no cycles), and apply it to the
 * assignment union with ONE broadcast join. The composed chain grows
 * with merge count, not corpus size; [[compact]] rewrites the base
 * and resets it (run on the retention cadence, like
 * `CdcOps.compactSnapshotRetained`).
 *
 * Replay-idempotence: [[foldBatch]] writes are DYNAMIC partition
 * overwrites keyed by `batchId`, so an at-least-once redelivery
 * (Structured Streaming foreachBatch) replaces exactly its own
 * partitions instead of duplicating rows — and the quotient-edge
 * mapping excludes the batch's own ids from the standing-table
 * lookup, so a replayed batch whose docs already landed re-derives
 * the same labels instead of resurrecting them as singletons.
 * Distinct batches MUST use distinct ids ≥ 0 and fold SEQUENTIALLY
 * (each fold resolves against the table as of the previous fold);
 * for a stream that means running WITH a checkpointLocation so batch
 * ids stay monotone across restarts.
 *
 * Equivalence contract: open-after-fold ≡ [[Clusters.resolve]] on
 * corpus ∪ batches from scratch (the [[Clusters.incrementalResolve]]
 * theorem, now across the session boundary) — pinned by
 * ClusterIndexSpec and the q_dedup_clusters_atrest oracle.
 */
object ClusterIndex {

  /** Base-snapshot marker in the `__batch` partition column. */
  val BaseBatch: Long = graft.sources.StandingStore.BaseBatch

  // Shared lifecycle mechanics (sorted batch-partition writes, staged
  // swaps, listing-only counters) come from the store; the CUSTOM
  // parts — quotient folds and settled-chain baking — stay here.
  private def store(path: String) = new graft.sources.StandingStore(path,
    Seq(
      graft.sources.TableSpec("assignments",
        "doc_id LONG, cluster LONG, __batch LONG", Seq("doc_id"),
        retractCol = Some("doc_id")),
      graft.sources.TableSpec("relabel",
        "old_cluster LONG, new_cluster LONG, __batch LONG", Nil)))

  /** Swap order for [[compact]]'s staged dirs — ASSIGNMENTS strictly
    * before RELABEL, per [[graft.sources.DirSwap]]'s prefix rule: a
    * crash between the two swaps leaves compacted assignments
    * (terminal labels, never relabel keys) beside the stale chain,
    * which [[open]] chases to a no-op. The REVERSE prefix — empty
    * relabel live beside old NON-terminal assignments — would make
    * [[open]] silently return pre-merge labels, and recovery could
    * not tell it apart from a healthy table. Do not reorder. */
  private val SwapTables = Seq("assignments", "relabel")

  /** Collision-free scratch location for the harness (see
    * [[graft.Scratch]]); production keys by corpus-snapshot id. */
  def scratchPath(sourceDir: String): String =
    graft.Scratch.path("graft_clusters", sourceDir)

  /** Resolve-side write: the base corpus snapshot's (doc_id, cluster)
    * labels, plus an EMPTY relabel table (schema materialized so
    * [[open]] never special-cases a fresh index). */
  def write(assignments: DataFrame, path: String): Unit = {
    // the build verb rewrites the whole table — same per-root lease
    // as every maintenance entry point (re-entrant under a composed
    // caller), so a resolve racing a fold loop fails fast. The
    // store's clear-for-rewrite drops stale compaction staging FIRST
    // (a crashed pre-swap compact left .compact + _SWAP behind, and
    // the next fold's recover would otherwise roll the pre-crash
    // tables forward OVER the fresh resolve) and then every live dir,
    // so a crash between the two rewrites below leaves [[open]]
    // failing fast on the missing dir — never silently composing a
    // stale chain over fresh labels.
    val s = store(path)
    s.withLease(assignments.sparkSession) {
      s.clearForRewrite(assignments.sparkSession)
      s.landBase(assignments.select(col("doc_id"), col("cluster")),
        "assignments")
      s.landBase(emptyRelabel(assignments.sparkSession), "relabel")
    }
  }

  private def emptyRelabel(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("old_cluster", "new_cluster")
  }

  /**
   * Incremental FOLD — the per-batch face of the standing table. The
   * batch's near-dup edges (within-batch pairs plus batch↔corpus
   * probe matches — the incremental funnels' outputs) map their
   * endpoints through the resident table onto the QUOTIENT graph
   * (each touched cluster appears as its representative), the
   * batch-sized quotient resolves locally, and two partition-scoped
   * writes land the result: the batch docs' labels into
   * `assignments/__batch=batchId` and the merge map into
   * `relabel/__batch=batchId`. Untouched corpus files are never
   * rewritten — per-fold bytes are O(|batch|), the same
   * append-only discipline as [[graft.ann.IvfIndex.append]].
   *
   * The quotient is `localCheckpoint`ed before the writes because the
   * writes' target partitions live in the directory the quotient's
   * lineage reads — truncation both cuts the self-overwrite cycle and
   * pins one consistent view across the two writes.
   *
   * @param batchDocs new docs (idCol); ids disjoint from the corpus
   * @param newPairs  (aCol, bCol) undirected edges touching the batch
   */
  def foldBatch(path: String, batchDocs: DataFrame, idCol: String,
      newPairs: DataFrame, aCol: String, bCol: String,
      batchId: Long): Unit = {
    require(batchId != BaseBatch && batchId >= 0,
      s"fold batch ids must be ≥ 0 (got $batchId; $BaseBatch is the base)")
    val spark = batchDocs.sparkSession
    val s = store(path)
    // heal a crashed compact swap first: the open() below would only
    // fail fast on a half-swapped table (both dirs are read before
    // any write), but a restarted fold stream should resume, not err.
    // The WRITE form: refuses under a live foreign owner's pending
    // swap (rows landed meanwhile would be discarded by roll-forward)
    s.recoverSwapForWrite(spark)
    val batchIds = batchDocs.select(col(idCol).as("doc_id"))
    // Standing labels WITHOUT the batch's own ids: on first play the
    // anti-join is a no-op (ids are disjoint by contract); on REPLAY
    // it stops a batch doc's prior landing from capturing its own
    // edge endpoints (which would re-resolve it as a singleton).
    val asg = open(spark, path).join(batchIds, Seq("doc_id"), "left_anti")
    val asgA = asg.select(col("doc_id").as("__a"), col("cluster").as("__ca"))
    val asgB = asg.select(col("doc_id").as("__b"), col("cluster").as("__cb"))
    val quotientEdges = newPairs
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
      .join(asgA, Seq("__a"), "left")
      .join(asgB, Seq("__b"), "left")
      .select(coalesce(col("__ca"), col("__a")).as("qa"),
        coalesce(col("__cb"), col("__b")).as("qb"))
    val quotient = Clusters
      .resolve(batchIds, "doc_id", quotientEdges, "qa", "qb")
      .select(col("doc_id"), col("cluster"))
      .localCheckpoint(true)
    try {
      s.landFold(quotient.join(batchIds, Seq("doc_id"), "left_semi"),
        "assignments", batchId)
      // merge map: touched corpus representatives that took a new
      // label (batch docs are assignment rows, not relabel keys — no
      // standing cluster ever carries a batch id, so mapping them
      // would be dead weight in the composed chain)
      s.landFold(quotient.filter(col("doc_id") =!= col("cluster"))
        .join(batchIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id").as("old_cluster"),
          col("cluster").as("new_cluster")),
        "relabel", batchId)
    } finally {
      // drop the checkpoint's blocks deterministically: a long-lived
      // fold loop must not pin one batch-sized RDD per fold until the
      // context cleaner happens to GC it (the stream face's
      // flat-memory pin counts on folds leaving nothing resident)
      quotient.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(false)
      }
      ()
    }
  }

  /** Probe-side read: the composed (doc_id, cluster) table — base +
    * every fold's partition, with the merge chain applied. The chain
    * composition is driver-side over the relabel maps (bounded by
    * total merges since the last [[compact]], each map batch-sized)
    * and MEMOIZED on the relabel dir's listing fingerprint, so a
    * probe-heavy consumer calling open per query pays the collect
    * once per chain change, not per call — re-entry is O(listing)
    * like every other open here. The corpus-scale work is ONE
    * broadcast join. Works from any SparkSession — this is the
    * cross-session face (the cache key is the at-rest listing, not
    * the session). */
  def open(spark: SparkSession, path: String): DataFrame = {
    // explicit schema (the store's): an empty partitioned write
    // (fresh index's relabel dir, or a base snapshot of a zero-row
    // corpus) emits only _SUCCESS, so footer-based inference has
    // nothing to read
    val asg = store(path).open(spark, "assignments")
    val composed = composedChain(spark, path)
    if (composed.isEmpty) asg
    else {
      import spark.implicits._
      val composedDf = composed.toDF("cluster", "__new")
      asg.join(broadcast(composedDf), Seq("cluster"), "left")
        .select(col("doc_id"),
          coalesce(col("__new"), col("cluster")).as("cluster"))
    }
  }

  // chase-count observability hook: how many times the chain was
  // actually collected and composed (vs served from the memo) —
  // pinned by ClusterIndexSpec's memoization case
  private[graft] val chainComposes =
    new java.util.concurrent.atomic.AtomicLong

  // (fingerprint → composed chain), small bounded LRU: chains are
  // KB-scale and live paths are few, but a long-lived driver over
  // many snapshot roots must not grow without bound
  private val chainCache =
    new java.util.LinkedHashMap[String, Seq[(Long, Long)]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[(Long, Long)]]): Boolean =
        size > 32
    }

  /** The relabel dir's identity for memoization: every file's (path,
    * length, mtime), ordered — any fold, compact, or recovery that
    * changes the chain rewrites files and therefore the fingerprint.
    * A directory walk, never a data scan. */
  private def relabelFingerprint(spark: SparkSession,
      path: String): String = {
    val root = new org.apache.hadoop.fs.Path(s"$path/relabel")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).sortBy(_.getPath.getName).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq(s"${s.getPath}:${s.getLen}:${s.getModificationTime}")
      }
    walk(root).mkString(path + "|", ";", "")
  }

  /** Compose raw (old → new) relabel entries into their terminal
    * map — ONE implementation for the probe path and the compaction
    * path. Chains strictly decrease (labels are component-min ids),
    * so chasing terminates; later batches' maps extend earlier ones
    * (old keys are never re-merged — a merged rep stops being a
    * label the moment its map entry lands). */
  private def composeEntries(entries: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val m = entries.toMap
    def chase(x: Long): Long = {
      var c = x
      while (m.contains(c) && m(c) != c) c = m(c)
      c
    }
    m.keysIterator.map(k => (k, chase(k))).toSeq.sortBy(_._1)
  }

  /** The composed (old label → terminal label) chain, memoized (see
    * [[open]]). */
  private[graft] def composedChain(spark: SparkSession,
      path: String): Seq[(Long, Long)] = {
    val fp = relabelFingerprint(spark, path)
    val hit = chainCache.synchronized(Option(chainCache.get(fp)))
    hit.getOrElse {
      chainComposes.incrementAndGet()
      val composed = composeEntries(store(path).open(spark, "relabel")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)))
      chainCache.synchronized { chainCache.put(fp, composed); () }
      composed
    }
  }

  /** [[open]] AS OF fold batch `throughBatch` — the cluster leg of a
    * cross-root consistent read
    * ([[graft.pipeline.IngestStream.lockstepView]]): assignment rows
    * from the base plus folds ≤ `throughBatch`
    * ([[graft.sources.StandingStore.openAt]]'s partition-pruned
    * bound, collapse-floor guard, retractions-in-full), with the
    * relabel chain composed from entries of batch ≤ `throughBatch`
    * ONLY — an unsettled merge recorded by a later batch must not
    * relabel a view that excludes that batch's rows. Sound for the
    * same reason the settled compaction is: a map entry applies only
    * to rows written strictly before it, so the ≤-bound chain reaches
    * every row the view includes and no entry the view's clock has
    * not seen. Not memoized (the full-chain [[open]] memo keys on the
    * relabel listing alone; a bounded chain would need (listing,
    * bound) keys for an occasional read — collect the batch-sized
    * maps instead). */
  def openAt(spark: SparkSession, path: String,
      throughBatch: Long): DataFrame = {
    val asg = store(path).openAt(spark, "assignments", throughBatch)
    val composed = composeEntries(store(path).openRaw(spark, "relabel")
      .where(col("__batch") <= throughBatch)
      .select(col("old_cluster"), col("new_cluster"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)))
    if (composed.isEmpty) asg
    else {
      import spark.implicits._
      val composedDf = composed.toDF("cluster", "__new")
      asg.join(broadcast(composedDf), Seq("cluster"), "left")
        .select(col("doc_id"),
          coalesce(col("__new"), col("cluster")).as("cluster"))
    }
  }

  /** Highest batch id ever folded (the store's shared verb — monotone
    * across compactions via the persisted marker). */
  def batchWatermark(spark: SparkSession, path: String): Long =
    store(path).batchWatermark(spark)

  /** Finish a crashed compaction swap — the reader-first preamble
    * ([[graft.dedup.SignatureIndex.recoverSwap]] rationale). No-op on
    * a healthy table; defers to a LIVE leased maintainer. */
  def recoverSwap(spark: SparkSession, path: String): Unit =
    store(path).recoverSwap(spark)

  /** [[open]] plus the conventional keeper flag (cluster = min id ⇒
    * keeper is the doc that IS its own label). NOTE after a
    * [[retract]]: the keeper doc of a multi-member cluster may itself
    * be retracted, leaving a cluster whose surviving members carry a
    * label no row answers for — labels are opaque ids and outlive
    * their namesake; a keeper-dependent consumer re-elects
    * min(doc_id) per cluster over the surviving rows. */
  def openWithKeeper(spark: SparkSession, path: String): DataFrame =
    open(spark, path)
      .withColumn("keeper", (col("doc_id") === col("cluster")).cast("int"))

  /** Retract documents by id — O(ids) tombstone write; [[open]]
    * filters the assignment rows immediately, the next compaction
    * purges them physically. The relabel chain is untouched: its
    * entries map CLUSTER labels (component-min ids), which remain
    * valid opaque labels even when their namesake doc is retracted
    * (see [[openWithKeeper]]'s note). */
  def retract(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String, batchId: Long): Unit = {
    store(path).retract(ids, idCol, batchId)
  }

  /** Rewrite the composed table as a fresh base snapshot and reset
    * the relabel chain — run on the retention cadence so the chain
    * stays bounded by merges-per-cycle. Uses the
    * [[graft.sources.DirSwap]] staged-swap discipline (stage fully,
    * swap, prune strictly after; a crashed swap is healed by
    * re-running). Even a crash BETWEEN the two dirs' swaps is benign
    * here: compacted assignments carry terminal labels, which are
    * never relabel keys, so a stale relabel chain applied to them
    * chases to a no-op. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Unit =
    compactThrough(spark, path, Long.MaxValue, targetFileBytes)

  /**
   * [[compact]] bounded to SETTLED folds — the
   * [[graft.ann.IvfIndex.compactThrough]] discipline, which is what
   * makes maintenance safe to run from INSIDE the fold stream: fold
   * only batches with id ≤ `throughBatch` into the base, leaving
   * newer folds' assignment partitions AND their relabel maps
   * standing, so a replay of a left-alone batch still overwrites its
   * own partitions with identical content (there is no content probe
   * here to dedup a replayed-after-compaction batch, hence the
   * settled bound). From `foreachBatch(N)`, call with
   * `throughBatch = N - 1`.
   *
   * Why the split is sound: a fold's rows carry labels AS OF its own
   * batch, so a relabel map only ever applies to partitions written
   * BEFORE it — all strictly older batches. Baking the settled chain
   * (entries with batch ≤ `throughBatch`) into the settled rows
   * therefore touches every row those entries can reach, and the
   * kept unsettled maps compose over the new base at [[open]] exactly
   * as they did over the old partitions (their keys are labels that
   * existed when they were written — terminal as of their own fold).
   * Pinned: ClusterIndexSpec's settled-compaction case replays a
   * left-alone batch across the compaction and the composed table is
   * unchanged.
   */
  def compactThrough(spark: SparkSession, path: String,
      throughBatch: Long, targetFileBytes: Long = 128L << 20): Unit = {
    val s = store(path)
    s.withLease(spark) {
      s.recoverSwap(spark)
      // persist the fold clock + openAt floor BEFORE the partitions
      // carrying them collapse (the store's compactThrough discipline;
      // this custom body must keep it itself)
      s.persistFoldWatermark(spark, throughBatch)
      stageCompact(spark, path, throughBatch, targetFileBytes)
      graft.sources.DirSwap.swapStaged(spark, path, SwapTables)
      // retraction epilogue: the staging purged tombstoned rows, so
      // settled tombstones clear strictly after the swap commits (the
      // store's .old-prune discipline)
      s.clearRetractionsThrough(spark, throughBatch)
    }
  }

  /** [[compactThrough]]'s staged rewrites, up to (not including) the
    * swap — split out so the crash-matrix spec can stop between the
    * two table swaps. Lease-guarded like every staging seam
    * ([[graft.sources.StandingStore.stageCompactThrough]]'s
    * rationale): a lease-less caller under a live foreign compactor
    * would stage a mid-swap root. */
  private[graft] def stageCompact(spark: SparkSession, path: String,
      throughBatch: Long = Long.MaxValue,
      targetFileBytes: Long = 128L << 20): Unit = {
    require(graft.sources.Lease.heldByThisThread(path),
      s"stageCompact requires the $path lease (call under withLease)")
    val s = store(path)
    val settled = col("__batch") <= throughBatch // BaseBatch ≤ any
    // byte-targeted file count (FS summary, not a scan) with a range
    // partition on doc_id — compaction restores the file count and
    // globalizes the probe join's doc_id clustering
    val files = s.fileCount(spark, "assignments",
      Some(targetFileBytes))
    // the SETTLED chain only — unsettled maps stay standing and keep
    // composing over the new base at open (see scaladoc)
    val relabel = s.openRaw(spark, "relabel")
    import spark.implicits._
    val composed = composeEntries(relabel.where(settled)
      .select(col("old_cluster"), col("new_cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)))
      .toDF("cluster", "__new")
    s.landStaging(
      s.applyRetractions(spark, s.openRaw(spark, "assignments"), "doc_id")
        .join(broadcast(composed), Seq("cluster"), "left")
        .select(col("doc_id"),
          // the settled chain applies to settled rows only; unsettled
          // rows were written after every settled merge and already
          // carry its labels
          when(settled, coalesce(col("__new"), col("cluster")))
            .otherwise(col("cluster")).as("cluster"),
          when(settled, lit(BaseBatch)).otherwise(col("__batch"))
            .as("__batch")),
      "assignments", files)
    // unsettled maps kept verbatim; a fully-settled compact stages an
    // empty partitioned dir, which open() reads via explicit schema
    s.landStaging(relabel.where(!settled), "relabel", 1)
  }

  /** Number of FOLD partitions the table currently holds (listing
    * only) — the quantity [[maintain]] bounds. */
  def foldCount(spark: SparkSession, path: String): Int =
    store(path).foldCount(spark)

  /** The maintenance cadence ([[graft.pipeline.CuratedCorpus.maintain]]
    * discipline): [[compact]] once `maxFolds` fold partitions have
    * accumulated, else no-op — bounds both the partition count and
    * the driver-side relabel chain the composed [[open]] walks.
    * Same settle-before-compact contract as
    * [[graft.ann.IvfIndex.compact]]: run it only once the fold
    * stream's checkpoint has passed the standing batches — a batch
    * REPLAYED after compaction folded it away would re-land its rows
    * as a fresh partition beside their base copies (there is no
    * content probe here to dedup them). From INSIDE the fold loop,
    * use [[maintainThrough]] with the previous batch id instead.
    * Returns true iff it compacted. */
  def maintain(spark: SparkSession, path: String, maxFolds: Int): Boolean = {
    require(maxFolds >= 1, s"maxFolds must be >= 1, got $maxFolds")
    val due = foldCount(spark, path) >= maxFolds
    if (due) compact(spark, path)
    due
  }

  /** [[maintain]] bounded to SETTLED folds — the in-loop cadence:
    * from `foreachBatch(N)` call with `throughBatch = N - 1`, so
    * only checkpoint-committed batches fold into the base and a
    * replay of the current batch still overwrites its own standing
    * partitions. Counts ONLY settled fold partitions against the
    * dial (unsettled ones cannot be folded yet, so they must not
    * trigger a compaction that cannot shrink them). Returns true iff
    * it compacted. */
  def maintainThrough(spark: SparkSession, path: String, maxFolds: Int,
      throughBatch: Long): Boolean =
    store(path).maintainThrough(spark, maxFolds, throughBatch)(
      compactThrough(spark, path, _))

  /** Retire the table — the lifecycle's last verb, Hadoop FS so the
    * path may be any Spark-reachable filesystem. */
  def delete(spark: SparkSession, path: String): Unit =
    store(path).delete(spark)
}
