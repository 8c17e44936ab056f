package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-time streaming operators for the analytics side of the engine:
 * watermarked tumbling/sliding window aggregation and stateful
 * sessionization via `flatMapGroupsWithState`.
 *
 * Scale notes: the windowed aggregate is a streaming hash aggregation
 * whose state is bounded by (watermark horizon × key cardinality);
 * late events beyond the watermark are dropped, matching the engine's
 * CDC story where late data is irrelevant because UPSERT replay is
 * idempotent (SURVEY.md §2.9). Sessionization keeps one state entry
 * per open (user) session and emits on gap timeout — the
 * `KeyValueGroupedDataset` path the reference has no analogue for.
 */
object EventTimeOps {

  /**
   * Watermarked tumbling-window counts/sums per event type.
   * Input needs (ts: timestamp, event_type: string, value: double).
   */
  def windowedAgg(events: DataFrame, watermarkDelay: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    slidingAgg(events, watermarkDelay, windowLen, windowLen)

  /**
   * Sliding-window variant: windows of `windowLen` starting every
   * `slide` (tumbling when equal — [[windowedAgg]] delegates here).
   * Each event lands in windowLen/slide windows; Spark's generator
   * expands them BEFORE the partial aggregation, so the shuffle
   * carries per-(window, type) partials, amplified only by the
   * overlap factor — the dial between report granularity and cost.
   */
  def slidingAgg(events: DataFrame, watermarkDelay: String,
      windowLen: String, slide: String): DataFrame = {
    // Batch-polymorphic: the same operator runs over a bounded table
    // (no watermark — the concept doesn't exist in batch; sums go
    // through DECIMAL so emission is order-independent) or a stream.
    val base =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    base
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /**
   * Watermarked windowed DISTINCT-user estimate per event type.
   * Streaming aggregation forbids exact COUNT(DISTINCT) outright (its
   * state is the distinct set itself — unbounded and not mergeable
   * incrementally); the HLL++ sketch is the streaming cardinality
   * path: constant-size per-(window, type) state, partial-merged
   * map-side like any other aggregate. Batch-polymorphic, and the
   * sketch's register-max merge is order-independent, so the
   * streaming terminal state equals the batch run bit-for-bit
   * (pinned in EventTimeSpec).
   */
  def windowedDistinct(events: DataFrame,
      watermarkDelay: String = "10 minutes", windowLen: String = "5 minutes",
      rsd: Double = 0.02): DataFrame = {
    val base =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    base
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("window.start").as("win_start"),
        col("event_type"), col("approx_users"))
  }

  /**
   * Watermarked windowed value QUANTILES per event type — the
   * latency-percentile panel. Exact percentiles would buffer every
   * window's values; the Greenwald–Khanna summary keeps ε-bounded
   * per-(window, type) state and merges across micro-batches. Unlike
   * the HLL register-max, GK compaction depends on merge ORDER, so
   * streaming and batch runs agree only to the rank-error bound —
   * the spec asserts the bound, not bit-equality.
   */
  def windowedQuantiles(events: DataFrame, quantiles: Seq[Double],
      watermarkDelay: String = "10 minutes", windowLen: String = "5 minutes",
      accuracy: Int = graft.analytics.SketchQueries.PercentileAccuracy)
      : DataFrame = {
    val base =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    base
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(approx_percentile(col("value"),
        array(quantiles.map(lit): _*), lit(accuracy)).as("qs"))
      .select(col("window.start").as("win_start"),
        col("event_type"), col("qs"))
  }

  /**
   * Streaming exact dedup for a document/event feed: keep the FIRST
   * record per content key inside the watermark horizon, drop
   * replays/duplicates after it. `dropDuplicatesWithinWatermark`
   * bounds the dedup state by the horizon (plain dropDuplicates would
   * grow state forever on an unbounded corpus) — the streaming twin of
   * the batch `q_dedup_exact` hash-groupBy.
   *
   * @param keyCols content-identity columns (e.g. the md5 of the
   *                canonicalized text, Dedup.exactHash)
   */
  def dedupStream(events: DataFrame, tsCol: String,
      keyCols: Seq[String], watermarkDelay: String = "10 minutes"): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one content-key column")
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  final case class SessionInput(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, total: Double)
  final case class SessionOut(user_id: Long, start_ts: Long, end_ts: Long,
      n_events: Int, total_value: Double)

  /**
   * Gap-based sessionization with explicit state
   * (flatMapGroupsWithState + event-time timeout): a session closes
   * when no event arrives within `gapMs` of its last event (by
   * watermark), then emits one summary row.
   */
  def sessionize(events: Dataset[SessionInput], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.lastTs, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  // Late-but-within-watermark events can predate the
                  // current session start — extend both bounds.
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(user, s.start, s.lastTs, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Timeouts must be strictly above the current watermark or
              // Spark throws and kills the query; a session whose horizon
              // already passed fires at the next watermark tick instead.
              state.setTimeoutTimestamp(
                math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /**
   * Streaming incremental near-dup — the ingestion-time face of
   * `Dedup.incrementalNearDup`: each micro-batch of arriving documents
   * probes the STATIC corpus band index and `onMatches` receives that
   * batch's (batch_id, corpus_id, jaccard) matches (route them to a
   * quarantine sink, or anti-join them off the ingest path). Built on
   * foreachBatch because the funnel needs a per-batch `distinct` over
   * candidates — as a stream-static join that would be unbounded
   * stateful dedup; per micro-batch it is the plain batch operator,
   * and offset checkpointing makes redelivery idempotent for any
   * idempotent sink.
   *
   * The corpus signature index (`Dedup.corpusNearDupIndex`) is built
   * and persisted ONCE here, outside the per-batch path — a stream
   * re-deriving and re-caching corpus signatures every micro-batch
   * would pay |corpus| digest work × batches and accumulate cached
   * frames without bound. It stays persisted for the stream's lifetime
   * (it IS the standing index); each batch's own signature cache is
   * released as soon as `onMatches` returns. The returned release
   * handle drops the standing index — call it after the query stops
   * when this corpus snapshot is superseded, or the caches of retired
   * snapshots accumulate until LRU eviction.
   *
   * @return (writer, release handle for the standing corpus index)
   */
  def dedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double)(
      onMatches: DataFrame => Unit): (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], () => Unit) = {
    val (corpusIndex, releaseIndex) =
      graft.dedup.Dedup.corpusNearDupIndex(corpus, idCol, textCol)
    val writer = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (matches, releaseBatch) = graft.dedup.Dedup.probeNearDupIndex(
          batch, corpusIndex, idCol, textCol, threshold)
        try onMatches(matches) finally releaseBatch()
        ()
      }
    (writer, releaseIndex)
  }

  /**
   * Streaming SimHash dedup-against-corpus — the fingerprint twin of
   * [[dedupAgainstCorpus]]: each micro-batch probes the STANDING
   * banded fingerprint index (built and persisted once, outside the
   * per-batch path) and `onMatches` receives that batch's
   * (batch_id, corpus_id, hamming) rows. Same foreachBatch rationale:
   * the funnel's per-batch `distinct` would be unbounded stateful
   * dedup as a stream-static join; per micro-batch it is the plain
   * batch operator, idempotent under redelivery for idempotent sinks.
   * Same release contract as [[dedupAgainstCorpus]]: the returned
   * handle drops the standing fingerprint index once this corpus
   * snapshot is superseded.
   *
   * @return (writer, release handle for the standing corpus index)
   */
  def simhashDedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, maxHamming: Int, bands: Int,
      words: Int)(
      onMatches: DataFrame => Unit): (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], () => Unit) = {
    val (corpusIndex, releaseIndex) = graft.dedup.Dedup.corpusSimhashIndex(
      corpus, idCol, textCol, maxHamming, bands, words)
    val writer = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onMatches(graft.dedup.Dedup.probeSimhashIndex(
          batch, corpusIndex, idCol, textCol, maxHamming, bands, words))
        ()
      }
    (writer, releaseIndex)
  }

  /**
   * Streaming train/eval DECONTAMINATION — the ingestion-time face of
   * `Dedup.contamination`: each micro-batch of arriving training
   * documents is scored against the STANDING eval-gram index
   * (`Dedup.evalGramIndex`, built and persisted once per eval-suite
   * revision) and `onScores` receives that batch's (id, n_grams,
   * n_overlap, contamination, contaminated) rows — route contaminated
   * docs off the training mix before they poison an eval. Same
   * standing-structure contract as the dedup faces: the release handle
   * drops the index when the eval suite is superseded.
   *
   * @return (writer, release handle for the standing eval-gram index)
   */
  def decontaminateStream(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, k: Int = 3, threshold: Double = 0.5)(
      onScores: DataFrame => Unit): (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], () => Unit) = {
    val (index, releaseIndex) =
      graft.dedup.Dedup.evalGramIndex(evalDocs, textCol, k)
    val writer = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onScores(graft.dedup.Dedup.contaminationAgainstIndex(
          batch, idCol, textCol, index, k, threshold))
        ()
      }
    (writer, releaseIndex)
  }

  /**
   * Streaming embedding dedup-against-corpus — the vector-side member
   * of the [[dedupAgainstCorpus]] family, completing it (exact hash /
   * MinHash-Jaccard / SimHash-Hamming / embedding-cosine): each
   * micro-batch of arriving vectors probes the STANDING banded-LSH
   * index (`Similarity.corpusEmbedIndex`, built and persisted once
   * outside the per-batch path) and `onMatches` receives that batch's
   * (batch_id, corpus_id, cos) rows. Same foreachBatch rationale as
   * the text faces (the funnel's per-batch distinct would be unbounded
   * stateful dedup as a stream-static join), same release contract:
   * the returned handle drops the standing index once this corpus
   * snapshot is superseded.
   *
   * @return (writer, release handle for the standing corpus index)
   */
  def embedDedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, bands: Int, planesPerBand: Int,
      dims: Int, threshold: Double)(
      onMatches: DataFrame => Unit): (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], () => Unit) = {
    val (corpusIndex, releaseIndex) = graft.ann.Similarity.corpusEmbedIndex(
      corpus, idCol, vecCol, bands, planesPerBand, dims)
    val writer = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onMatches(graft.ann.Similarity.probeEmbedIndex(
          batch, corpusIndex, idCol, vecCol, bands, planesPerBand, dims,
          threshold))
        ()
      }
    (writer, releaseIndex)
  }

  /**
   * Streaming IVF index MAINTENANCE — the write-side twin of the
   * probe faces above, completing the standing-structure symmetry:
   * every standing index here now has both a probe face and an
   * append-only maintenance path. Each arriving micro-batch of
   * vectors is assigned against the RESIDENT centroid matrix (the
   * same argmax the index was built with) and appended to its cells'
   * partitions of the at-rest [[graft.ann.IvfIndex]] — only new
   * files are written, untouched cells are never rewritten, and the
   * next probe reads the appended vectors through the same
   * directory-pruned scan (probe-after-append ≡
   * probe-after-full-rewrite, AnnLayoutSpec). Retraining the
   * centroids stays a per-SNAPSHOT decision ([[graft.ann.IvfIndex.write]]),
   * taken when the embedding drift gate fires — not a per-batch cost.
   *
   * The stream's batch id keys the append's dynamic partition
   * overwrite, so foreachBatch's at-least-once redelivery REPLACES a
   * replayed batch's own partitions instead of duplicating rows
   * (same-id idempotence pinned in AnnLayoutSpec; the stream-restart
   * case in EventTimeSpec). This requires the production stream to
   * run WITH a checkpointLocation so batch ids stay monotone across
   * restarts — a checkpointless restart redelivers id 0 with NEW
   * data, which no overwrite discipline can repair. The batch is
   * persisted around its two uses (count + append) so the reported
   * row count is the appended one.
   *
   * `onAppended` receives (batchId, rows) after each append commits —
   * the hook a checkpoint/metrics pipeline keys on. No release handle:
   * the index lives at rest, and the centroid matrix is the caller's
   * RAM-resident state. A lease refusal inside the compaction cadence
   * skips the tick (surfaced via `onMaintenanceSkipped`, retried next
   * batch) — the unleased append always lands.
   */
  def ivfAppendStream(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]], indexPath: String,
      compactEvery: Option[Int] = None,
      onMaintenanceSkipped: String => Unit = _ => ())(
      onAppended: (Long, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(compactEvery.forall(_ >= 1),
      s"compactEvery must be >= 1, got $compactEvery")
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          val n = batch.count()
          graft.ann.IvfIndex.append(batch, idCol, vecCol, centroids,
            indexPath, batchId)
          // maintenance dial: once more than compactEvery append
          // partitions have accumulated, fold the SETTLED ones
          // (strictly before this batch — the checkpoint has
          // committed them, so the settle-before-compact contract
          // holds even though this batch itself may still replay)
          compactEvery.foreach { dial =>
            if (graft.ann.IvfIndex.appendBatchCount(
                batch.sparkSession, indexPath) > dial)
              graft.sources.Lease.cadenceOrSkip(onMaintenanceSkipped) {
                graft.ann.IvfIndex.compactThrough(
                  batch.sparkSession, indexPath, batchId - 1,
                  retractIdCol = Some(idCol))
                true
              }
          }
          onAppended(batchId, n)
        } finally batch.unpersist()
        ()
      }
  }

  /**
   * DRIFT-TRIGGERED retrain-and-swap — the full standing-index
   * maintenance loop the [[ivfAppendStream]] scaladoc promises,
   * wired: per micro-batch, measure embedding drift against the
   * SERVED index's standing profile
   * ([[graft.pipeline.DriftGate.embeddingDist]]); below the threshold
   * the batch APPENDS to the current index (the cheap steady state —
   * batch-proportional bytes, centroids untouched); at or above it the
   * batch is evidence the centroid geometry no longer fits, so the
   * loop RETRAINS on at-rest-corpus ∪ batch, writes a FULL new index
   * at the next version's path, rebuilds the drift profile from the
   * new at-rest corpus, swaps the [[graft.ann.IvfIndex.Resident]]
   * handle in one atomic `set`, and only then retires the old path —
   * probers that read the handle before the swap finish against a
   * still-complete index only in a retained-versions deployment;
   * here the old version is deleted immediately after the swap
   * (single-driver harness), with the retention dial documented as
   * the production knob (`compactSnapshotRetained` keeps N).
   *
   * The profile swap is what RE-ARMS the gate: after a retrain the
   * drifted distribution IS the corpus distribution, so the next
   * batch from the same source appends quietly instead of
   * re-firing — the loop converges to steady state after one retrain
   * per genuine shift (pinned in EventTimeSpec's maintain case).
   *
   * Versioned paths come from `pathForVersion(batchId)` — batch-id
   * keyed, so a replayed RETRAIN batch rewrites its own version
   * directory (mode overwrite) rather than minting garbage paths;
   * appends inherit [[graft.ann.IvfIndex.append]]'s dynamic-overwrite
   * idempotence. The retrain write keeps the triggering batch OUT of
   * the new base (prior corpus = base, batch = its own append
   * partitions), closing the other replay window: redelivered AFTER
   * the swap committed, the batch measures below the threshold
   * against the new profile, takes the append branch, and overwrites
   * its own partitions instead of duplicating rows the base already
   * holds (pinned in EventTimeSpec). Same checkpoint requirement as
   * every foreachBatch maintenance loop here.
   *
   * `onBatch` receives (batchId, drift, action) with action ∈
   * {"append", "retrain", "retrain-replay", "retrain-skipped",
   * "empty"} — the audit trail a metrics pipeline records
   * ("retrain-replay" marks a redelivered retrain batch whose version
   * the served index already is — see the keyed-path guard;
   * "retrain-skipped" a retrain whose version write was lease-refused
   * by an ad-hoc maintainer, with the batch landed in the SERVED
   * index's append lane instead and the refusal surfaced via
   * `onMaintenanceSkipped` — the stream survives, the next drifting
   * batch retries at its own version path).
   *
   * `retainIn = Some((base, keep))` is the RETAINED-VERSIONS dial:
   * instead of deleting the superseded path immediately after the
   * swap (the single-driver default — a prober mid-read would race
   * the delete), the loop runs
   * [[graft.ann.IvfIndex.pruneSnapshots]](base, keep) so the last
   * `keep` committed versions stand and in-flight probers finish
   * against a still-complete index. `keep` must be ≥ 2 — keep 1
   * would retire the just-superseded serving version immediately,
   * which is `retainIn = None`'s job. Requires `pathForVersion` (and
   * the bootstrap path) to mint [[graft.ann.IvfIndex.snapshotPath]]
   * children of `base` — that is what the pruner enumerates.
   */
  def ivfMaintainStream(vecs: DataFrame, idCol: String, vecCol: String,
      handle: java.util.concurrent.atomic.AtomicReference[graft.ann.IvfIndex.Resident],
      driftThreshold: Double, pathForVersion: Long => String,
      k: Int, refineIters: Int = 1,
      retainIn: Option[(String, Int)] = None,
      onMaintenanceSkipped: String => Unit = _ => ())(
      onBatch: (Long, Double, String) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try ivfMaintainOnce(batch, batchId, idCol, vecCol, handle,
          driftThreshold, pathForVersion, k, refineIters, retainIn, onBatch,
          onMaintenanceSkipped)
        finally batch.unpersist()
        ()
      }

  /** One [[ivfMaintainStream]] micro-batch — package-private so the
    * replay windows are directly testable. */
  private[graft] def ivfMaintainOnce(batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String,
      handle: java.util.concurrent.atomic.AtomicReference[graft.ann.IvfIndex.Resident],
      driftThreshold: Double, pathForVersion: Long => String,
      k: Int, refineIters: Int,
      retainIn: Option[(String, Int)],
      onBatch: (Long, Double, String) => Unit,
      onMaintenanceSkipped: String => Unit = _ => ()): Unit = {
    import graft.ann.{IvfIndex, Similarity}
    import graft.pipeline.DriftGate
    // keep = 1 would retain ONLY the new version — deleting the
    // just-superseded serving index immediately, i.e. exactly the
    // prober/delete race retained mode exists to close; callers who
    // want delete-on-swap say so with retainIn = None
    require(retainIn.forall(_._2 >= 2),
      s"retainIn keep must be >= 2 (got $retainIn): keep = 1 deletes " +
        "the just-superseded serving version — use retainIn = None " +
        "for delete-on-swap")
    val cur = handle.get()
    if (batch.isEmpty) onBatch(batchId, 0.0, "empty")
    else {
      val drift = DriftGate.embeddingDist(cur.profile, batch, vecCol)
      if (drift < driftThreshold) {
        IvfIndex.append(batch, idCol, vecCol, cur.centroids,
          cur.path, batchId)
        onBatch(batchId, drift, "append")
      } else if (cur.builtBy.contains(batchId)) {
        // the served version was INSTALLED BY this batch id: this
        // batch already retrained and swapped, and is being
        // redelivered in the window where the new profile did NOT
        // absorb the shift (a small batch against a huge standing
        // corpus barely moves the profile). Retraining again would
        // write over the path `standing` is lazily reading and then
        // delete the serving index; instead, re-land the batch's own
        // append partitions (idempotent) and report the replay.
        IvfIndex.append(batch, idCol, vecCol, cur.centroids,
          cur.path, batchId)
        onBatch(batchId, drift, "retrain-replay")
      } else {
        val newPath = pathForVersion(batchId)
        // a genuine FIRST retrain must never target the serving path
        // (write-over-read, then deleting the live index): fail fast
        // BEFORE any training work — the caller's bootstrap path must
        // live outside pathForVersion's range
        require(newPath != cur.path,
          s"pathForVersion($batchId) collides with the served path " +
            s"$newPath — bootstrap the index outside pathForVersion's range")
        val spark = batch.sparkSession
        // exclude THIS batch id's partitions from the standing base:
        // a prior delivery whose retrain was lease-skipped landed the
        // batch in the served index's append lane, and a replayed
        // retrain reading it back would bake those rows into the new
        // base AND re-append them below — every batch row duplicated,
        // uncompactably. First deliveries have no such partition, so
        // the filter is a partition-pruned no-op.
        // standing retractions filter here too: the retrain's rebuild
        // is "the caller's corpus is the post-retraction truth"
        // (IvfIndex.write's contract) — a raw read would bake
        // retracted docs into the new version and retire the
        // tombstones that guarded them with the old path
        val standing = graft.sources.Retractions(spark, cur.path,
          spark.read.parquet(s"${cur.path}/corpus")
            .where(col("__batch") =!= batchId)
            .select(col(idCol), col(vecCol)),
          idCol)
        val corpus = standing
          .unionByName(batch.select(col(idCol), col(vecCol)))
        val cents = Similarity.trainCentroidsDistributed(
          corpus, idCol, vecCol, k, refineIters = refineIters)
        // base = the PRIOR standing corpus only; the triggering
        // batch lands as its own __batch=batchId partitions
        // (probe-identical to baking it in — append ≡ rewrite is
        // pinned). This is what makes an at-least-once REPLAY of
        // a retrain batch converge: redelivered, it measures
        // below the threshold against the swapped profile (which
        // absorbed the shift) and takes the append branch — or, if
        // the profile did not absorb it, the keyed-path guard above
        // catches it — either way it overwrites its own partitions;
        // were the batch baked into the base, a replay would
        // duplicate every row.
        //
        // The version write is the retrain's one LEASED verb: a
        // refusal (an ad-hoc maintainer holds the new version's
        // root) must skip the retrain — not kill the stream — so
        // the batch falls back to the append lane against the
        // SERVED index (unleased, idempotent; its rows are in the
        // corpus either way) and the next drifting batch retries
        // the retrain at its own version path. The trained
        // centroids are discarded on refusal — rare by
        // construction, and the alternative (holding them for a
        // later batch) would train on stale membership.
        graft.sources.Lease.cadence(
          IvfIndex.write(standing, idCol, vecCol, cents, newPath)) match {
          case Left(msg) =>
            IvfIndex.append(batch, idCol, vecCol, cur.centroids,
              cur.path, batchId)
            onMaintenanceSkipped(msg)
            onBatch(batchId, drift, "retrain-skipped")
            return
          case Right(_) => ()
        }
        IvfIndex.append(batch, idCol, vecCol, cents, newPath, batchId)
        // profile from the NEW at-rest corpus (read back, and
        // materialized by the persist+action inside
        // embeddingProfile's consumer below BEFORE the old path
        // dies — its lineage must never reference cur.path)
        val (prof, rel) = DriftGate.embeddingProfile(
          spark.read.parquet(s"$newPath/corpus"), vecCol)
        prof.count()
        handle.set(IvfIndex.Resident(newPath, cents, prof, rel,
          builtBy = Some(batchId)))
        cur.releaseProfile()
        retainIn match {
          // retained-versions deployment: the superseded path stays
          // until it ages out of keep-N, so probers that resolved the
          // handle pre-swap finish against a complete index
          case Some((base, keep)) => IvfIndex.pruneSnapshots(spark, base, keep)
          // single-driver default: retire immediately
          case None => IvfIndex.delete(spark, cur.path)
        }
        onBatch(batchId, drift, "retrain")
      }
    }
  }

  final case class FunnelInput(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelBuf(events: List[(Long, String)], lastTs: Long)
  final case class FunnelOut(user_id: Long, t1: Option[Long], t2: Option[Long],
      t3: Option[Long], stages: Int)

  /**
   * Streaming ordered funnel — the stateful twin of the batch
   * `q_events_funnel` (earliest-completion semantics: tᵢ = first
   * stage-i event after tᵢ₋₁). Stage events buffer in per-user state
   * until `idleMs` of EVENT-TIME inactivity, then the user's funnel
   * summary emits once and state clears; users whose first stage never
   * fired emit nothing (matching the batch contract). Emission waits
   * for the timeout because a late-but-within-watermark event can
   * lower an earlier stage's minimum and thereby change later stages —
   * stage depth only ever grows, but the timestamps are only final
   * once the user goes quiet.
   *
   * State per user = that user's funnel-stage events inside the
   * horizon (the same bound sessionization carries); timestamps ride
   * as epoch millis.
   */
  def funnel(events: Dataset[FunnelInput], stages: Seq[String], idleMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelOut] = {
    require(stages.length == 3, s"funnel expects 3 stages, got ${stages.length}")
    import events.sparkSession.implicits._
    val stageSet = stages.toSet
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FunnelInput], state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val evs = state.get.events
            state.remove()
            // t1 = min stage-0 ts; tᵢ = min stage-i ts strictly after
            // tᵢ₋₁ — order-independent folds, same spec as the batch
            val ts = stages.scanLeft(Option(Long.MinValue)) { (prev, st) =>
              prev.flatMap(p =>
                evs.collect { case (t, e) if e == st && t > p => t }.minOption)
            }.tail
            if (ts.head.isDefined)
              Iterator.single(FunnelOut(user, ts(0), ts(1), ts(2),
                ts.count(_.isDefined)))
            else Iterator.empty
          } else {
            val fresh = rows.filter(r => stageSet(r.event_type))
              .map(r => (r.ts.getTime, r.event_type)).toList
            val prev = state.getOption.getOrElse(FunnelBuf(Nil, Long.MinValue))
            val lastTs = math.max(prev.lastTs,
              if (fresh.nonEmpty) fresh.map(_._1).max else Long.MinValue)
            if (fresh.nonEmpty || prev.events.nonEmpty) {
              state.update(FunnelBuf(prev.events ++ fresh, lastTs))
              // A batch can deliver ONLY non-stage events for a user with
              // buffered state: fresh is empty, lastTs keeps its old value,
              // and lastTs + idleMs may sit below the current watermark —
              // setTimeoutTimestamp would throw and kill the query. Clamp
              // so the quiet user times out at the next watermark tick.
              state.setTimeoutTimestamp(
                math.max(lastTs + idleMs, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }

  /**
   * Streaming fold face of the standing CLUSTER-ASSIGNMENT table —
   * the [[graft.dedup.ClusterIndex]] twin of [[ivfAppendStream]],
   * closing the stream-face symmetry: every standing structure now
   * has one (curated corpus → `IngestStream.acceptIntoCorpus`, IVF →
   * [[ivfAppendStream]]/[[ivfMaintainStream]], clusters → here) —
   * backed ENTIRELY by at-rest tables, no resident session state.
   * Per micro-batch: sign the batch ONCE, derive its near-dup
   * edges — within-batch banded pairs plus a BOUNDED probe of the
   * at-rest [[graft.dedup.SignatureIndex]]
   * ([[graft.dedup.SignatureIndex.probe]]: candidates point-read
   * from the band table, the exact-Jaccard verify point-reads only
   * the candidates' text out of the [[graft.pipeline.DocStore]]) —
   * fold the labels ([[graft.dedup.ClusterIndex.foldBatch]]; replay
   * overwrites the batch's partitions), then land the batch's text
   * and signatures in the same at-rest tables, so LATER batches —
   * and later SESSIONS — see cross-batch near-dups through the
   * TABLES, not through session RAM. The restart story is "open the
   * tables": nothing re-signed, nothing rebuilt, and the per-batch
   * plan has CONSTANT depth — the prior resident union-of-leaves
   * grew one checkpointed plan leaf per batch; the spec now pins
   * zero persisted-RDD growth across batches. The store is PLAIN
   * (every labeled document lands, duplicates included — labels
   * describe duplicates) — a curating store would drop exactly the
   * rows the labels answer for.
   *
   * Bootstrap: the three tables must exist before the stream starts
   * — [[graft.pipeline.DocStore.write]] /
   * [[graft.dedup.SignatureIndex.write]] /
   * [[graft.dedup.ClusterIndex.write]] over the standing corpus (the
   * per-snapshot builds). Replay: every fold is batch-keyed and
   * idempotent; the probe seeing the batch's own prior signatures on
   * redelivery only adds self/within-batch edges, which resolve to
   * the same labels. The text/signature folds land AFTER the probe:
   * a first delivery's candidates are corpus+earlier ids only, and a
   * redelivery's own text is already at rest from the prior
   * delivery, so the verify always finds its candidates' text.
   * `maintainEvery` drives all three settled-only cadences
   * (`maintainThrough(batchId − 1)`). Same checkpointLocation
   * requirement as every foreachBatch maintenance loop here. A lease
   * refusal inside any cadence (an ad-hoc maintainer on that root)
   * skips THAT tick and surfaces through `onMaintenanceSkipped` —
   * the folds are unleased and unconditional, so the stream keeps
   * landing batches and the cadence retries next batch
   * ([[graft.sources.Lease.cadence]]).
   *
   * `onBatch` receives (batchId, rows, compacted).
   */
  def clusterFoldStream(docs: DataFrame, idCol: String, textCol: String,
      docsPath: String, sigPath: String, clusterPath: String,
      threshold: Double, maintainEvery: Option[Int] = None,
      onMaintenanceSkipped: String => Unit = _ => ())(
      onBatch: (Long, Long, Boolean) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.dedup.{ClusterIndex, Dedup, SignatureIndex}
    import graft.pipeline.DocStore
    require(maintainEvery.forall(_ >= 1),
      s"maintainEvery must be >= 1, got $maintainEvery")
    def skip(body: => Boolean): Boolean =
      graft.sources.Lease.cadenceOrSkip(onMaintenanceSkipped)(body)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          val n = batch.count()
          val spark = batch.sparkSession
          // reader-first recovery: both tables are READ below before
          // their own folds' preambles run
          SignatureIndex.recoverSwap(spark, sigPath)
          DocStore.recoverSwap(spark, docsPath)
          val (sig, releaseSig) = Dedup.batchSignatures(batch, idCol, textCol)
          try {
            val within = Dedup.pairsFromSignatures(sig, "batch_id",
                "sh_batch", threshold)
              .select(col("doc_a"), col("doc_b"))
            val cross = SignatureIndex.probe(sig, sigPath,
                DocStore.open(spark, docsPath), "doc_id", "text", threshold)
              .select(col("batch_id").as("doc_a"),
                col("corpus_id").as("doc_b"))
            ClusterIndex.foldBatch(clusterPath, batch, idCol,
              within.unionByName(cross), "doc_a", "doc_b", batchId)
            DocStore.foldBatch(docsPath, batch, idCol, textCol, batchId)
            // the probe's signatures ARE the fold's rows — land them
            // without re-signing the batch
            SignatureIndex.foldBatchSigned(sigPath,
              sig.select(col("batch_id").as("doc_id"), col("sig")),
              batchId)
          } finally releaseSig()
          val compactedCluster = maintainEvery.exists(d =>
            skip(ClusterIndex.maintainThrough(spark, clusterPath, d,
              batchId - 1)))
          val compactedSig = maintainEvery.exists(d =>
            skip(SignatureIndex.maintainThrough(spark, sigPath, d,
              batchId - 1)))
          val compactedDocs = maintainEvery.exists(d =>
            skip(DocStore.maintainThrough(spark, docsPath, d,
              batchId - 1)))
          onBatch(batchId, n,
            compactedCluster | compactedSig | compactedDocs)
        } finally batch.unpersist()
        ()
      }
  }

  /**
   * Watermarked stream-stream interval join: pair each left event with
   * the right events satisfying `condition` whose timestamp falls in
   * the trailing window `[leftTs − lookback, leftTs]` — the streaming
   * face of the batch banded range join (graft.analytics.RangeJoin).
   *
   * The time bound plus the two watermarks is exactly what Spark needs
   * to BOUND the join state: each side retains only `watermarkDelay +
   * lookback` of buffered rows per key, so state is horizon-sized, not
   * corpus-sized, on an unbounded feed. Column names must be disjoint
   * across the two sides (the ts columns are referenced unqualified).
   */
  def intervalJoin(left: DataFrame, right: DataFrame, condition: Column,
      leftTsCol: String, rightTsCol: String, lookback: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    l.join(r, condition &&
      col(rightTsCol) >= col(leftTsCol) - expr(s"INTERVAL $lookback") &&
      col(rightTsCol) <= col(leftTsCol))
  }
}
