package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.{TextAnalysis, TextQueries, TextSql}

/**
 * The END-TO-END curation pipeline — the composition story: the same
 * four stages a production pretraining-data build runs, chained as ONE
 * lazy DataFrame flow that Catalyst plans globally (filters merge into
 * the scan, each stage's projection prunes the last's):
 *
 *   1. rule-based quality filter  (narrow, scan-speed)
 *   2. exact dedup, min-id keeper (one shuffle on the content hash)
 *   3. deterministic train split  (narrow hash filter)
 *   4. sequence packing           (one shuffle on the shard key)
 *
 * Two shuffles total at any corpus size, both on uniform hash keys.
 * Every stage reuses the SAME constants/operators as its standalone
 * query (q_text_quality_filter, q_dedup_exact, q_sample_split,
 * q_text_pack), and the DuckDB oracle is assembled from the same SQL
 * mirrors — so the composed pipeline is oracle-checked end to end,
 * not just stage by stage.
 */
object PipelineQueries {

  /** Stages 1–2 of the curation pipeline — quality rules + exact-dedup
    * keepers, BEFORE the train split. This is the content-identity
    * set: the standing [[CuratedCorpus]] hash table must cover every
    * keeper (a later copy of an EVAL-split keeper is still a
    * duplicate the union pipeline would drop), so the split lives in
    * [[curatedTrainDocs]], not here. */
  /** The pre-barrier stage-1 metrics projection (one narrow pass:
    * tokenize, repetition struct, punct ratio — each exactly once per
    * row). Exposed for PlanQualitySpec: the planBarrier in
    * [[curatedKeptDocs]] pre-plans this subtree, so the outer query's
    * physical plan shows only the barrier's RDD scan — the spec
    * asserts THIS frame's one-file-scan/zero-exchange shape
    * separately. */
  private[graft] def curatedMetrics(docs: DataFrame): DataFrame = {
    import TextAnalysis._
    docs.select(col("doc_id"), col("source"), col("lang"),
      col("text"), repetitionCounts(col("text")).as("r"),
      tokens(col("text")).as("__toks"),
      punctRatio(col("text")).as("__pr"))
  }

  def curatedKeptDocs(docs: DataFrame): DataFrame = {
    import TextAnalysis._
    // stage 1: quality rules (same flags as q_text_quality_filter).
    // The heavy per-row derivations (tokenize, repetition struct,
    // punct regex) are projected ONCE behind a codegen barrier before
    // the rule predicates: FilterExec evaluates conjuncts separately
    // with no cross-conjunct subexpression elimination, and codegen
    // CSE skips higher-order functions (lambda variables) entirely, so
    // the inlined form re-ran the split regex ~8× and the repetition
    // pass 5× per row (observed in the q_pipeline_curate plan). Behind
    // the barrier each rule compares plain attributes; rows still
    // stream (no cache, no shuffle — GraftShims.planBarrier, same
    // pattern as q_cdc_type_overrides).
    val base = org.apache.spark.sql.graftshim.GraftShims.planBarrier(
      curatedMetrics(docs))
    val keep = Seq(
      col("r.n_tokens").between(MinTokens, MaxTokens),
      meanTokenLenOfTokens(col("__toks"))
        .between(MinMeanTokenLen, MaxMeanTokenLen),
      col("lang") =!= "en" ||
        stopwordRatioOfTokens(col("__toks")) >= MinStopwordRatio,
      col("__pr") <= MaxPunctRatio,
      dupTokenFrac(col("r")) <= MaxDupTokenFrac).reduce(_ && _)
    // n_tokens rides along from the barrier's materialized token
    // array: size(__toks) IS tokenCount(text) by definition
    // (tokenCount = size(tokens(text)), same expression tree), so
    // every downstream consumer that needs the count — the release
    // budget fill, sequence packing, the CuratedCorpus landing —
    // reads this long instead of re-running the tokenizing split
    // over the curated set (VERDICT r21 #4: one full tokenize pass
    // per release build). Null-as-zero matches the budget fill's
    // text face; quality-filtered rows always have non-null text.
    val kept = base.where(keep)
      .select(col("doc_id"), col("source"), col("text"),
        coalesce(size(col("__toks")).cast("long"), lit(0L)).as("n_tokens"))
    // stage 2: exact dedup — keep the min doc_id per canonical hash
    val byHash = Window.partitionBy(Dedup.exactHash(col("text")))
    kept
      .withColumn("__keeper", col("doc_id") === min("doc_id").over(byHash))
      .where(col("__keeper")).drop("__keeper")
  }

  /** The stage-3 train-split predicate (same bucket rule as
    * q_sample_split). ONE definition: [[CuratedCorpus]]'s fold path
    * applies it too, and the fold ≡ curatedTrainDocs(union)
    * equivalence contract depends on the two sites never diverging. */
  def trainSplit: org.apache.spark.sql.Column =
    TextAnalysis.charFingerprint(col("text")) % 100 < 80

  /** Stages 1–3 (quality rules → exact-dedup keepers → train split)
    * with the `source` column retained — the curated train set both
    * [[curate]] (which packs it) and [[Release.build]] (which
    * budget-fills and lays it out at rest) start from. */
  def curatedTrainDocs(docs: DataFrame): DataFrame =
    curatedKeptDocs(docs).where(trainSplit)

  def curate(docs: DataFrame): DataFrame =
    // stage 4: pack the curated train set into fixed sequences — over
    // the PRE-COUNTED tokens the curation barrier materialized
    // (packPlaced ≡ packSequences when n_tokens = tokenCount(text),
    // which stage 1 guarantees), so packing never re-tokenizes
    TextAnalysis.packPlaced(
      curatedTrainDocs(docs).filter(col("text").isNotNull)
        .select(col("doc_id"),
          (col("doc_id") % TextQueries.PackShards).as("shard"),
          col("n_tokens")),
      "doc_id", "shard", "doc_id", "n_tokens", TextQueries.PackSeqLen)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_curate" -> ((s, dir) =>
      curate(Tables(s, dir, "documents"))
        .orderBy("shard", "seq", "doc_id")),

    // Per-source audit of the versioned training-data RELEASE's kept
    // set ([[Release.summary]]): curate (quality → exact-dedup keepers
    // → train split) then cap each source at the token budget in the
    // seeded deal order — the numbers a mixture owner signs off on
    // before [[Release.build]] lays the release out at rest. The
    // oracle composes the SAME stage mirrors the standalone queries
    // pin (q_pipeline_curate's stages 1–3 + q_sample_token_budget's
    // budget window), so the composed release set is oracle-checked
    // end to end; the at-rest build/open/prune lifecycle around it is
    // pinned by ReleaseSpec.
    "q_pipeline_release" -> ((s, dir) =>
      Release.summary(Tables(s, dir, "documents"),
        Release.Seed, Release.Budget)
        .orderBy("source")),

    // The INCREMENTAL path to the same release: a standing
    // [[CuratedCorpus]] table initialized from the first 80% of the
    // corpus (by doc id), with the remaining two 10% slices folded in
    // as batches — batch-sized curation plus a hash-only probe of the
    // standing table, never a re-curation — then the budget fill over
    // the standing table's PRE-COUNTED tokens. The oracle is the SAME
    // SQL as q_pipeline_release: init+folds ≡ curating the union
    // corpus (min-id keeper ≡ first-seen under the monotone-id batch
    // contract), so the incremental path must land on the identical
    // per-source audit — the equivalence contract, driver-checked.
    "q_pipeline_release_incremental" -> ((s, dir) => {
      val train = CuratedCorpus.open(s, cachedCuratedCorpusPath(s, dir))
      graft.dedup.Sampling.tokenBudgetFillCounted(train,
          "source", "doc_id", "n_tokens", Release.Seed, Release.Budget)
        .groupBy("source")
        .agg(count(lit(1)).as("docs_kept"),
          sum("n_tokens").as("tokens_kept"))
        .orderBy("source")
    }),

    // Epoch-aware sequence packing over a MOUNTED release
    // ([[Release.packEpoch]]): epoch 1's placement — the
    // manifest-keyed re-deal, a genuinely fresh permutation — packed
    // into fixed q_text_pack sequences from the release's PRE-COUNTED
    // tokens. The multi-epoch training-reader plan: no text read, no
    // byte rewritten, for any epoch (plan-pinned in PlanQualitySpec).
    // The oracle recomputes the kept set, the epoch-1 deal (same mix
    // arithmetic at seed+1), and the pack windows in SQL, so the
    // whole composed read plan is oracle-checked end to end.
    "q_pipeline_epoch_pack" -> ((s, dir) =>
      Release.packEpoch(s, cachedReleasePath(s, dir), 1, EpochPackEpoch,
        TextQueries.PackSeqLen)
        .orderBy("shard", "seq", "doc_id")),

    // The quarantine TRIAGE read: deterministic failure slices land
    // under their (batch, reason) partitions (idempotent overwrites),
    // and openQuarantine LWW-surfaces each doc once — latest batch,
    // reason tie-break — which the oracle restates as one window.
    "q_pipeline_quarantine" -> ((s, dir) => {
      val q = IngestStream.openQuarantine(s,
        cachedQuarantinePath(s, dir), "doc_id")
      // a zero-row corpus quarantines nothing, and a never-written
      // table reads back as the zero-COLUMN empty frame by contract —
      // the query's answer is the typed empty result
      if (q.columns.isEmpty) {
        import s.implicits._
        Seq.empty[(Long, Long, String)]
          .toDF("doc_id", "q_batch", "q_reason")
      } else
        q.select(col("doc_id"), col("__batch_id").as("q_batch"),
          col("__reason").as("q_reason"))
          .orderBy("doc_id")
    }),

    // The RETRACTION read: a standing corpus (init + two folds) with a
    // deterministic id slice retracted, compacted (physical purge +
    // settled-tombstone clear), then attacked by BOTH resurrection
    // paths — the retracted CONTENT resubmitted under fresh ids, and
    // an at-least-once replay of a retracted doc's own origin batch —
    // each suppressed by the retained content hashes
    // ([[CuratedCorpus.retract]]'s suppression contract). The oracle
    // states where all of that must land: the stage-1–3 train set
    // minus exactly the retracted ids. Tombstone mechanics
    // (O(ids) writes, broadcast filter, crash windows) are pinned in
    // StandingStoreSpec/CuratedCorpusSpec; THIS row pins the composed
    // end state against SQL.
    "q_pipeline_retract" -> ((s, dir) =>
      CuratedCorpus.open(s, cachedRetractedCorpusPath(s, dir))
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")),

    // The CONSISTENT cross-root read ([[IngestStream.lockstepView]])
    // over a DELIBERATELY torn loop: the corpus is a fold AND a
    // retraction leg ahead of its sibling indexes (the two tear
    // shapes a consumer racing the live router can catch). The view
    // pins every leg to the shared watermark and masks the corpus's
    // standing tombstones over the index legs, so the answer is the
    // train set THROUGH the slowest root's clock minus every
    // retracted id — which the oracle states in SQL. The full outer
    // joins make each leg load-bearing: an id leaking into (or
    // missing from) any leg surfaces as a null-attribute or
    // zero-flag row and fails the hash.
    "q_pipeline_lockstep" -> ((s, dir) => {
      val (cc, sigs, clusters) = cachedLockstepRoots(s, dir)
      val v = IngestStream.lockstepView(s, cc, sigs, clusters)
      // One exchange instead of three (guide §2.4): each leg is unique
      // on doc_id (corpus PK; one signature/cluster row per doc — the
      // oracle pins one output row per id), so the two FullOuter joins
      // are equivalent to a tagged union + one groupBy(doc_id). The
      // full-outer plan shuffled every leg AND re-exchanged after each
      // join (the coalesced join key is a derived column, so the
      // output partitioning is lost); the union aggregates map-side
      // and shuffles once. Tear detection is unchanged: an id missing
      // from a leg still surfaces as a null attribute / zero flag.
      v.docs.select(col("doc_id"), col("source"), col("n_tokens"),
          lit(0).as("leg"))
        .unionByName(v.signatures.select(col("doc_id"),
          lit(null).cast("string").as("source"),
          lit(null).cast("long").as("n_tokens"), lit(1).as("leg")))
        .unionByName(v.clusters.select(col("doc_id"),
          lit(null).cast("string").as("source"),
          lit(null).cast("long").as("n_tokens"), lit(2).as("leg")))
        .groupBy("doc_id")
        .agg(
          max(when(col("leg") === 0, col("source"))).as("source"),
          max(when(col("leg") === 0, col("n_tokens"))).as("n_tokens"),
          max(when(col("leg") === 1, lit(1L)).otherwise(lit(0L)))
            .as("sig_leg"),
          max(when(col("leg") === 2, lit(1L)).otherwise(lit(0L)))
            .as("cluster_leg"))
        .orderBy("doc_id")
    }))

  /** The epoch q_pipeline_epoch_pack exercises — NOT 0, so the query
    * drives the epochDeal join path, not the stored files. */
  val EpochPackEpoch = 1

  /** Standing committed release per (session, dir): one build,
    * reused across bench/verify iterations (scratch-pathed, JVM-exit
    * retired) — epoch reads are the recurring cost, the build is the
    * per-snapshot cost. */
  private val releaseCache =
    graft.Tables.registerSessionCache(
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String])
  private def cachedReleasePath(s: SparkSession, dir: String): String =
    releaseCache.getOrElseUpdate((s, dir), {
      val root = graft.Scratch.path("graft_release", dir)
      graft.Scratch.registerCleanup(root)
      Release.build(Tables(s, dir, "documents"), root, 1,
        Release.Seed, Release.Budget, Release.Shards)
      root
    })

  /** Standing curated-corpus table per (session, dir): init once from
    * the base slice, fold the two batch slices, reuse across
    * bench/verify iterations (scratch-pathed, JVM-exit retired). */
  private val corpusCache =
    graft.Tables.registerSessionCache(
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String])
  private def cachedCuratedCorpusPath(s: SparkSession, dir: String): String =
    corpusCache.getOrElseUpdate((s, dir), {
      val docs = Tables(s, dir, "documents")
      val mxRow = docs.agg(max("doc_id")).head()
      val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      val (t1, t2) = (mx * 8 / 10, mx * 9 / 10)
      val path = graft.Scratch.path("graft_curated", dir)
      graft.Scratch.registerCleanup(path)
      CuratedCorpus.init(docs.where(col("doc_id") < t1), path)
      CuratedCorpus.foldBatch(path,
        docs.where(col("doc_id") >= t1 && col("doc_id") < t2), 0L)
      CuratedCorpus.foldBatch(path, docs.where(col("doc_id") >= t2), 1L)
      path
    })

  /** Standing RETRACTED corpus per (session, dir): the
    * [[cachedCuratedCorpusPath]] build (its own copy — retraction
    * mutates the table, and the release-incremental query keeps
    * reading the pristine one), then the q_pipeline_retract
    * scenario: retract the standing docs with `doc_id % 7 = 3`
    * (spanning the base snapshot and both folds), compact — the
    * purge + clear path, so the query reads a table where the
    * tombstones are GONE and suppression alone carries the
    * contract — and fold both resurrection attempts. */
  private val retractCache =
    graft.Tables.registerSessionCache(
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String])
  private def cachedRetractedCorpusPath(s: SparkSession, dir: String): String =
    retractCache.getOrElseUpdate((s, dir), {
      val docs = Tables(s, dir, "documents")
      val mxRow = docs.agg(max("doc_id")).head()
      val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      val (t1, t2) = (mx * 8 / 10, mx * 9 / 10)
      val path = graft.Scratch.path("graft_retracted", dir)
      graft.Scratch.registerCleanup(path)
      CuratedCorpus.init(docs.where(col("doc_id") < t1), path)
      CuratedCorpus.foldBatch(path,
        docs.where(col("doc_id") >= t1 && col("doc_id") < t2), 0L)
      CuratedCorpus.foldBatch(path, docs.where(col("doc_id") >= t2), 1L)
      // retract STANDING ids (the causal contract: a delete request
      // names documents the table answers for), on the fold clock's
      // current watermark
      CuratedCorpus.retract(s, path,
        CuratedCorpus.open(s, path).where(col("doc_id") % 7 === 3)
          .select("doc_id"),
        "doc_id", 1L)
      CuratedCorpus.compact(s, path)
      // resurrection attempt 1: the retracted docs' CONTENT under
      // fresh (monotone) ids — retained hashes suppress every row
      CuratedCorpus.foldBatch(path,
        docs.where(col("doc_id") % 7 === 3)
          .withColumn("doc_id", col("doc_id") + lit(mx + 1)),
        2L)
      // resurrection attempt 2: an origin batch redelivered AFTER the
      // purge collapsed it — content probes the retained hashes,
      // re-lands nothing
      CuratedCorpus.foldBatch(path, docs.where(col("doc_id") >= t2), 1L)
      path
    })

  /** Standing TORN loop per (session, dir) — q_pipeline_lockstep's
    * fixture: corpus + signature + cluster roots built through batch 0
    * by the composed router, then torn TWICE the way a crash inside
    * the router tears them — batch 1 folded into the corpus only (the
    * mid-router window), and a retraction landed on the corpus only
    * (the corpus-first delete order's window). Left torn on purpose:
    * the query reads THROUGH the tears. */
  private val lockstepCache = graft.Tables.registerSessionCache(
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), (String, String, String)])
  private def cachedLockstepRoots(s: SparkSession,
      dir: String): (String, String, String) =
    lockstepCache.getOrElseUpdate((s, dir), {
      val docs = Tables(s, dir, "documents")
      val mxRow = docs.agg(max("doc_id")).head()
      val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      val (t1, t2) = (mx * 8 / 10, mx * 9 / 10)
      val root = graft.Scratch.path("graft_lockstep", dir)
      graft.Scratch.registerCleanup(root)
      val (cc, sigs, clusters) =
        (s"$root/cc", s"$root/sigs", s"$root/clusters")
      val T = graft.dedup.DedupQueries.IncrementalFuzzyThreshold
      CuratedCorpus.init(docs.where(col("doc_id") < t1), cc)
      IngestStream.bootstrapIndexes(s, cc, sigs, clusters, T)
      val b0 = docs.where(col("doc_id") >= t1 && col("doc_id") < t2)
      IngestStream.acceptIntoCorpusIndexed(b0,
        IngestStream.BatchReport(0L, b0.count(), Nil, 0.0, 0L),
        cc, sigs, clusters, T)
      // tear 1: the corpus folds batch 1, no index has
      CuratedCorpus.foldBatch(cc, docs.where(col("doc_id") >= t2), 1L)
      // tear 2: the corpus-first retraction leg only (ids standing,
      // dated on the fold clock's watermark)
      CuratedCorpus.retract(s, cc,
        CuratedCorpus.open(s, cc).where(col("doc_id") % 7 === 2)
          .select("doc_id"),
        "doc_id", 1L)
      (cc, sigs, clusters)
    })

  /** Standing quarantine table per (session, dir): deterministic
    * slices land under their (batch, reason) partition keys — the
    * writes are idempotent dynamic overwrites, so re-entry re-lands
    * identical partitions. Shapes exercised: two same-batch slices
    * under different reasons, a later-batch resubmission (LWW picks
    * the newer stamp), and a same-batch same-doc two-reason tie
    * (deterministic reason tie-break). */
  private val quarCache =
    graft.Tables.registerSessionCache(
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String])
  private def cachedQuarantinePath(s: SparkSession, dir: String): String =
    quarCache.getOrElseUpdate((s, dir), {
      val docs = Tables(s, dir, "documents")
        .select("doc_id", "source", "text")
      val path = graft.Scratch.path("graft_quarantine", dir)
      graft.Scratch.registerCleanup(path)
      def rep(id: Long) = IngestStream.BatchReport(id, 0L, Nil, 0.0, 0L)
      IngestStream.quarantine(docs.where(col("doc_id") % 10 === 3),
        rep(1L), "dq", path)
      IngestStream.quarantine(docs.where(col("doc_id") % 10 === 7),
        rep(1L), "drift", path)
      IngestStream.quarantine(docs.where(col("doc_id") % 20 === 3),
        rep(2L), "resubmit", path)
      IngestStream.quarantine(docs.where(col("doc_id") % 20 === 3),
        rep(2L), "audit", path)
      path
    })

  def oracleSql: Map[String, String] = {
    import TextAnalysis._
    val t = "text"
    Map("q_pipeline_curate" -> s"""
      WITH q AS (
        SELECT doc_id, lang, text, ${TextSql.tokens(t)} AS toks
        FROM documents),
      kept AS (
        SELECT doc_id, text FROM q
        WHERE len(toks) BETWEEN $MinTokens AND $MaxTokens
          AND ${TextSql.meanTokenLen(t)}
                BETWEEN $MinMeanTokenLen AND $MaxMeanTokenLen
          AND (lang <> 'en' OR ${TextSql.stopwordRatio(t)} >= $MinStopwordRatio)
          AND ${TextSql.punctRatio(t)} <= $MaxPunctRatio
          AND ${TextSql.dupTokenFrac("toks")} <= $MaxDupTokenFrac),
      dd AS (
        SELECT doc_id, text,
          doc_id = MIN(doc_id) OVER (PARTITION BY
            md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
            AS keeper
        FROM kept),
      train AS (
        SELECT doc_id, text FROM dd
        WHERE keeper AND ${TextSql.charPolyHash(t)} % 100 < 80),
      tok AS (
        SELECT doc_id, doc_id % ${TextQueries.PackShards} AS shard,
          len(${TextSql.tokens(t)}) AS n_tokens
        FROM train WHERE text IS NOT NULL),
      p AS (
        SELECT doc_id, shard, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_start
        FROM tok WHERE n_tokens > 0),
      e AS (SELECT *, tok_start + n_tokens AS tok_end FROM p),
      x AS (
        SELECT shard, doc_id, tok_start, tok_end,
          unnest(range(tok_start // ${TextQueries.PackSeqLen},
                       (tok_end - 1) // ${TextQueries.PackSeqLen} + 1)) AS seq
        FROM e)
      SELECT shard, seq, doc_id,
        greatest(tok_start, seq * ${TextQueries.PackSeqLen})
          - seq * ${TextQueries.PackSeqLen} AS seq_offset,
        least(tok_end, (seq + 1) * ${TextQueries.PackSeqLen})
          - greatest(tok_start, seq * ${TextQueries.PackSeqLen})
          AS n_tokens_in_seq
      FROM x ORDER BY shard, seq, doc_id""",

    // shared by q_pipeline_release AND q_pipeline_release_incremental:
    // the incremental standing-table path must land on the identical
    // full-corpus answer (the CuratedCorpus equivalence contract)
    "q_pipeline_release" -> releaseOracle,
    "q_pipeline_release_incremental" -> releaseOracle,
    "q_pipeline_epoch_pack" -> epochPackOracle,

    "q_pipeline_quarantine" -> s"""
      WITH q AS (
        SELECT doc_id, 1 AS q_batch, 'dq' AS q_reason
        FROM documents WHERE doc_id % 10 = 3
        UNION ALL
        SELECT doc_id, 1, 'drift' FROM documents WHERE doc_id % 10 = 7
        UNION ALL
        SELECT doc_id, 2, 'resubmit' FROM documents WHERE doc_id % 20 = 3
        UNION ALL
        SELECT doc_id, 2, 'audit' FROM documents WHERE doc_id % 20 = 3),
      r AS (
        SELECT doc_id, q_batch, q_reason,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY q_batch DESC, q_reason ASC) AS rn
        FROM q)
      SELECT doc_id, q_batch, q_reason FROM r WHERE rn = 1
      ORDER BY doc_id""",

    // init + folds + retract + compact + both resurrection attempts
    // must land on exactly: the stage-1–3 train set minus the
    // retracted ids (token counts as stored — the same expression the
    // release oracles count with)
    "q_pipeline_retract" -> (trainCtes + s"""
      SELECT doc_id, source,
        COALESCE(${TextSql.tokenCount("text")}, 0) AS n_tokens
      FROM train WHERE doc_id % 7 <> 3
      ORDER BY doc_id"""),

    // the lockstep view over the torn loop: the train set THROUGH the
    // slowest root's watermark (batch 0 — docs below the t2 slice;
    // curating the slice ≡ slicing the curated set, because the
    // min-id exact-dedup keeper of a doc below t2 is itself below t2)
    // minus EVERY retracted id (tombstones apply in full), every
    // surviving id answered by all three legs
    "q_pipeline_lockstep" -> (trainCtes + s"""
      SELECT doc_id, source,
        COALESCE(${TextSql.tokenCount("text")}, 0) AS n_tokens,
        CAST(1 AS BIGINT) AS sig_leg, CAST(1 AS BIGINT) AS cluster_leg
      FROM train
      WHERE doc_id < (SELECT max(doc_id) * 9 // 10 FROM documents)
        AND doc_id % 7 <> 2
      ORDER BY doc_id"""))
  }

  /** Stages 1–3 of the pipeline as shared SQL CTEs, ending in
    * `train(doc_id, source, text)` — the standing [[CuratedCorpus]]
    * doc set. The retract oracle reads it directly; [[keptSetCtes]]
    * extends it with the seeded budget fill. */
  private lazy val trainCtes: String = {
    import TextAnalysis._
    val t = "text"
    s"""
      WITH q AS (
        SELECT doc_id, source, lang, text, ${TextSql.tokens(t)} AS toks
        FROM documents),
      kept AS (
        SELECT doc_id, source, text FROM q
        WHERE len(toks) BETWEEN $MinTokens AND $MaxTokens
          AND ${TextSql.meanTokenLen(t)}
                BETWEEN $MinMeanTokenLen AND $MaxMeanTokenLen
          AND (lang <> 'en' OR ${TextSql.stopwordRatio(t)} >= $MinStopwordRatio)
          AND ${TextSql.punctRatio(t)} <= $MaxPunctRatio
          AND ${TextSql.dupTokenFrac("toks")} <= $MaxDupTokenFrac),
      dd AS (
        SELECT doc_id, source, text,
          doc_id = MIN(doc_id) OVER (PARTITION BY
            md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
            AS keeper
        FROM kept),
      train AS (
        SELECT doc_id, source, text FROM dd
        WHERE keeper AND ${TextSql.charPolyHash(t)} % 100 < 80)"""
  }

  /** The release's KEPT SET as shared SQL CTEs — stages 1–3 plus the
    * seeded budget fill, ending in `keptset(doc_id, source,
    * n_tokens)`. Both release oracles and the epoch-pack oracle build
    * on exactly this set, so the three stay provably one pipeline. */
  private lazy val keptSetCtes: String = {
    val t = "text"
    trainCtes + s""",
      k0 AS (
        SELECT doc_id, source,
          COALESCE(${TextSql.tokenCount(t)}, 0) AS n_tokens,
          ((doc_id + ${Release.Seed}) % 2147483648 + 2147483648)
            % 2147483648 AS x
        FROM train),
      m1 AS (SELECT doc_id, source, n_tokens,
          (xor(x, x >> 16) * 73244475) % 2147483648 AS x FROM k0),
      m2 AS (SELECT doc_id, source, n_tokens,
          (xor(x, x >> 16) * 73244475) % 2147483648 AS x FROM m1),
      k AS (SELECT doc_id, source, n_tokens, xor(x, x >> 16) AS key FROM m2),
      c AS (SELECT doc_id, source, n_tokens,
          CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY key, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
        FROM k),
      keptset AS (
        SELECT doc_id, source, n_tokens FROM c
        WHERE cum_tokens <= ${Release.Budget})"""
  }

  private lazy val releaseOracle: String = keptSetCtes + s"""
      SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
        CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
      FROM keptset GROUP BY source ORDER BY source"""

  /** q_pipeline_epoch_pack's oracle: the kept set re-dealt at
    * `seed + epoch` (the [[Release.epochDeal]] arithmetic — same
    * two-round mix as the budget fill's key, shard = key high bits,
    * pos = in-shard rank) and packed by the q_pipeline_curate pack
    * windows, over the SAME pre-counted tokens the release stores. */
  private lazy val epochPackOracle: String = {
    val L = TextQueries.PackSeqLen
    val slice = 2147483648L / Release.Shards
    keptSetCtes + s""",
      d0 AS (
        SELECT doc_id, n_tokens,
          ((doc_id + ${Release.Seed + EpochPackEpoch}) % 2147483648
            + 2147483648) % 2147483648 AS x
        FROM keptset),
      d1 AS (SELECT doc_id, n_tokens,
          (xor(x, x >> 16) * 73244475) % 2147483648 AS x FROM d0),
      d2 AS (SELECT doc_id, n_tokens,
          (xor(x, x >> 16) * 73244475) % 2147483648 AS x FROM d1),
      dk AS (SELECT doc_id, n_tokens, xor(x, x >> 16) AS key FROM d2),
      deal AS (
        SELECT doc_id, n_tokens, key // $slice AS shard,
          row_number() OVER (PARTITION BY key // $slice
            ORDER BY key, doc_id) AS pos
        FROM dk),
      pp AS (
        SELECT doc_id, shard, n_tokens, pos,
          CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_start
        FROM deal WHERE n_tokens > 0),
      pe AS (SELECT *, tok_start + n_tokens AS tok_end FROM pp),
      px AS (
        SELECT shard, doc_id, tok_start, tok_end,
          unnest(range(tok_start // $L, (tok_end - 1) // $L + 1)) AS seq
        FROM pe)
      SELECT shard, seq, doc_id,
        greatest(tok_start, seq * $L) - seq * $L AS seq_offset,
        least(tok_end, (seq + 1) * $L) - greatest(tok_start, seq * $L)
          AS n_tokens_in_seq
      FROM px ORDER BY shard, seq, doc_id"""
  }
}
