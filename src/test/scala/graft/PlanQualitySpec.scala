package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}

/**
 * Structural plan assertions — the scale-design table in README.md as
 * executable checks, so a refactor that silently degrades a plan (a
 * broadcast turning into a shuffle join, a pushed filter detaching
 * from the scan, an extra exchange) fails here instead of at 100 TB.
 *
 * All assertions are on the INITIAL physical plan (before AQE
 * reoptimization), which is what the shapes are designed against.
 */
class PlanQualitySpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  // collectWithSubqueries walks subqueriesAll recursively, so a future
  // query shape that tucks an exchange inside a scalar subquery on a
  // descendant node still counts (none of the current plans carry
  // subqueries — this is future-proofing, not present coverage)
  private def collectAll[A](p: SparkPlan)(pf: PartialFunction[SparkPlan, A]): Seq[A] =
    p.collectWithSubqueries(pf)

  test("q_join_enrich: all three dims broadcast, no cartesian, one fact shuffle pre-agg") {
    val p = plan(SparkEntry.queries("q_join_enrich")(spark, Sf))
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.length >= 3, s"expected >=3 broadcast joins, got ${bhj.length}")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // lineitem⋈orders shuffles on the join key; the dims must not add
    // exchanges beyond the aggregate's and the final orderBy's range
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length <= 4, s"expected <=4 exchanges, got ${ex.length}:\n$p")
  }

  test("q_events_sessionize: both windows and the aggregate reuse ONE user_id exchange") {
    val p = plan(SparkEntry.queries("q_events_sessionize")(spark, Sf))
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    // one hash exchange on user_id + the final presentation orderBy
    assert(ex.length <= 2, s"expected <=2 exchanges, got ${ex.length}:\n$p")
  }

  test("q_ann_ivf: corpus is never shuffled — probes broadcast onto the narrow assignment") {
    val p = plan(SparkEntry.queries("q_ann_ivf")(spark, Sf))
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "probe join must broadcast the query side")
    // the only exchanges: the top-k WindowGroupLimit partial→final on
    // query_id and the presentation sort — never the corpus scan side
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length <= 2, s"expected <=2 exchanges, got ${ex.length}:\n$p")
    // single assignment evaluation: the K-dot argmax (array_max over
    // the score structs) must appear EXACTLY once — dropping the
    // nullability coalesce in ivfTopK re-infers an isnotnull Filter
    // that renders a second full copy (verified against the pre-fix
    // plan, where this count reads 2)
    val planStr = p.toString
    assert("array_max".r.findAllIn(planStr).length == 1,
      "cell assignment evaluated more than once (inferred isnotnull?)")
  }

  test("q_cdc_lww: hot-key collapse plans partial+final WindowGroupLimit") {
    // The skew-safety claim in CdcOps.lastWriteWins' scaladoc as an
    // executable check: the rank<=1 filter must plan a PARTIAL
    // WindowGroupLimit before the (table, key) exchange, so a key with
    // millions of updates in a batch collapses to one row per map
    // partition before it shuffles. If a Spark upgrade or refactor
    // drops the partial pass, the hot-key story breaks silently at
    // scale — and loudly here.
    val p = plan(SparkEntry.queries("q_cdc_lww")(spark, Sf))
    val limits = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.length == 2,
      s"expected partial+final WindowGroupLimit, got ${limits.length}:\n$p")
  }

  test("lastWriteWins on a 90%-one-key batch: partial limit collapses the hot key BEFORE the shuffle") {
    // The skew case behind the q_cdc_lww pin, driven with actual skew
    // (VERDICT r15 #6). AQE's skew mitigation cannot help a window:
    // OptimizeSkewedJoin splits only JOIN stages, and a window
    // exchange's partitions cannot be split without breaking per-key
    // totality — so the (table, key) exchange's skew protection IS
    // the partial WindowGroupLimit, which emits at most one row per
    // (key, map partition) before the shuffle. Asserted two ways:
    // the plan carries partial+final, AND the exchange's RUNTIME
    // write metric stays at ~(#uniqueKeys + #mapPartitions) rows —
    // input-shape-immune — instead of the 90%-hot input row count.
    import org.apache.spark.sql.functions.{col, lit, when}
    val n = 200000L
    val skewed = spark.range(n).select(
      lit("T").as("tbl"),
      when(col("id") % 10 < 9, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("offset"))
    val collapsed = graft.operators.CdcOps.lastWriteWins(
      skewed, "tbl", Seq("k"), "offset")
    val p = plan(collapsed)
    val limits = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.length == 2,
      s"expected partial+final WindowGroupLimit on the skewed batch:\n$p")
    // drive the SAME QueryExecution, then read the executed exchange
    val rows = collapsed.collect()
    val uniques = n / 10 // ids with id % 10 == 9
    assert(rows.length == uniques + 1,
      s"fixture: ${rows.length} keys, expected ${uniques + 1}")
    val written = PlanInspect.maxShuffleRecordsWritten(collapsed)
    val mapParts = skewed.rdd.getNumPartitions
    assert(written <= uniques + 2L * mapParts && written > 0,
      s"the hot key must collapse map-side: $written records shuffled " +
        s"for ${uniques + 1} keys over $mapParts map partitions " +
        s"(a dropped partial limit would shuffle ~$n)")
  }

  test("q_text_topk_per_group: rank filter plans a WindowGroupLimit below the exchange") {
    val p = plan(SparkEntry.queries("q_text_topk_per_group")(spark, Sf))
    val limits = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    // partial (map-side, pre-exchange) + final: the shuffle carries
    // O(groups · k) rows instead of the vocabulary
    assert(limits.length == 2,
      s"expected partial+final WindowGroupLimit, got ${limits.length}:\n$p")
  }

  test("q_events_range_join: banded range join stays an equi-join (no cartesian/NLJ)") {
    val p = plan(SparkEntry.queries("q_events_range_join")(spark, Sf))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
      "range join degenerated to a cartesian product")
    val nlj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(nlj.isEmpty, "range join degenerated to a nested-loop join")
  }

  test("q_sample_stratified: rates dim broadcasts; the document side never shuffles") {
    val p = plan(SparkEntry.queries("q_sample_stratified")(spark, Sf))
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "rates join must broadcast")
    // only the presentation orderBy may exchange
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length <= 1, s"expected <=1 exchange, got ${ex.length}:\n$p")
  }

  test("q_text_repetition: the native struct is evaluated once, not per field") {
    val p = plan(SparkEntry.queries("q_text_repetition")(spark, Sf))
    val planStr = p.toString
    assert("repetition_counts".r.findAllIn(planStr).length == 1,
      s"repetition_counts inlined per field reference:\n$planStr")
  }

  test("q_text_pack: one shard exchange feeds the window; the explode is narrow") {
    val p = plan(SparkEntry.queries("q_text_pack")(spark, Sf))
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    // the shard-key hash exchange for the running total + the
    // presentation orderBy's range exchange — nothing else
    assert(ex.length <= 2, s"expected <=2 exchanges, got ${ex.length}:\n$p")
  }

  test("q_sample_mixture: rates broadcast; only the stats pass aggregates") {
    val p = plan(SparkEntry.queries("q_sample_mixture")(spark, Sf))
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "derived-rates join must broadcast")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_ann_project: narrow generate-only pass — no exchange before the sort") {
    val p = plan(SparkEntry.queries("q_ann_project")(spark, Sf))
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    // only the presentation orderBy may exchange
    assert(ex.length <= 1, s"expected <=1 exchange, got ${ex.length}:\n$p")
  }

  test("q_events_funnel: one scan, one user_id exchange — stage folds are narrow") {
    val p = plan(SparkEntry.queries("q_events_funnel")(spark, Sf))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // the collect_list exchange on user_id + the presentation orderBy;
    // the dependent-aggregate-join formulation this replaced planned
    // SIX exchanges and six scans of events
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length <= 2, s"expected <=2 exchanges, got ${ex.length}:\n$p")
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected 1 events scan, got ${scans.length}")
  }

  test("q_pipeline_curate: two semantic shuffles end to end, one scan") {
    val p = plan(SparkEntry.queries("q_pipeline_curate")(spark, Sf))
    // content-hash window + shard window + presentation orderBy —
    // the quality filter and split stages must stay narrow
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length <= 3, s"expected <=3 exchanges, got ${ex.length}:\n$p")
    // the documents file scan lives INSIDE the r21 metrics planBarrier
    // (pre-planned subtree), so the outer plan must show exactly one
    // barrier RDD scan and no file scan of its own…
    val fileScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val rddScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.RDDScanExec => s
    }
    assert(fileScans.isEmpty && rddScans.length == 1,
      s"expected the one barrier scan, got ${fileScans.length} file + " +
        s"${rddScans.length} rdd scans:\n$p")
    // …and the barrier's input — the stage-1 metrics projection — must
    // itself be ONE narrow documents pass: one file scan, no exchange
    val m = plan(graft.pipeline.PipelineQueries.curatedMetrics(
      graft.Tables(spark, Sf, "documents")))
    val mScans = collectAll(m) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(mScans.length == 1,
      s"expected 1 documents scan in the metrics pass, got ${mScans.length}")
    assert(collectAll(m) { case e: ShuffleExchangeLike => e }.isEmpty,
      "the metrics pass must be narrow")
  }

  test("q_text_keywords: single corpus scan — df rides a window, not a re-derived join") {
    val p = plan(SparkEntry.queries("q_text_keywords")(spark, Sf))
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // the tf-join-dfreq formulation re-derives the tf subtree and
    // scans documents twice
    assert(scans.length == 1, s"expected 1 documents scan, got ${scans.length}")
  }

  test("q_events_retention: one events scan — cohort day rides the user window") {
    val p = plan(SparkEntry.queries("q_events_retention")(spark, Sf))
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected 1 events scan, got ${scans.length}")
    // distinct + user window + matrix groupBy + presentation sort
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length <= 4, s"expected <=4 exchanges, got ${ex.length}:\n$p")
  }

  test("q_events_outliers: stats broadcast back; events scanned, never cartesian") {
    val p = plan(SparkEntry.queries("q_events_outliers")(spark, Sf))
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "per-type stats must broadcast")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_ann_knn_graph: per-vertex rank plans partial+final WindowGroupLimit") {
    val p = plan(SparkEntry.queries("q_ann_knn_graph")(spark, Sf))
    val limits = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.length == 2,
      s"expected partial+final WindowGroupLimit, got ${limits.length}:\n$p")
  }

  test("q_sample_shuffle: id-only scan, shard-local sorts, no operator-level global sort") {
    val p = plan(SparkEntry.queries("q_sample_shuffle")(spark, Sf))
    // the key is pure id arithmetic — the scan must not read text
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1 &&
      scans.head.requiredSchema.fieldNames.toSeq == Seq("doc_id"),
      s"shuffle deal must scan only doc_id: ${scans.map(_.requiredSchema)}")
    // exactly two exchanges: the shard hash partition for the window,
    // and the driver-contract presentation orderBy (range) — the deal
    // itself never plans a total-order sort
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length == 2, s"expected shard hash + presentation range, got $ex")
    // the window's sort runs per shard partition (global = false)
    val localSorts = collectAll(p) {
      case s: org.apache.spark.sql.execution.SortExec if !s.global => s
    }
    assert(localSorts.nonEmpty, "rank sort must be shard-local")
  }

  test("q_sample_token_budget: chunk-local windows, broadcast base table") {
    val p = plan(SparkEntry.queries("q_sample_token_budget")(spark, Sf))
    // the base-offset table broadcasts (≤ sources·chunks rows by
    // construction) — a shuffled join here would mean the corpus is
    // exchanging on (source, chunk) twice
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "chunk base offsets must broadcast-join")
    // exactly two exchanges: the (source, chunk) hash for the
    // running-sum window, and the presentation orderBy's range — the
    // whole-source window (one task per source) must never plan
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length == 2, s"expected chunk hash + presentation range, got $ex")
    // the running sum's sort is partition-local, never global
    val globalSorts = collectAll(p) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.length <= 1, // the presentation orderBy only
      s"unexpected global sorts:\n$p")
  }

  test("q_pipeline_release_incremental: the budget fill never reads standing text") {
    val p = plan(SparkEntry.queries("q_pipeline_release_incremental")(spark, Sf))
    // the standing table pre-counted tokens at fold time, so the fill
    // is narrow rows end to end: no scan — file or materialized
    // checkpoint — may carry the text column (text is only touched by
    // Release.build's final budget-bounded layout join, not here)
    val fileScans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.forall(!_.requiredSchema.fieldNames.contains("text")),
      s"fill must not read text: ${fileScans.map(_.requiredSchema)}")
    val rowScans = collectAll(p) {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }
    assert(rowScans.forall(!_.output.map(_.name).contains("text")),
      s"checkpointed fill input must be narrow:\n$p")
    assert((fileScans ++ rowScans).nonEmpty)
    // q_sample_token_budget's broadcast-fill shape plus the per-source
    // audit aggregate: chunk hash + source hash + presentation range
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "chunk base offsets must broadcast-join")
    val ex = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(ex.length == 3,
      s"expected chunk hash + audit agg + presentation range, got $ex")
  }

  test("openAt: the batch bound is a partition filter — excluded folds' files are never read") {
    import graft.sources.{StandingStore, TableSpec}
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft-openat-pin").toString + "/t"
    val s = new StandingStore(root, Seq(
      TableSpec("a", "k LONG, __batch LONG", Seq("k"))))
    s.landBase(spark.range(0, 100).select(col("id").as("k")), "a")
    s.landFold(spark.range(100, 200).select(col("id").as("k")), "a", 0L)
    s.landFold(spark.range(200, 300).select(col("id").as("k")), "a", 1L)
    def filesRead(df: DataFrame): Long = {
      // drive THIS df's own QueryExecution (count() would plan and
      // execute a separate aggregate, leaving these metrics at zero)
      assert(df.collect().length >= 0)
      // post-execution metrics live on the FINAL adaptive plan, not
      // the initial one the structural pins elsewhere assert on
      val executed = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      collectAll(executed) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val all = filesRead(s.open(spark, "a"))
    val bounded = filesRead(s.openAt(spark, "a", 0L))
    assert(all >= 3, s"fixture: expected >=3 files live, read $all")
    assert(bounded < all,
      s"openAt must prune the excluded fold's files ($bounded vs $all)")
    // and the bound costs no join — same steady-state plan as open
    assert(!s.openAt(spark, "a", 0L).queryExecution.executedPlan
      .toString.contains("Join"))
    s.delete(spark)
  }

  test("q_pipeline_retract: the post-delete read scans no text and joins nothing") {
    val p = plan(SparkEntry.queries("q_pipeline_retract")(spark, Sf))
    // the query projects (doc_id, source, n_tokens): text — 99% of
    // the table's bytes at 100 TB — must be pruned at the scan
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty &&
      scans.forall(!_.requiredSchema.fieldNames.contains("text")),
      s"retract read must prune text: ${scans.map(_.requiredSchema)}")
    // post-compaction steady state: the applied tombstones cleared, so
    // the retraction filter is a listing-guarded no-op — the plan must
    // be join-free (retraction costs nothing once purged)
    assert(!p.toString.contains("Join"), s"steady state must be join-free:\n$p")
  }

  test("epochDeal scans the release id-only — an epoch plan never reads text") {
    import graft.pipeline.Release
    val root = java.nio.file.Files
      .createTempDirectory("graft-planpin").toString + "/rel"
    try {
      Release.build(Tables(spark, Sf, "documents"), root, 1,
        Release.Seed, Release.Budget, Release.Shards)
      val p = plan(Release.epochDeal(spark, root, 1, 3))
      val scans = collectAll(p) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      // the re-deal is pure id arithmetic over the mounted version:
      // one scan, reading only doc_id (shard/pos/text stay on disk —
      // "no byte rewritten" starts with "no byte read but the ids")
      assert(scans.length == 1 &&
        scans.head.requiredSchema.fieldNames.toSeq == Seq("doc_id"),
        s"epoch plan must scan only doc_id: ${scans.map(_.requiredSchema)}")
    } finally Release.delete(spark, root)
  }

  test("packEpoch reads NO text for any epoch — spans come from pre-counted tokens") {
    import graft.pipeline.Release
    val root = java.nio.file.Files
      .createTempDirectory("graft-planpin").toString + "/rel"
    try {
      Release.build(Tables(spark, Sf, "documents"), root, 1,
        Release.Seed, Release.Budget, Release.Shards)
      for (epoch <- Seq(0, 2)) {
        val p = plan(Release.packEpoch(spark, root, 1, epoch, 64))
        val scans = collectAll(p) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(scans.nonEmpty)
        // the whole multi-epoch pack plan is (doc_id, shard, pos,
        // n_tokens) arithmetic: the stored text column stays on disk
        // for EVERY epoch — stronger than "text read once"
        scans.foreach { f =>
          val fields = f.requiredSchema.fieldNames.toSet
          assert(fields.subsetOf(Set("doc_id", "shard", "pos", "n_tokens")),
            s"epoch-$epoch pack scan reads $fields")
        }
        // the counts ride the re-deal (shuffleDeal's carry): ONE scan
        // of the release, no doc_id-keyed self-join — at 100 TB the
        // join this replaces is two exchanges and two sorts
        assert(scans.length == 1,
          s"epoch-$epoch pack must scan the release once, got ${scans.length}")
        assert(!p.toString.contains("Join"),
          s"epoch-$epoch pack must not self-join the release:\n$p")
      }
    } finally Release.delete(spark, root)
  }

  test("curated-corpus fold: the dedup probe scans hashes only, never standing docs") {
    import graft.pipeline.CuratedCorpus
    val path = java.nio.file.Files
      .createTempDirectory("graft-planpin").toString + "/cc"
    try {
      val docs = Tables(spark, Sf, "documents")
      CuratedCorpus.init(docs.where(org.apache.spark.sql.functions
        .col("doc_id") < 100), path)
      val p = plan(CuratedCorpus.freshRows(path,
        docs.where(org.apache.spark.sql.functions.col("doc_id") >= 100), 0L))
      val scans = collectAll(p) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      // exactly one scan of the standing table: its hash partitions,
      // reading only the ~32-byte hash column — the batch's text joins
      // against hashes, standing text stays on disk
      val standing = scans.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("graft-planpin")))
      assert(standing.nonEmpty, s"no standing-table scan found:\n$p")
      assert(standing.forall(s =>
        s.relation.location.rootPaths.forall(_.toString.contains("/hashes")) &&
          s.requiredSchema.fieldNames.toSeq == Seq("h")),
        s"fold probe must scan hashes(h) only: ${standing.map(_.requiredSchema)}")
    } finally CuratedCorpus.delete(spark, path)
  }

  test("q_dedup_semantic_trained: at-rest pair join, zero assignment recompute") {
    val p = plan(SparkEntry.queries("q_dedup_semantic_trained")(spark, Sf))
    // the whole point of the at-rest layout: the per-row K-dot argmax
    // (VectorDot chains) ran at index-build time and must NOT appear
    // in the query plan — the in-query q_dedup_semantic pays it, this
    // one reads the materialized cell
    val s = p.toString.toLowerCase
    assert(!s.contains("vectordot"),
      "at-rest semantic dedup must not recompute the cell assignment")
    // the pair step is an equi-join on the stored cell key
    assert(collectAll(p) {
      case j: BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, "cell pair join must be an equi-join")
    // and every corpus scan is the index's own files
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty &&
      scans.forall(_.relation.location.rootPaths.head.toString
        .contains("graft_ivf_")),
      "all scans must read the at-rest index")
  }

  test("no query plans a cartesian product or nested-loop join (brute force excepted)") {
    // The global guard: a refactor that silently degenerates any join
    // (lost equi-condition, non-broadcastable inequality) fails here.
    // q_ann_bruteforce is the INTENTIONAL exact-baseline cross join.
    val exempt = Set("q_ann_bruteforce")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(exempt)
      .flatMap { name =>
        val p = plan(SparkEntry.queries(name)(spark, Sf))
        val bad = collectAll(p) {
          case c: CartesianProductExec => "cartesian"
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
            "nested-loop"
        }
        bad.headOption.map(kind => s"$name: $kind")
      }
    assert(offenders.isEmpty, s"degenerate joins in:\n${offenders.mkString("\n")}")
  }

  test("drift audits prune their scans to the columns they derive from") {
    // vocab drift needs only text; embedding drift only vec_id+embedding
    def readCols(q: String): Set[String] = {
      val p = plan(SparkEntry.queries(q)(spark, Sf))
      collectAll(p) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.requiredSchema.fieldNames.toSeq
      }.flatten.toSet
    }
    val vd = readCols("q_text_vocab_drift")
    assert(!vd.contains("lang") && !vd.contains("source") &&
      !vd.contains("n_chars"), s"vocab drift reads unprojected columns: $vd")
    val ed = readCols("q_ann_embedding_drift")
    assert(!ed.contains("label"), s"embedding drift reads unprojected columns: $ed")
  }

  test("sketch calibrations prune their scans and keep aggregates partial") {
    // The calibration queries touch only their grouped/sketched
    // columns (events: event_type+user_id(+ts for the daily rollup);
    // lineitem: l_returnflag+l_extendedprice), and every sketch
    // aggregate must plan a partial stage so the exchange carries
    // sketch bytes, not rows.
    def p(q: String) = plan(SparkEntry.queries(q)(spark, Sf))
    def readCols(q: String): Set[String] = collectAll(p(q)) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSeq
    }.flatten.toSet
    val au = readCols("q_events_approx_users")
    assert(!au.contains("value") && !au.contains("props") &&
      !au.contains("event_id"), s"approx_users reads unprojected: $au")
    val ro = readCols("q_events_sketch_rollup")
    assert(!ro.contains("value") && !ro.contains("props"),
      s"sketch_rollup reads unprojected: $ro")
    val qt = readCols("q_lineitem_approx_quantiles")
    assert(!qt.contains("l_comment") && !qt.contains("l_quantity"),
      s"approx_quantiles reads unprojected: $qt")
    for (q <- Seq("q_events_approx_users", "q_events_sketch_rollup",
        "q_lineitem_approx_quantiles", "q_events_windowed_quantiles")) {
      val partials = collectAll(p(q)) {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec
            if h.aggregateExpressions.exists(_.mode ==
              org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => h
        case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
            if o.aggregateExpressions.exists(_.mode ==
              org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => o
        case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec
            if s.aggregateExpressions.exists(_.mode ==
              org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => s
      }
      assert(partials.nonEmpty, s"$q plans no partial aggregation stage")
    }
  }

  test("q_dedup_incremental_embed: pruned scans, equi band join, no corpus re-derive") {
    val p = plan(SparkEntry.queries("q_dedup_incremental_embed")(spark, Sf))
    // probe side reads only (vec_id, embedding); the standing index is
    // an InMemoryRelation — the batch must never re-derive it
    val cols = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSeq
    }.flatten.toSet
    assert(!cols.contains("label"), s"embed probe reads unprojected: $cols")
    val inMem = collectAll(p) {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
    }
    assert(inMem.nonEmpty, "probe must hit the persisted standing index")
    // the verify is an equi-join on (band, bucket) — broadcast or SMJ,
    // never a nested loop (global guard) — and the trailing distinct
    // is the only aggregate
    assert(collectAll(p) {
      case j: BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, "band probe must plan an equi-join")
  }

  test("vocab family shares ONE cached text-only token pass; no query re-scans the corpus") {
    // The explode+groupBy corpus pass IS each vocab query's cost, so
    // the family reads through one persisted (token, n_corpus,
    // n_batch) frame (AnalyticsQueries.cachedTokenCounts). Pin both
    // halves: every family member's plan hits the in-memory pass and
    // plans ZERO parquet scans of its own, and the shared pass itself
    // was built from a single text-only pruned scan.
    for (q <- Seq("q_text_vocab", "q_text_vocab_drift",
        "q_text_vocab_drift_capped")) {
      val p = plan(SparkEntry.queries(q)(spark, Sf))
      val scans = collectAll(p) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.isEmpty,
        s"$q must read the shared token pass, not re-scan: ${scans.length}")
      val inMem = collectAll(p) {
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
      }
      assert(inMem.nonEmpty, s"$q must hit the cached token pass")
      // the cached pass itself: one pruned scan reading only text
      // (the cached plan nests under AdaptiveSparkPlanExec, whose
      // children is Nil — unwrap it and any query stages by hand)
      def deepScans(sp: SparkPlan): Seq[
          org.apache.spark.sql.execution.FileSourceScanExec] = {
        val kids = sp match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(st.plan)
          case o => o.children
        }
        (sp match {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
          case _ => Seq.empty
        }) ++ kids.flatMap(deepScans)
      }
      val cachedScans = inMem.flatMap(m => deepScans(m.relation.cachedPlan))
      assert(cachedScans.length == 1 &&
        cachedScans.head.requiredSchema.fieldNames.toSet == Set("text"),
        s"the shared pass must be one text-only scan: " +
          cachedScans.map(_.requiredSchema.fieldNames.toSeq))
    }
  }

  test("profile and dq gate plan exactly one scan of their table") {
    // The unpivot is an explode over the single aggregate row; a
    // union of per-column selects would re-scan the table once per
    // output row (6x/5x) — pin the single-scan shape.
    for (q <- Seq("q_profile_events", "q_dq_orders", "q_dq_documents")) {
      val scans = collectAll(plan(SparkEntry.queries(q)(spark, Sf))) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.length == 1, s"$q plans ${scans.length} scans")
    }
  }

  test("documents scan prunes columns: text-stats reads only what it projects") {
    val p = plan(SparkEntry.queries("q_text_stats")(spark, Sf))
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.requiredSchema
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        org.apache.spark.sql.types.StructType(s.output.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType)))
    }
    assert(scans.nonEmpty)
    val readCols = scans.flatMap(_.fieldNames).toSet
    // q_text_stats projects doc_id + text derivations only — lang/
    // source/n_chars must be pruned from the parquet read
    assert(!readCols.contains("lang") && !readCols.contains("source") &&
      !readCols.contains("n_chars"),
      s"documents scan reads unprojected columns: $readCols")
  }

  test("q_dedup_embed_atrest_point: a micro-batch probe plans a LOCAL relation — no distributed join") {
    // the point probe runs its two single-stage collects at BUILD time
    // and returns a local relation: the per-micro-batch latency story
    // as a plan shape (the job count is pinned in EmbedIndexSpec)
    val p = plan(SparkEntry.queries("q_dedup_embed_atrest_point")(spark, Sf))
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"point probe must not plan a join:\n$p")
    assert(collectAll(p) { case e: ShuffleExchangeLike => e }.length <= 1,
      s"point probe should shuffle at most for the presentation sort:\n$p")
  }

  test("embed probeAtRest: ONE bkey join — bucket rows carry the verify payload, no vector join-back") {
    import org.apache.spark.sql.functions.col
    import graft.ann.EmbedIndex
    val emb = Tables(spark, Sf, "embeddings")
    val root = java.nio.file.Files
      .createTempDirectory("graft-planq-emb").toString
    val path = s"$root/emb"
    try {
      EmbedIndex.write(emb.filter(col("vec_id") % 10 < 8),
        "vec_id", "embedding", path, EmbedIndex.Params(2, 6, 64))
      val df = EmbedIndex.probeAtRest(emb.filter(col("vec_id") % 10 >= 8),
        path, "vec_id", "embedding", 0.9)
      val joins = collectAll(plan(df)) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      // before the posting-list layout this planned TWO joins (bucket
      // candidates, then candidates back onto the vecs table); the fat
      // bucket rows collapse the verify into the candidate join itself
      assert(joins.length == 1,
        s"probeAtRest must plan exactly the bkey join, got ${joins.length}:\n" +
          plan(df))
    } finally EmbedIndex.delete(spark, root)
  }
}
