package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.Release

/** The versioned training-data release: build is replay-idempotent
  * (bit-identical manifest on rebuild), the manifest is the commit
  * marker (partial builds are invisible), open works from a second
  * session, and prune applies keep-N retention without touching the
  * retained versions. */
class ReleaseSpec extends SparkSpec {

  private val Src = "/root/testdata/sf0.001"
  private def docs = Tables(spark, Src, "documents")

  test("maintainFromCorpus cuts versions on the fold-watermark cadence") {
    import graft.pipeline.CuratedCorpus
    val cc = Files.createTempDirectory("graft-corpus").toString + "/cc"
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      val cuts = (0 to 4).map(i => mx / 2 + (mx - mx / 2) * i / 4)
      CuratedCorpus.init(docs.where(col("doc_id") < mx / 2), cc)
      def maintain() = Release.maintainFromCorpus(spark, cc, root,
        Release.Seed, Release.Budget, Release.Shards,
        everyBatches = 2, keep = 2)
      // an empty root is always due: v1 establishes the baseline
      assert(maintain().contains(1))
      // four folds at cadence 2: versions cut after folds 1 and 3 only
      val results = cuts.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
        CuratedCorpus.foldBatch(cc,
          docs.where(col("doc_id") >= lo && col("doc_id") < hi), i.toLong)
        maintain()
      }.toSeq
      assert(results == Seq(None, Some(2), None, Some(3)),
        s"cadence fired wrong: $results")
      assert(Release.latestVersion(spark, root).contains(3))
      assert(Release.lineageJson(spark, root, 3)
        .exists(_.contains("\"corpus_batch\":3")))
      // keep-2 retention ran with each cut
      val dirs = new java.io.File(root).listFiles()
        .map(_.getName).filter(_.startsWith("v")).toSet
      assert(dirs == Set("v2", "v3"))
      // the watermark survives compaction, so the cadence stays
      // monotone instead of firing spuriously (or never again)
      CuratedCorpus.compact(spark, cc)
      assert(CuratedCorpus.batchWatermark(spark, cc) == 3L)
      assert(maintain().isEmpty)
      // a cadence waking up on a corpus whose compact crashed
      // mid-swap heals it instead of throwing until a fold runs
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      fs.mkdirs(p(s"$cc/.compact"))
      fs.rename(p(s"$cc/docs"), p(s"$cc/.compact/docs"))
      assert(maintain().isEmpty) // recovered, still not due
      assert(CuratedCorpus.batchWatermark(spark, cc) == 3L)
    } finally {
      CuratedCorpus.delete(spark, cc)
      Release.delete(spark, root)
    }
  }

  test("buildFromCorpus atBatch: an as-of cut equals the cut from a corpus frozen there") {
    import graft.pipeline.CuratedCorpus
    val cc = Files.createTempDirectory("graft-corpus").toString + "/cc"
    val ccFrozen = Files.createTempDirectory("graft-corpus").toString + "/cc"
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    val rootF = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      val (t1, t2) = (mx * 8 / 10, mx * 9 / 10)
      CuratedCorpus.init(docs.where(col("doc_id") < t1), cc)
      CuratedCorpus.foldBatch(cc,
        docs.where(col("doc_id") >= t1 && col("doc_id") < t2), 0L)
      CuratedCorpus.foldBatch(cc, docs.where(col("doc_id") >= t2), 1L)
      // the as-of cut at batch 0 (the lockstep-view consumer: a cut
      // pinned to the loop's shared watermark, immune to whatever
      // batch 1 was doing mid-flight)
      Release.buildFromCorpus(spark, cc, root, 1, Release.Seed,
        Release.Budget, Release.Shards, atBatch = Some(0L))
      // ≡ a corpus that simply never folded batch 1 (bit-identical
      // manifest — the as-of bound is a partition filter, not a
      // different pipeline)
      CuratedCorpus.init(docs.where(col("doc_id") < t1), ccFrozen)
      CuratedCorpus.foldBatch(ccFrozen,
        docs.where(col("doc_id") >= t1 && col("doc_id") < t2), 0L)
      Release.buildFromCorpus(spark, ccFrozen, rootF, 1, Release.Seed,
        Release.Budget, Release.Shards)
      assert(Release.manifestJson(spark, root) ==
        Release.manifestJson(spark, rootF),
        "the as-of cut must be bit-identical to the frozen-corpus cut")
      // the lineage records the bound actually cut — the cadence's
      // advance math sees the pinned clock, so an unmoved bound never
      // re-cuts, and the live clock resumes when the pin is dropped
      assert(Release.lineageJson(spark, root, 1)
        .exists(_.contains("\"corpus_batch\":0")))
      assert(Release.maintainFromCorpus(spark, cc, root, Release.Seed,
        Release.Budget, Release.Shards, everyBatches = 1,
        atBatch = Some(0L)).isEmpty,
        "a pinned, unmoved watermark must not re-cut")
      assert(Release.maintainFromCorpus(spark, cc, root, Release.Seed,
        Release.Budget, Release.Shards, everyBatches = 1).contains(2),
        "dropping the pin resumes the live clock")
      // a bound past the live watermark clamps (records what was cut)
      Release.buildFromCorpus(spark, cc, root, 3, Release.Seed,
        Release.Budget, Release.Shards, atBatch = Some(99L))
      assert(Release.lineageJson(spark, root, 3)
        .exists(_.contains("\"corpus_batch\":1")))
    } finally {
      CuratedCorpus.delete(spark, cc)
      CuratedCorpus.delete(spark, ccFrozen)
      Release.delete(spark, root)
      Release.delete(spark, rootF)
    }
  }

  test("null-source docs reach the manifest as JSON null, never a crash") {
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      // a null source is a budget group like any other: the build must
      // commit (the per-source audit sort used to NPE), render the
      // group as JSON null — distinct from a source NAMED "null" —
      // and land its rows in the shards
      val nulled = docs.withColumn("source",
        when(col("doc_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("source")))
      Release.build(nulled, root, 1, Release.Seed, Release.Budget,
        Release.Shards)
      val m = Release.manifestJson(spark, root)
      assert(m.contains("\"source\":null") && !m.contains("\"source\":\"null\""))
      assert(Release.openVersion(spark, root, 1)
        .where(col("source").isNull).count() > 0)
    } finally Release.delete(spark, root)
  }

  test("a build whose kept set is empty commits a visible, openable empty version") {
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      // curation empties this corpus (zero rows in → zero kept); the
      // build must COMMIT the empty version, not abort on schema
      // inference over a data-less shards dir — an upstream outage
      // that empties a snapshot should be visible as rows:0, not as a
      // wedged partial build
      Release.build(docs.where(lit(false)), root, 1, Release.Seed,
        Release.Budget, Release.Shards)
      assert(Release.latestVersion(spark, root).contains(1))
      assert(Release.manifestJson(spark, root).contains("\"rows\":0"))
      assert(Release.openVersion(spark, root, 1).count() == 0)
    } finally Release.delete(spark, root)
  }

  test("epochDeal: epoch 0 IS the stored layout; epoch e is a fresh permutation") {
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      Release.build(docs, root, 1, Release.Seed, Release.Budget,
        Release.Shards)
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("shard").cast("long"),
            col("pos").cast("long")).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val stored = asMap(Release.openVersion(spark, root, 1))
      // epoch 0 recomputes to exactly the files' layout — the reader
      // can mount the files directly and the plan agrees
      val e0 = asMap(Release.epochDeal(spark, root, 1, 0))
      assert(e0 == stored && stored.nonEmpty)
      // a later epoch is a deterministic, genuinely re-dealt
      // permutation of the SAME id set: shard membership moves for
      // most ids (the nonlinear mix, not an affine nudge)
      val e1 = asMap(Release.epochDeal(spark, root, 1, 1))
      assert(e1.keySet == stored.keySet)
      assert(e1 == asMap(Release.epochDeal(spark, root, 1, 1)))
      val moved = stored.count { case (id, (s, _)) => e1(id)._1 != s }
      assert(moved * 2 > stored.size,
        s"epoch 1 moved only $moved/${stored.size} ids across shards")
      // the mounted epoch view: same rows, epoch-e placement
      val viewed = asMap(Release.openEpoch(spark, root, 1, 1))
      assert(viewed == e1)
      assert(Release.openEpoch(spark, root, 1, 1)
        .columns.toSet == Release.openVersion(spark, root, 1).columns.toSet)
      // ONE schema across epochs (shard stays INT on the deal path):
      // a reader unioning or strictly typing epoch views must not
      // break between epoch 0 (the files) and epoch 1 (the re-deal).
      // Names and types must match exactly; nullability may tighten
      // (the deal's pos is provably non-null) — union widens that.
      def shape(e: Int) = Release.openEpoch(spark, root, 1, e)
        .schema.map(f => (f.name, f.dataType))
      assert(shape(1) == shape(0))
      assert(asMap(Release.openEpoch(spark, root, 1, 0)) == stored)
      // version pinning: a v2 build does not change what v1 readers see
      Release.build(docs.where(col("doc_id") % 2 === 0), root, 2,
        Release.Seed, Release.Budget, Release.Shards)
      assert(asMap(Release.openVersion(spark, root, 1)) == stored)
      assert(Release.latestVersion(spark, root).contains(2))
      intercept[IllegalArgumentException] {
        Release.openVersion(spark, root, 9)
      }
    } finally Release.delete(spark, root)
  }

  test("packEpoch: epoch 0 packs the stored files; every epoch packs full sequences") {
    import graft.text.TextAnalysis
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    val L = 64
    try {
      Release.build(docs, root, 1, Release.Seed, Release.Budget,
        Release.Shards)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("shard").cast("long"), col("seq"), col("doc_id"),
            col("seq_offset"), col("n_tokens_in_seq"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
      // epoch 0: the pack plan over the mounted release IS the pack
      // of the stored layout — a reader may pack the files directly
      val p0 = rows(Release.packEpoch(spark, root, 1, 0, L))
      val stored = Release.openVersion(spark, root, 1)
        .select("doc_id", "shard", "pos", "n_tokens")
      assert(p0 == rows(TextAnalysis.packPlaced(stored,
        "doc_id", "shard", "pos", "n_tokens", L)) && p0.nonEmpty)
      // a later epoch: deterministic, and a genuine re-pack — the
      // sequence spans cover each kept document's tokens exactly once
      val p1 = rows(Release.packEpoch(spark, root, 1, 1, L))
      assert(p1 == rows(Release.packEpoch(spark, root, 1, 1, L)))
      assert(p1 != p0, "epoch 1 must re-deal the pack")
      val kept = Release.openVersion(spark, root, 1)
        .where(col("n_tokens") > 0)
        .select("doc_id", "n_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (p <- Seq(p0, p1)) {
        val perDoc = p.groupBy(_._3).map { case (id, spans) =>
          id -> spans.toSeq.map(_._5).sum
        }
        assert(perDoc == kept, "spans must cover each doc's tokens once")
        // every sequence except each shard's last is exactly full
        val perSeq = p.groupBy(s => (s._1, s._2))
          .map { case (k, spans) => k -> spans.toSeq.map(_._5).sum }
        val lastSeq = p.groupBy(_._1).map { case (sh, spans) =>
          sh -> spans.map(_._2).max
        }
        perSeq.foreach { case ((sh, seq), tot) =>
          if (seq < lastSeq(sh)) assert(tot == L.toLong,
            s"shard $sh seq $seq holds $tot tokens, want $L")
          else assert(tot <= L.toLong && tot > 0)
        }
      }
    } finally Release.delete(spark, root)
  }

  test("build → open: committed layout matches the in-query candidate set") {
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      Release.build(docs, root, version = 1, Release.Seed, Release.Budget,
        Release.Shards)
      assert(Release.latestVersion(spark, root).contains(1))
      val opened = Release.open(spark, root)
      assert(opened.columns.toSet ==
        Set("doc_id", "source", "n_tokens", "pos", "text", "shard"))
      // the released rows ARE the candidate set (ids and per-source
      // token totals), laid out — build adds layout, never changes
      // membership
      val cand = Release.candidates(docs, Release.Seed, Release.Budget)
      val wantIds = cand.select("doc_id").collect().map(_.getLong(0)).toSet
      val gotIds = opened.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(gotIds == wantIds && gotIds.nonEmpty)
      // and the audit query agrees with what was actually written
      val summary = Release.summary(docs, Release.Seed, Release.Budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val written = opened.groupBy("source")
        .agg(count(lit(1)).as("d"), sum("n_tokens").as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(written == summary)
      // every source respects the budget in the shipped artifact
      assert(written.forall(_._3 <= Release.Budget))
    } finally Release.delete(spark, root)
  }

  test("rebuild of the same version is bit-identical; a new seed is not") {
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      Release.build(docs, root, 1, Release.Seed, Release.Budget, Release.Shards)
      val first = Release.manifestJson(spark, root)
      Release.build(docs, root, 1, Release.Seed, Release.Budget, Release.Shards)
      assert(Release.manifestJson(spark, root) == first,
        "replaying a build must reproduce the manifest byte-for-byte")
      Release.build(docs, root, 2, Release.Seed + 1, Release.Budget,
        Release.Shards)
      assert(Release.latestVersion(spark, root).contains(2))
      assert(Release.manifestJson(spark, root) != first,
        "a new seed must re-deal the kept set")
    } finally Release.delete(spark, root)
  }

  test("manifest is the commit marker; prune keeps the newest N") {
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      Release.build(docs, root, 1, Release.Seed, Release.Budget, Release.Shards)
      Release.build(docs, root, 2, Release.Seed, Release.Budget, Release.Shards)
      // a build that died before its manifest: invisible to readers
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/v3/shards"))
      assert(Release.latestVersion(spark, root).contains(2))
      Release.prune(spark, root, keep = 1)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/v1")),
        "pruned version must be deleted")
      assert(Release.latestVersion(spark, root).contains(2))
      assert(Release.open(spark, root).count() > 0)
    } finally Release.delete(spark, root)
  }

  test("a second session opens the release a prior session built") {
    val root = Files.createTempDirectory("graft-release").toString + "/rel"
    try {
      Release.build(docs, root, 1, Release.Seed, Release.Budget, Release.Shards)
      val session2 = spark.newSession()
      val opened = Release.open(session2, root)
      assert(opened.count() ==
        Release.candidates(docs, Release.Seed, Release.Budget).count())
      assert(Release.manifestJson(session2, root).contains("\"version\":1"))
    } finally Release.delete(spark, root)
  }
}
