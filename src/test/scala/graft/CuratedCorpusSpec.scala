package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{CuratedCorpus, PipelineQueries, Release}

/** The standing curated-corpus table: init + folds must hold exactly
  * what curating the union corpus holds (the equivalence contract the
  * incremental release rests on), folds must be replay-idempotent and
  * must drop content the table already holds, and a version built
  * from the standing table must be bit-identical to a full build. */
class CuratedCorpusSpec extends SparkSpec {

  private val Src = "/root/testdata/sf0.001"
  private def docs = Tables(spark, Src, "documents")

  /** 80/10/10 doc-id slices — batches carry strictly larger ids than
    * everything before them (the monotone-id fold contract). */
  private def slices = {
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val (t1, t2) = (mx * 8 / 10, mx * 9 / 10)
    (docs.where(col("doc_id") < t1),
      docs.where(col("doc_id") >= t1 && col("doc_id") < t2),
      docs.where(col("doc_id") >= t2))
  }

  private def tableRows(path: String): Set[(Long, String, Long)] =
    CuratedCorpus.open(spark, path)
      .select("doc_id", "source", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("init + folds ≡ curating the union corpus") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val want = PipelineQueries.curatedTrainDocs(docs)
        .select(col("doc_id"), col("source"),
          coalesce(graft.text.TextAnalysis.tokenCount(col("text"))
            .cast("long"), lit(0L)).as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val got = tableRows(path)
      assert(got == want && got.nonEmpty)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a replayed fold re-lands its own rows, never duplicates or drops them") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val before = tableRows(path)
      CuratedCorpus.foldBatch(path, b1, 0L) // at-least-once redelivery
      assert(tableRows(path) == before)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("content the table already holds never re-lands under a new id") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, _, _) = slices
      CuratedCorpus.init(base, path)
      val before = tableRows(path)
      // re-submit documents the table is KNOWN to hold (they survived
      // curation) under fresh, larger ids — the hash probe must drop
      // every one of them
      val standing = CuratedCorpus.open(spark, path).limit(3)
        .select(col("doc_id"), col("text"))
      val resubmit = docs.join(standing.select("doc_id"), Seq("doc_id"))
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      CuratedCorpus.foldBatch(path, resubmit, 5L)
      assert(tableRows(path) == before,
        "already-held content must not re-land under a new id")
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a release cut from the standing table ≡ a full build (bit-identical)") {
    val cc = Files.createTempDirectory("graft-corpus").toString + "/cc"
    val r1 = Files.createTempDirectory("graft-release").toString + "/full"
    val r2 = Files.createTempDirectory("graft-release").toString + "/incr"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, cc)
      CuratedCorpus.foldBatch(cc, b1, 0L)
      CuratedCorpus.foldBatch(cc, b2, 1L)
      Release.build(docs, r1, 1, Release.Seed, Release.Budget, Release.Shards)
      Release.buildFromCorpus(spark, cc, r2, 1, Release.Seed, Release.Budget,
        Release.Shards)
      assert(Release.manifestJson(spark, r2) == Release.manifestJson(spark, r1),
        "incremental and full builds must produce identical releases")
      // lineage: the corpus-cut version records its source table and
      // fold watermark in a sidecar; a full build has none (and the
      // manifests above being identical proves the sidecar never
      // leaks into the commit marker)
      val lin = Release.lineageJson(spark, r2, 1)
      assert(lin.exists(j => j.contains("\"corpus_batch\":1") &&
        j.contains(cc)), s"lineage sidecar wrong: $lin")
      assert(Release.lineageJson(spark, r1, 1).isEmpty)
      // a full REBUILD of the corpus-cut version sheds the stale
      // provenance with the old commit marker
      Release.build(docs, r2, 1, Release.Seed, Release.Budget,
        Release.Shards)
      assert(Release.lineageJson(spark, r2, 1).isEmpty)
    } finally {
      CuratedCorpus.delete(spark, cc)
      Release.delete(spark, r1)
      Release.delete(spark, r2)
    }
  }

  test("compaction merges folds into the base without changing one visible row") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      val before = tableRows(path)
      def batchDirs(table: String): Set[String] = {
        val d = new java.io.File(s"$path/$table")
        d.listFiles().filter(_.isDirectory).map(_.getName).toSet
      }
      assert(batchDirs("docs") == Set("__batch=-1", "__batch=0"))
      CuratedCorpus.compact(spark, path)
      // one visible-row-identical base partition, fold partitions gone
      assert(tableRows(path) == before)
      assert(batchDirs("docs") == Set("__batch=-1") &&
        batchDirs("hashes") == Set("__batch=-1"))
      // replaying an ALREADY-COMPACTED batch dedups to zero against
      // the base hash partition — idempotence survives compaction
      CuratedCorpus.foldBatch(path, b1, 0L)
      assert(tableRows(path) == before)
      // and new folds keep composing afterwards
      CuratedCorpus.foldBatch(path, b2, 1L)
      val want = PipelineQueries.curatedTrainDocs(docs)
        .select(col("doc_id"), col("source"),
          coalesce(graft.text.TextAnalysis.tokenCount(col("text"))
            .cast("long"), lit(0L)).as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(tableRows(path) == want)
      // a second compact is a no-op on the visible table
      CuratedCorpus.compact(spark, path)
      assert(tableRows(path) == want)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a canonical copy of an EVAL-split keeper never re-lands (hashes are pre-split)") {
    import graft.text.TextAnalysis.charFingerprint
    import spark.implicits._
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, _, _) = slices
      CuratedCorpus.init(base, path)
      // keepers the train split withheld from docs — their content
      // identity must still be standing
      val evalKeepers = PipelineQueries.curatedKeptDocs(base)
        .where(charFingerprint(col("text")) % 100 >= 80)
        .select("text").limit(5).collect().map(_.getString(0)).toSeq
      assert(evalKeepers.nonEmpty, "fixture needs an eval-split keeper")
      // canonical-EQUAL but raw-different variants (same exactHash,
      // different charFingerprint) under fresh monotone ids — at least
      // one must land in the TRAIN bucket or the case proves nothing
      val variants = evalKeepers
        .flatMap(t => Seq(t.toUpperCase, t + "!", "  " + t))
        .zipWithIndex.map { case (t, i) => (1000000L + i, t) }
      val vdf = variants.toDF("doc_id", "text")
        .withColumn("source", lit("s0")).withColumn("lang", lit("de"))
        .select("doc_id", "source", "lang", "text")
      assert(vdf.where(charFingerprint(col("text")) % 100 < 80).count() > 0,
        "no canonical-equal variant fell in the train bucket")
      CuratedCorpus.foldBatch(path, vdf, 9L)
      // the union pipeline drops every variant at stage 2 (the eval
      // keeper holds the min id per hash) — the standing table must
      // agree exactly
      val want = PipelineQueries
        .curatedTrainDocs(base.select("doc_id", "source", "lang", "text")
          .unionByName(vdf))
        .select(col("doc_id"), col("source"),
          coalesce(graft.text.TextAnalysis.tokenCount(col("text"))
            .cast("long"), lit(0L)).as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(tableRows(path) == want && want.nonEmpty)
      assert(!tableRows(path).exists(_._1 >= 1000000L),
        "a canonical copy of an eval-split keeper re-landed")
    } finally CuratedCorpus.delete(spark, path)
  }

  test("maintain bounds the fold-partition count across many batches") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      // init on the first half, then six monotone-id slices folded in
      // with the cadence dial at 2: the table must never hold more
      // than 2 fold partitions, and compaction must never change what
      // the union curation would hold
      CuratedCorpus.init(docs.where(col("doc_id") < mx / 2), path)
      val cuts = (0 to 6).map(i => mx / 2 + (mx - mx / 2) * i / 6)
      var compactions = 0
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        CuratedCorpus.foldBatch(path,
          docs.where(col("doc_id") >= lo && col("doc_id") < hi), i.toLong)
        if (CuratedCorpus.maintain(spark, path, maxFolds = 2)) compactions += 1
        assert(CuratedCorpus.foldCount(spark, path) <= 2)
      }
      assert(compactions >= 2, s"cadence never fired: $compactions")
      assert(CuratedCorpus.foldCount(spark, path) == 0)
      val want = PipelineQueries
        .curatedTrainDocs(docs.where(col("doc_id") < cuts.last))
        .select(col("doc_id"), col("source"),
          coalesce(graft.text.TextAnalysis.tokenCount(col("text"))
            .cast("long"), lit(0L)).as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(tableRows(path) == want && want.nonEmpty)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a fold that crashed before its hashes landed survives compaction; replay heals") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L) // complete fold
      CuratedCorpus.foldBatch(path, b2, 7L)
      // simulate the crash window between the fold's two writes: the
      // docs partition landed, the hashes partition did not
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      fs.delete(p(s"$path/hashes/__batch=7"), true)
      // a leftover retired dir from an even earlier crash must not
      // divert the swap's renames into nesting
      fs.mkdirs(p(s"$path/.old_docs/junk"))
      CuratedCorpus.compact(spark, path)
      def batchDirs(table: String): Set[String] =
        new java.io.File(s"$path/$table").listFiles()
          .filter(_.isDirectory).map(_.getName).toSet
      // batch 0 folded; batch 7's docs stayed their own REPLAYABLE
      // partition (baking them would double them on replay)
      assert(batchDirs("docs") == Set("__batch=-1", "__batch=7"))
      assert(batchDirs("hashes") == Set("__batch=-1"))
      assert(!new java.io.File(s"$path/.old_docs").exists())
      // the openAt FLOOR rides the highest batch this compact actually
      // COLLAPSED (0 — the hash-landed fold), not the full watermark
      // (7): the torn batch's docs partition still stands, so bounds
      // below it stay exactly servable — a lockstep view pinned by a
      // slower sibling reads through this very window
      assert(graft.sources.StandingStore
        .readWatermarkMarker(spark, path) == ((7L, 0L)),
        "watermark rides the docs listing; the floor rides the collapse")
      val b2Ids = b2.select("doc_id").collect().map(_.getLong(0)).toSet
      val ids0 = CuratedCorpus.openAt(spark, path, 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids0.nonEmpty && ids0.intersect(b2Ids).isEmpty,
        "openAt(0) must serve, excluding the torn batch's docs")
      // the stream replays the crashed batch: it overwrites its own
      // docs partition and lands the missing hashes — exactly once
      CuratedCorpus.foldBatch(path, b2, 7L)
      val want = PipelineQueries.curatedTrainDocs(docs)
        .select(col("doc_id"), col("source"),
          coalesce(graft.text.TextAnalysis.tokenCount(col("text"))
            .cast("long"), lit(0L)).as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(tableRows(path) == want)
      assert(CuratedCorpus.open(spark, path).count() == want.size.toLong,
        "replay after a half-landed fold duplicated rows")
    } finally CuratedCorpus.delete(spark, path)
  }

  test("retract: reads filter at once, compaction purges, suppression holds") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val all = tableRows(path)
      // one standing doc from the base snapshot, one from fold 1 —
      // retraction must reach both layouts
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      val open0 = CuratedCorpus.open(spark, path)
      val baseId = open0.where(col("doc_id") < mx * 8 / 10)
        .agg(min("doc_id")).head().getLong(0)
      val foldId = open0.where(col("doc_id") >= mx * 9 / 10)
        .agg(min("doc_id")).head().getLong(0)
      import spark.implicits._
      CuratedCorpus.retract(spark, path,
        Seq(baseId, foldId).toDF("doc_id"), "doc_id", 1L)
      val want = all.filterNot(r => r._1 == baseId || r._1 == foldId)
      assert(tableRows(path) == want, "reads must filter immediately")
      // logical until compaction: the doc rows still stand on disk
      def rawDead = spark.read.parquet(s"$path/docs")
        .where(col("doc_id").isin(baseId, foldId)).count()
      assert(rawDead == 2L, "retract must not rewrite data")
      CuratedCorpus.compact(spark, path)
      assert(rawDead == 0L, "compaction must purge physically")
      assert(!new java.io.File(s"$path/tombs").exists(),
        "applied tombstones must clear")
      assert(tableRows(path) == want)
      // SUPPRESSION: the retracted documents' CONTENT resubmitted
      // under fresh ids still dedups to zero (hashes were retained)
      val resubmit = docs.where(col("doc_id").isin(baseId, foldId))
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      CuratedCorpus.foldBatch(path, resubmit, 2L)
      assert(tableRows(path) == want,
        "hash retention must keep retracted content suppressed")
      // NON-RESURRECTION: the origin batch replayed after purge+clear
      // dedups to zero against the retained hashes
      CuratedCorpus.foldBatch(path, b2, 1L)
      assert(tableRows(path) == want,
        "an origin-batch replay must not resurrect a retracted doc")
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a tombstone outlives compaction while its target's fold is half-landed") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 7L)
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      val tgt = CuratedCorpus.open(spark, path)
        .where(col("doc_id") >= mx * 9 / 10)
        .agg(min("doc_id")).head().getLong(0)
      // crash window: batch 7's docs landed, its hashes did not — the
      // batch stays replayable, so its tombstone must NOT clear (a
      // cleared tombstone plus a replay would resurrect the doc)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/hashes/__batch=7"), true)
      import spark.implicits._
      CuratedCorpus.retract(spark, path, Seq(tgt).toDF("doc_id"),
        "doc_id", 7L)
      CuratedCorpus.compact(spark, path)
      assert(new java.io.File(s"$path/tombs").exists(),
        "tombstone must survive while its target's fold is replayable")
      assert(CuratedCorpus.open(spark, path)
        .where(col("doc_id") === tgt).count() == 0L)
      // the replay heals the fold and re-lands the doc row — the
      // standing tombstone keeps filtering it
      CuratedCorpus.foldBatch(path, b2, 7L)
      assert(CuratedCorpus.open(spark, path)
        .where(col("doc_id") === tgt).count() == 0L)
      // with every fold whole, the next compact purges and clears
      CuratedCorpus.compact(spark, path)
      assert(!new java.io.File(s"$path/tombs").exists())
      assert(spark.read.parquet(s"$path/docs")
        .where(col("doc_id") === tgt).count() == 0L)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a crashed compact swap is finished by the recovery preamble") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, _) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      val before = tableRows(path)
      // simulate the one non-live crash window: staging fully written
      // (here: the live dir itself, which carries _SUCCESS), live dir
      // gone mid-swap
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      fs.mkdirs(p(s"$path/.compact"))
      fs.rename(p(s"$path/docs"), p(s"$path/.compact/docs"))
      intercept[Exception] { tableRows(path) } // the table IS down
      CuratedCorpus.recoverSwap(spark, path)
      assert(tableRows(path) == before)
      // compact itself runs the preamble, so a re-run also heals
      fs.rename(p(s"$path/hashes"), p(s"$path/.compact/hashes"))
      CuratedCorpus.compact(spark, path)
      assert(tableRows(path) == before)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("compact crash BETWEEN the two swaps: replay lands no duplicates, recovery completes the swap") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val before = tableRows(path)
      // run compact up to the swap (under the lease, like the real
      // verb), then crash after the FIRST table's swap (hashes — the
      // order the r10 verdict flagged): the live table now holds
      // compacted hashes beside uncompacted docs
      graft.sources.Lease.withLease(spark, path) {
        CuratedCorpus.stageCompact(spark, path)
        graft.sources.DirSwap.commitSwaps(spark, path,
          Seq("hashes", "docs"), upTo = 1)
      }
      def batchDirs(table: String): Set[String] =
        new java.io.File(s"$path/$table").listFiles()
          .filter(_.isDirectory).filterNot(_.getName.startsWith("."))
          .map(_.getName).toSet
      assert(batchDirs("hashes") == Set("__batch=-1"), "mixed state fixture")
      assert(batchDirs("docs") == Set("__batch=-1", "__batch=0", "__batch=1"))
      // the ORDER argument, before any recovery runs: a replayed
      // already-folded batch finds its content in the BASE hash
      // partition (the probe never excludes base) and dedups to zero —
      // with the reverse swap order this count is b2's full size and
      // the replay would double the batch
      assert(CuratedCorpus.freshRows(path, b2, 1L).count() == 0L,
        "replay probe must find the batch's content in the base hashes")
      // the stream replays the batch: the fold's recovery preamble
      // rolls the committed swap forward (docs compact too), then the
      // empty overwrite touches nothing — zero duplicates
      CuratedCorpus.foldBatch(path, b2, 1L)
      assert(tableRows(path) == before)
      assert(CuratedCorpus.open(spark, path).count() == before.size.toLong,
        "replay into the mixed state duplicated rows")
      assert(batchDirs("docs") == Set("__batch=-1"),
        "recovery must finish the committed docs swap")
      assert(CuratedCorpus.foldCount(spark, path) == 0)
      // a re-run compact converges on the identical visible table
      CuratedCorpus.compact(spark, path)
      assert(tableRows(path) == before)
      // and the table keeps folding afterwards
      CuratedCorpus.foldBatch(path, b2, 1L)
      assert(tableRows(path) == before)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a fold into a half-swapped table heals it first — no silent loss") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      // crash window: docs staged fully, live dir already renamed
      // away. The NEXT WRITE used to recreate the live dir with only
      // its own rows, after which recovery would prune the staged
      // full copy — the fold must recover before writing instead.
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      fs.mkdirs(p(s"$path/.compact"))
      fs.rename(p(s"$path/docs"), p(s"$path/.compact/docs"))
      CuratedCorpus.foldBatch(path, b2, 1L)
      val want = PipelineQueries.curatedTrainDocs(docs)
        .select(col("doc_id"), col("source"),
          coalesce(graft.text.TextAnalysis.tokenCount(col("text"))
            .cast("long"), lit(0L)).as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(tableRows(path) == want && want.nonEmpty,
        "fold into a half-swapped table lost standing rows")
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a second session opens the standing table a prior session built") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val before = tableRows(path)
      val session2 = spark.newSession()
      val got = CuratedCorpus.open(session2, path)
        .select("doc_id", "source", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == before && got.nonEmpty)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("stageCompact without the lease throws before touching the root") {
    // the guard precedes all work: a never-built path proves nothing
    // ran ahead of the require (VERDICT r18 #2 — fire the negative)
    val path = java.nio.file.Files
      .createTempDirectory("graft-corpus-lease").toString + "/cc"
    val e = intercept[IllegalArgumentException] {
      CuratedCorpus.stageCompact(spark, path)
    }
    assert(e.getMessage.contains(s"requires the $path lease"),
      s"the guard must name the root and the remedy: ${e.getMessage}")
  }
}
