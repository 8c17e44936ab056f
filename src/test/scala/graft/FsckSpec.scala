package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.ann.EmbedIndex
import graft.dedup.{DedupQueries, SignatureIndex, ClusterIndex}
import graft.pipeline.{CuratedCorpus, Fsck, IngestStream}

/** The at-rest fsck verb: a healthy corpus+indexes trio reports
  * clean, and every injected inconsistency class surfaces as its
  * named finding — reported, never healed (the evidence an operator
  * diagnoses must survive the diagnosis). */
class FsckSpec extends SparkSpec {

  test("fsck: healthy roots report clean; each injected inconsistency is named") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(7)), j =>
          (pmod(hash(col("doc_id"), j), lit(1000)).cast("double") / 500.0
            - 1.0).cast("float")))
    val T = DedupQueries.IncrementalFuzzyThreshold
    val root = java.nio.file.Files
      .createTempDirectory("graft-fsck").toString
    val (cc, sigs, clusters, emb) =
      (s"$root/cc", s"$root/sigs", s"$root/clusters", s"$root/emb")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def kinds(): Seq[(String, String)] =
      Fsck.check(spark, cc, sigs, clusters, Some(emb))
        .map(f => (f.kind, f.root))
    try {
      CuratedCorpus.init(docs.drop("embedding"), cc)
      IngestStream.bootstrapIndexes(spark, cc, sigs, clusters, T)
      EmbedIndex.write(
        CuratedCorpus.open(spark, cc).select("doc_id")
          .join(docs.select("doc_id", "embedding"), "doc_id"),
        "doc_id", "embedding", emb, EmbedIndex.Params(2, 6, 8))
      assert(kinds().isEmpty, s"healthy trio must report clean: ${kinds()}")

      // staged-but-uncommitted compaction
      fs.mkdirs(new Path(s"$sigs/.compact/sigs"))
      assert(kinds() == Seq(("staging-inert", sigs)))
      // committed swap marker: the mixed state recover rolls forward
      fs.create(new Path(s"$sigs/.compact/_SWAP"), true).close()
      assert(kinds() == Seq(("swap-committed", sigs)))
      fs.delete(new Path(s"$sigs/.compact"), true)

      // retired dir never pruned
      fs.mkdirs(new Path(s"$cc/.old_docs"))
      assert(kinds() == Seq(("orphan-old", cc)))
      fs.delete(new Path(s"$cc/.old_docs"), true)

      // live table dir caught between its two renames: the crash
      // findings ARE the report (data checks would throw on the hole)
      fs.rename(new Path(s"$clusters/assignments"),
        new Path(s"$clusters/hidden"))
      assert(kinds() == Seq(("missing-live", clusters)))
      fs.rename(new Path(s"$clusters/hidden"),
        new Path(s"$clusters/assignments"))

      // a lease whose record is past its stale window: dead holder
      val lease = fs.create(new Path(s"$emb/.lease"), true)
      try lease.write(
        (s"""{"token":"t","host":"nowhere","pid":1,""" +
          s""""acquired_ms":${System.currentTimeMillis - 7200000L},""" +
          """"stale_after_ms":3600000}""").getBytes("UTF-8"))
      finally lease.close()
      assert(kinds() == Seq(("lease-stale", emb)))
      fs.delete(new Path(s"$emb/.lease"), false)

      // a LIVE holder (another maintainer's thread) is informational
      val held = new java.util.concurrent.atomic.AtomicReference[
        graft.sources.Lease.Held]
      val t = new Thread(() =>
        held.set(graft.sources.Lease.acquire(spark, emb)))
      t.start(); t.join()
      assert(kinds() == Seq(("lease-held", emb)))
      val t2 = new Thread(() => held.get().release())
      t2.start(); t2.join()

      // a pre-vector-carrying embed layout (the retired narrow bucket
      // rows, or a sidecar torn away entirely): probes/folds refuse it
      // loudly, and fsck must say WHY before a stream hits it
      def sidecar(json: Option[String]): Unit = {
        val p = new Path(s"$emb/_params.json")
        json match {
          case Some(j) =>
            val out = fs.create(p, true)
            try out.write(j.getBytes("UTF-8")) finally out.close()
          case None => fs.delete(p, false); ()
        }
      }
      sidecar(Some("""{"bands":2,"planes_per_band":6,"dims":8}"""))
      assert(kinds() == Seq(("embed-layout", emb)),
        s"a layout-1 sidecar must surface as embed-layout: ${kinds()}")
      sidecar(None)
      assert(kinds() == Seq(("embed-layout", emb)),
        s"a missing sidecar must surface as embed-layout: ${kinds()}")
      sidecar(Some(
        s"""{"bands":2,"planes_per_band":6,"dims":8,"layout":${EmbedIndex.Layout}}"""))
      assert(kinds().isEmpty, "report must be clean after the sidecar heals")

      // an index folding content the corpus never landed: id drift,
      // and (one dial, one fold set) the settled-fold skew rides along
      import spark.implicits._
      SignatureIndex.foldBatch(sigs,
        Seq((999999L, "words the corpus never saw at all"))
          .toDF("doc_id", "text"), "doc_id", "text", 5L)
      val drifted = Fsck.check(spark, cc, sigs, clusters, Some(emb))
      assert(drifted.map(_.kind).sorted ==
        Seq("fold-skew", "id-drift", "watermark-skew"),
        s"expected drift + both skews: $drifted")
      assert(drifted.find(_.kind == "id-drift").get.detail
        .contains("present in sigs but missing from corpus+clusters+embed"))
      fs.delete(new Path(s"$sigs/sigs/__batch=5"), true)
      fs.delete(new Path(s"$sigs/bands/__batch=5"), true)
      assert(kinds().isEmpty, "report must be clean after the injections heal")

      // an id DOUBLE-LANDED inside one table — the replay-duplication
      // corruption the overwrite discipline prevents — must surface
      // as its own finding (and must NOT corrupt the membership mask
      // into a phantom drift of another table)
      val someId = CuratedCorpus.open(spark, cc)
        .select("doc_id").head().getLong(0)
      val dupDoc = Seq((someId, "copy of standing content one"))
        .toDF("doc_id", "text")
      SignatureIndex.foldBatch(sigs, dupDoc, "doc_id", "text", 6L)
      SignatureIndex.foldBatch(sigs, dupDoc, "doc_id", "text", 7L)
      val dup = Fsck.check(spark, cc, sigs, clusters, Some(emb))
      assert(dup.map(_.kind).sorted ==
        Seq("dup-ids", "fold-skew", "watermark-skew"),
        s"expected duplicate + both skews, no phantom drift: $dup")
      assert(dup.find(_.kind == "dup-ids").get.detail
        .contains("1 ids in sigs carry 2 extra copies"), s"$dup")
      Seq(6L, 7L).foreach { b =>
        fs.delete(new Path(s"$sigs/sigs/__batch=$b"), true)
        fs.delete(new Path(s"$sigs/bands/__batch=$b"), true)
      }
      assert(kinds().isEmpty, "report must be clean after the dup heals")

      // fold-clock findings in isolation, via the persisted marker —
      // the "∨ marker" half of the watermark definition. A corpus
      // clock ahead of its siblings (the mid-router crash window, as
      // the marker would record it post-compaction):
      def writeMarker(json: String): Unit = {
        val out = fs.create(new Path(
          s"$cc/${graft.sources.StandingStore.WatermarkFile}"), true)
        try out.write(json.getBytes("UTF-8")) finally out.close()
      }
      writeMarker("""{"batch_watermark":0,"compacted_through":-1}""")
      assert(kinds() == Seq(("watermark-skew", cc)),
        s"marker-carried watermark must skew: ${kinds()}")
      // a collapse floor past the slowest sibling's watermark: the
      // state a lockstep view refuses loudly on (openAt's floor)
      writeMarker("""{"batch_watermark":0,"compacted_through":0}""")
      assert(kinds().sorted ==
        Seq(("floor-breach", cc), ("watermark-skew", cc)),
        s"floor past the slowest watermark must breach: ${kinds()}")
      fs.delete(new Path(
        s"$cc/${graft.sources.StandingStore.WatermarkFile}"), false)
      assert(kinds().isEmpty, "report must be clean after the clock heals")
    } finally {
      fs.delete(new Path(root), true)
      ()
    }
  }

  test("fsck covers served IVF roots: clean, tombs-standing, incomplete-build") {
    import graft.ann.{IvfIndex, Similarity}
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", 4)
    val base = java.nio.file.Files
      .createTempDirectory("graft-fsck-ivf").toString
    val snap = IvfIndex.snapshotPath(base, "s1")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      IvfIndex.write(emb, "vec_id", "embedding", cents, snap)
      assert(Fsck.checkIvf(spark, snap).isEmpty, "a committed index is clean")
      assert(Fsck.checkIvfBase(spark, base).isEmpty)
      // a standing retraction is the informational tombs report
      IvfIndex.retract(spark, snap,
        emb.where(col("vec_id") === 0L).select("vec_id"), "vec_id", 0L)
      assert(Fsck.checkIvf(spark, snap).map(_.kind) == Seq("tombs-standing"))
      IvfIndex.compact(spark, snap, retractIdCol = Some("vec_id"))
      assert(Fsck.checkIvf(spark, snap).isEmpty)
      // a crashed build (marker pair torn) is named, and the base
      // scan finds it without being told the snapshot's name
      fs.delete(new Path(s"$snap/corpus/_SUCCESS"), false)
      assert(Fsck.checkIvf(spark, snap).map(_.kind) ==
        Seq("incomplete-build"))
      assert(Fsck.checkIvfBase(spark, base).map(_.kind) ==
        Seq("incomplete-build"))
      // but a torn-yet-COMMITTED compaction swap also tears the
      // marker pair, and ITS remedy is the free roll-forward — the
      // wrong-remedy incomplete-build must stand down for it
      fs.mkdirs(new Path(s"$snap/.compact"))
      fs.create(new Path(s"$snap/.compact/_SWAP")).close()
      assert(Fsck.checkIvf(spark, snap).map(_.kind) ==
        Seq("swap-committed"))
      fs.delete(new Path(s"$snap/.compact"), true)
      assert(Fsck.checkIvf(spark, snap).map(_.kind) ==
        Seq("incomplete-build"))
    } finally {
      fs.delete(new Path(base), true)
      ()
    }
  }

  test("checkAll walks one layout: trio + ivf + release, findings concatenated") {
    import graft.ann.{IvfIndex, Similarity}
    import graft.pipeline.Release
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val T = DedupQueries.IncrementalFuzzyThreshold
    val base = java.nio.file.Files
      .createTempDirectory("graft-fsck-all").toString
    val (cc, sigs, clusters) =
      (s"$base/cc", s"$base/sigs", s"$base/clusters")
    val (ivfBase, rel) = (s"$base/ivf", s"$base/release")
    val snap = IvfIndex.snapshotPath(ivfBase, "s1")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val layout = Fsck.Layout(cc, sigs, clusters,
      ivf = Seq(snap), ivfBases = Seq(ivfBase), releases = Seq(rel))
    try {
      CuratedCorpus.init(docs, cc)
      IngestStream.bootstrapIndexes(spark, cc, sigs, clusters, T)
      IvfIndex.write(emb, "vec_id", "embedding",
        Similarity.trainCentroids(emb, "vec_id", "embedding", 4), snap)
      Release.buildFromCorpus(spark, cc, rel, 1, Release.Seed,
        Release.Budget, shards = 4)
      assert(Fsck.checkAll(spark, layout).isEmpty,
        "a healthy full layout reports clean")

      // one injected finding PER FACE: the single verb must surface
      // all of them in one walk (the hand-wired per-face calls the
      // loop smoke used to make are exactly what drifts)
      fs.mkdirs(new Path(s"$cc/.old_docs"))                   // trio
      fs.delete(new Path(s"$snap/corpus/_SUCCESS"), false)    // ivf
      fs.mkdirs(new Path(s"$rel/v2/shards"))                  // release
      val found = Fsck.checkAll(spark, layout).map(f => (f.kind, f.root))
      assert(found.contains(("orphan-old", cc)), s"$found")
      // the served root AND the base scan both surface the torn pair
      // (the base scan reports the fs-qualified form of the same root)
      assert(found.count { case (k, r) =>
        k == "incomplete-build" && r.endsWith(snap) } == 2, s"$found")
      assert(found.contains(("partial-build", rel)), s"$found")
      assert(found.size == 4, s"exactly the injected findings: $found")
    } finally {
      fs.delete(new Path(base), true)
      ()
    }
  }

  test("FsckMain: CLI shape parses into the layout; run reports through the same walk") {
    // parse: three positional roots, then repeatable flags
    assert(FsckMain.parse(Seq("c", "s", "k",
      "--embed", "e", "--ivf", "i1", "--ivf", "i2",
      "--ivf-base", "b", "--release", "r1", "--release", "r2")) ==
      Fsck.Layout("c", "s", "k", Some("e"), Seq("i1", "i2"), Seq("b"),
        Seq("r1", "r2")))
    assert(FsckMain.parse(Seq("c", "s", "k")) == Fsck.Layout("c", "s", "k"))
    // malformed shapes fail with the usage, not an opaque match error
    intercept[IllegalArgumentException] { FsckMain.parse(Seq("c", "s")) }
    intercept[IllegalArgumentException] {
      FsckMain.parse(Seq("c", "s", "k", "--embed")) // value-less flag
    }
    intercept[IllegalArgumentException] {
      FsckMain.parse(Seq("c", "s", "k", "--embed", "a", "--embed", "b"))
    }
    intercept[IllegalArgumentException] {
      FsckMain.parse(Seq("c", "s", "k", "--bogus", "x"))
    }
    // a flag-like token is never a value: `--embed --ivf x` must fail
    // with the usage, not silently bind "--ivf" as the embed path and
    // drop the intended --ivf root (ADVICE r18)
    intercept[IllegalArgumentException] {
      FsckMain.parse(Seq("c", "s", "k", "--embed", "--ivf", "x"))
    }
    intercept[IllegalArgumentException] {
      FsckMain.parse(Seq("c", "s", "k", "--release", "--release"))
    }

    // run: the parsed layout drives exactly Fsck.checkAll — a healthy
    // trio is clean, an injected crash state surfaces by kind
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val T = DedupQueries.IncrementalFuzzyThreshold
    val base = java.nio.file.Files
      .createTempDirectory("graft-fsck-main").toString
    val (cc, sigs, clusters) = (s"$base/cc", s"$base/sigs", s"$base/clusters")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      CuratedCorpus.init(docs, cc)
      IngestStream.bootstrapIndexes(spark, cc, sigs, clusters, T)
      assert(FsckMain.run(spark, Seq(cc, sigs, clusters)).isEmpty,
        "a healthy trio must run clean through the CLI face")
      fs.mkdirs(new Path(s"$cc/.old_docs"))
      assert(FsckMain.run(spark, Seq(cc, sigs, clusters)).map(_.kind) ==
        Seq("orphan-old"),
        "the CLI face must surface the injected crash state")
    } finally {
      fs.delete(new Path(base), true)
      ()
    }
  }

  test("FsckMain on absent roots reports findings instead of crashing") {
    // an operator pointing the CLI at a wrong (or not-yet-built) path
    // must get a report naming what is missing, never a stack trace —
    // and never a clean exit: the library walk reads absent release /
    // ivf-base roots as legitimately empty (they appear at first
    // build), so the CLI names every typed-but-absent root itself
    val base = java.nio.file.Files
      .createTempDirectory("graft-fsck-absent").toString
    val found = FsckMain.run(spark, Seq(
      s"$base/cc", s"$base/sigs", s"$base/clusters",
      "--ivf", s"$base/noivf",
      "--ivf-base", s"$base/nobase",
      "--release", s"$base/norel"))
    assert(found.nonEmpty, "absent roots must surface findings")
    assert(found.map(_.kind).toSet ==
      Set("missing-root", "missing-live", "incomplete-build"),
      s"absent roots must read as crash-state findings: $found")
    // every typed root is named missing — INCLUDING the release root
    // and snapshot base the library walk would silently read as empty
    assert(found.filter(_.kind == "missing-root").map(_.root).toSet ==
      Set(s"$base/cc", s"$base/sigs", s"$base/clusters",
        s"$base/noivf", s"$base/nobase", s"$base/norel"), s"$found")
    // plus the library's own crash-state findings: the trio's six
    // table dirs and the ivf root's corpus dir (6 + 1 missing-live)
    assert(found.count(_.kind == "missing-live") == 7, s"$found")
  }

  test("FsckMain.cli — the shipped verb body — reports missing-root and maps findings to exit codes") {
    // VERDICT r18 #1: main() recomputed findings via Fsck.checkAll and
    // silently skipped run()'s missing-root scan — the spec suite was
    // green while the shipped CLI fscked a typo'd root clean. cli() is
    // now the ONLY findings path main has (main adds just the session
    // and sys.exit), so driving cli() here IS driving the shipped verb.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val T = DedupQueries.IncrementalFuzzyThreshold
    val base = java.nio.file.Files
      .createTempDirectory("graft-fsck-cli").toString
    val (cc, sigs, clusters) = (s"$base/cc", s"$base/sigs", s"$base/clusters")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      CuratedCorpus.init(docs, cc)
      IngestStream.bootstrapIndexes(spark, cc, sigs, clusters, T)
      val lines = scala.collection.mutable.Buffer.empty[String]
      assert(FsckMain.cli(spark, Seq(cc, sigs, clusters), lines += _) == 0,
        "a healthy trio must exit 0")
      assert(lines.toSeq == Seq("[fsck] clean — no findings"))
      // the r18 regression shape: an otherwise-healthy deployment with
      // one TYPO'D extra root — the shipped CLI must exit 1 and name it
      lines.clear()
      val typo = s"$base/releasez" // never built
      val code = FsckMain.cli(spark,
        Seq(cc, sigs, clusters, "--release", typo), lines += _)
      assert(code == 1, "a typo'd --release root must NOT fsck clean")
      assert(lines.exists(l =>
        l.startsWith("[fsck] missing-root") && l.contains(typo)),
        s"the typo'd root must be named in the report: $lines")
    } finally {
      fs.delete(new Path(base), true)
      ()
    }
  }

  test("lineage json escape/unescape are exact inverses (single left-to-right pass)") {
    import graft.pipeline.Release
    // backslash-and-quote-dense paths: the adversarial shapes where a
    // re-derived chained decode needs a well-formedness argument —
    // the shared single-pass inverse needs none
    val cases = Seq(
      """C:\data\corpus""", """a\\b""", """say "hi"""", """\"""",
      """\\\"tail\""", "plain", "", """trailing\""", """"q\\"""")
    cases.foreach { s =>
      val e = Release.escapeJsonString(s)
      assert(Release.unescapeJsonString(e) == s,
        s"round trip broke for <$s> via <$e>")
      // and through the exact regex checkRelease extracts with
      val j = s"""{"corpus_path":"$e","corpus_batch":7}"""
      val m = "\"corpus_path\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findFirstMatchIn(j)
      assert(m.isDefined && Release.unescapeJsonString(m.get.group(1)) == s,
        s"regex+decode broke for <$s> in <$j>")
    }
  }

  test("fsck covers release roots: clean, partial-build, manifest-orphan, lineage-watermark-skew") {
    import graft.pipeline.{CuratedCorpus, Fsck, Release}
    import org.apache.hadoop.fs.Path
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val base = java.nio.file.Files
      .createTempDirectory("graft-fsck-rel").toString
    val (cc, root) = (s"$base/cc", s"$base/release")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      // a missing root and a fresh root are both clean
      assert(Fsck.checkRelease(spark, root).isEmpty)
      CuratedCorpus.init(docs.where(col("doc_id") < mx / 2), cc)
      CuratedCorpus.foldBatch(cc,
        docs.where(col("doc_id") >= mx / 2 && col("doc_id") < mx * 3 / 4), 0L)
      CuratedCorpus.foldBatch(cc, docs.where(col("doc_id") >= mx * 3 / 4), 1L)
      Release.buildFromCorpus(spark, cc, root, 1, Release.Seed,
        Release.Budget, shards = 4, atBatch = Some(0L))
      Release.buildFromCorpus(spark, cc, root, 2, Release.Seed,
        Release.Budget, shards = 4, atBatch = Some(1L))
      assert(Fsck.checkRelease(spark, root).isEmpty,
        "two monotone corpus-cut versions are healthy")

      // PARTIAL BUILD: a version dir without its manifest —
      // informational, invisible to latestVersion
      fs.mkdirs(new Path(s"$root/v3/shards"))
      assert(Fsck.checkRelease(spark, root).map(_.kind) ==
        Seq("partial-build"))
      assert(Release.latestVersion(spark, root).contains(2),
        "a partial build must stay invisible to latestVersion")
      fs.delete(new Path(s"$root/v3"), true)

      // MANIFEST ORPHAN: a committed version whose shards dir is gone
      fs.rename(new Path(s"$root/v2/shards"), new Path(s"$base/stash"))
      assert(Fsck.checkRelease(spark, root).map(_.kind) ==
        Seq("manifest-orphan"))
      fs.rename(new Path(s"$base/stash"), new Path(s"$root/v2/shards"))
      assert(Fsck.checkRelease(spark, root).isEmpty)

      // LINEAGE SKEW, version order: v3 cut AS OF an older corpus
      // state than v2 (a rewound pinned clock)
      Release.buildFromCorpus(spark, cc, root, 3, Release.Seed,
        Release.Budget, shards = 4, atBatch = Some(0L))
      val skew = Fsck.checkRelease(spark, root)
      assert(skew.map(_.kind) == Seq("lineage-watermark-skew") &&
        skew.head.detail.contains("v3") && skew.head.detail.contains("v2"),
        s"a rewound cut must be named: $skew")
      fs.delete(new Path(s"$root/v3"), true)

      // LINEAGE SKEW, corpus clock: the corpus restored to an OLDER
      // state than a committed version records
      CuratedCorpus.delete(spark, cc)
      CuratedCorpus.init(docs.where(col("doc_id") < mx / 2), cc)
      val ahead = Fsck.checkRelease(spark, root)
      assert(ahead.map(_.kind).distinct == Seq("lineage-watermark-skew") &&
        ahead.exists(_.detail.contains("moved backwards")),
        s"a rewound corpus must be named: $ahead")
    } finally {
      fs.delete(new Path(base), true)
      ()
    }
  }
}
