package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.{ClusterIndex, Clusters, Dedup, SignatureIndex}
import graft.pipeline.{CuratedCorpus, DocStore, IngestStream}
import graft.sources.Lease
import graft.streaming.EventTimeOps

/** A lease refusal inside a stream router's MAINTENANCE CADENCE must
  * skip the tick, never kill the query: an operator running one
  * ad-hoc compact against a live loop's root aborts their own job,
  * not the production stream. The folds are unleased and land
  * regardless; the cadence retries and fires on the first batch after
  * the external holder releases. */
class LeaseToleranceSpec extends SparkSpec {

  /** Acquire the root's lease from ANOTHER thread — the per-thread
    * re-entrancy ledger means the test thread (and the stream's
    * foreachBatch thread) then sees a genuine external holder. */
  private def holdElsewhere(root: String): () => Unit = {
    val held = new AtomicReference[Lease.Held]
    val err = new AtomicReference[Throwable]
    val t = new Thread(() =>
      try held.set(Lease.acquire(spark, root))
      catch { case e: Throwable => err.set(e) })
    t.start(); t.join()
    if (err.get() != null) throw err.get()
    () => {
      val t2 = new Thread(() => held.get().release())
      t2.start(); t2.join()
    }
  }

  test("clusterFoldStream survives held roots: folds land, cadence skips, resumes on release") {
    import spark.implicits._
    val A = "alpha beta gamma delta epsilon zeta eta theta"
    val B = "one two three four five six seven eight"
    val C = "red orange yellow green blue indigo violet pink"
    val D = "new dog cat fish bird horse cow sheep"
    val corpus = Seq((1L, A), (2L, B)).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-lease-tol").toString
    val (docsPath, sigPath, clusterPath) =
      (s"$root/docs", s"$root/sigs", s"$root/clusters")
    DocStore.write(corpus, "doc_id", "text", docsPath)
    SignatureIndex.write(corpus, "doc_id", "text", sigPath)
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id",
        Dedup.nearDupPairs(corpus, "doc_id", "text", 0.9)
          .select("doc_a", "doc_b"), "doc_a", "doc_b")
        .select("doc_id", "cluster"), clusterPath)

    val schema = StructType.fromDDL("doc_id BIGINT, text STRING")
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(schema)
    val mem = MemoryStream[Row](enc, spark)
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Boolean)]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    // an EXTERNAL maintainer holds all three roots before the stream
    // starts — the worst case for a cadence-every-batch loop
    val releases = Seq(docsPath, sigPath, clusterPath).map(holdElsewhere)
    val q = EventTimeOps.clusterFoldStream(
      mem.toDF(), "doc_id", "text", docsPath, sigPath, clusterPath,
      threshold = 0.9, maintainEvery = Some(1),
      onMaintenanceSkipped = msg => { skipped += msg; () }) {
      (id, n, comp) => reports += ((id, n, comp))
    }.start()
    try {
      mem.addData(Row(10L, A), Row(11L, D)); q.processAllAvailable()
      // batch 1's cadence is DUE (fold 0 settled) — every root
      // refuses, the query must survive and the batch must fold
      mem.addData(Row(20L, D)); q.processAllAvailable()
      assert(q.isActive && q.exception.isEmpty,
        s"a HELD refusal killed the stream: ${q.exception}")
      assert(reports.toSeq == Seq((0L, 2L, false), (1L, 1L, false)),
        s"held-root batches must fold without compacting: $reports")
      assert(skipped.size == 3,
        s"three due cadences must each surface their refusal: $skipped")
      assert(skipped.forall(_.contains("maintained by")),
        s"refusal messages must name the holder: $skipped")
      assert(ClusterIndex.foldCount(spark, clusterPath) == 2 &&
        SignatureIndex.foldCount(spark, sigPath) == 2 &&
        DocStore.foldCount(spark, docsPath) == 2,
        "folds must land while the roots are held")
      // the holder releases: maintenance fires on the FIRST next batch
      releases.foreach(_.apply())
      mem.addData(Row(30L, C)); q.processAllAvailable()
      assert(reports.last == ((2L, 1L, true)),
        s"cadence must fire on the first batch after release: $reports")
    } finally q.stop()
    // nothing was lost or mislabeled across the refusals: the table
    // equals the from-scratch resolve of everything the stream saw
    val union = corpus.unionByName(
      Seq((10L, A), (11L, D), (20L, D), (30L, C)).toDF("doc_id", "text"))
    val want = Clusters.resolve(union, "doc_id",
        Dedup.nearDupPairs(union, "doc_id", "text", 0.9)
          .select("doc_a", "doc_b"), "doc_a", "doc_b")
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ClusterIndex.open(spark, clusterPath).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    ClusterIndex.delete(spark, root)
  }

  test("indexed accept router tolerates held roots and compacts after release") {
    import graft.dedup.DedupQueries
    import graft.pipeline.PipelineQueries
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val (t1, t2, t3) = (mx * 7 / 10, mx * 8 / 10, mx * 9 / 10)
    val base = docs.where(col("doc_id") < t1)
    val b1 = docs.where(col("doc_id") >= t1 && col("doc_id") < t2)
    val b2 = docs.where(col("doc_id") >= t2 && col("doc_id") < t3)
    val b3 = docs.where(col("doc_id") >= t3)
    val T = DedupQueries.IncrementalFuzzyThreshold
    val root = java.nio.file.Files
      .createTempDirectory("graft-lease-accept").toString
    val (cc, sigs, clusters) = (s"$root/cc", s"$root/sigs", s"$root/clusters")
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    def accept(b: org.apache.spark.sql.DataFrame, id: Long): Boolean =
      IngestStream.acceptIntoCorpusIndexed(b,
        IngestStream.BatchReport(id, b.count(), Nil, 0.0, 0L), cc, sigs,
        clusters, T, maintainEvery = Some(1),
        onMaintenanceSkipped = skipped += _)
    try {
      CuratedCorpus.init(base, cc)
      IngestStream.bootstrapIndexes(spark, cc, sigs, clusters, T)
      assert(accept(b1, 0L), "unheld cadence must compact at dial 1")
      val releases = Seq(cc, sigs, clusters).map(holdElsewhere)
      // all three roots held: the fold must land, every due cadence
      // must refuse-and-skip, and the router reports no compaction
      assert(!accept(b2, 1L))
      assert(skipped.size == 3, s"expected three refusals: $skipped")
      assert(CuratedCorpus.foldCount(spark, cc) == 1 &&
        SignatureIndex.foldCount(spark, sigs) == 2,
        "the held-root batch must still fold into every table")
      releases.foreach(_.apply())
      // first accept after release compacts again
      assert(accept(b3, 2L))
      // end state ≡ the from-scratch pipeline over everything
      val corpusIds = CuratedCorpus.open(spark, cc)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val curatedAll = PipelineQueries.curatedTrainDocs(docs)
      val want = Clusters.resolve(curatedAll, "doc_id",
          Dedup.nearDupPairs(curatedAll, "doc_id", "text", T)
            .select("doc_a", "doc_b"), "doc_a", "doc_b")
        .select("doc_id", "cluster").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(corpusIds == want.keySet)
      assert(ClusterIndex.open(spark, clusters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    } finally {
      CuratedCorpus.delete(spark, cc)
      SignatureIndex.delete(spark, sigs)
      ClusterIndex.delete(spark, clusters)
    }
  }

  test("ivfMaintainOnce: a lease-refused retrain falls back to the served index's append lane") {
    import graft.ann.{IvfIndex, Similarity}
    import graft.pipeline.DriftGate
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft-lease-ivf").toString
    def vPath(b: Long) = s"$base/v$b"
    val boot = s"$base/boot"
    val cents0 = Similarity.trainCentroids(corpus, "vec_id", "embedding", 4)
    IvfIndex.write(corpus, "vec_id", "embedding", cents0, boot)
    val (prof0, rel0) = DriftGate.embeddingProfile(
      spark.read.parquet(s"$boot/corpus"), "embedding")
    val handle = new AtomicReference(
      IvfIndex.Resident(boot, cents0, prof0, rel0))
    def batchAt(idOff: Long) = emb
      .filter(col("vec_id") >= 50 && col("vec_id") < 80)
      .select((col("vec_id") + lit(idOff)).as("vec_id"), col("embedding"))
    val log = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, String)]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    def maintain(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      EventTimeOps.ivfMaintainOnce(df, id, "vec_id", "embedding", handle,
        driftThreshold = 0.0, pathForVersion = vPath, // every batch retrains
        k = 4, refineIters = 1, retainIn = None,
        onBatch = (i, d, a) => { log += ((i, d, a)); () },
        onMaintenanceSkipped = skipped += _)
    try {
      // an external maintainer holds batch 1's version path: the
      // retrain must skip — batch lands in the SERVED index instead
      val release = holdElsewhere(vPath(1L))
      maintain(batchAt(1000L), 1L)
      assert(log.map(_._3) == Seq("retrain-skipped"), s"actions: $log")
      assert(skipped.nonEmpty && skipped.head.contains("maintained by"))
      assert(handle.get().path == boot,
        "a skipped retrain must not swap the served version")
      assert(spark.read.parquet(s"$boot/corpus").count() == 80L,
        "the skipped batch must land in the served index's append lane")
      // released, the SKIPPED batch is REDELIVERED (at-least-once):
      // the retrain must exclude the batch's own append partition
      // from the standing base, or every one of its rows would land
      // twice — baked into the new base AND re-appended under its id
      release()
      maintain(batchAt(1000L), 1L)
      assert(log.map(_._3) == Seq("retrain-skipped", "retrain"))
      assert(handle.get().path == vPath(1L) &&
        IvfIndex.isComplete(spark, vPath(1L)))
      val v1 = spark.read.parquet(s"${vPath(1L)}/corpus")
      assert(v1.count() == 80L &&
        v1.select("vec_id").distinct().count() == 80L,
        "a replayed skipped retrain must not duplicate the batch's rows")
      // and the loop continues: the next drifting batch retrains on a
      // base that carries the replayed batch exactly once
      maintain(batchAt(2000L), 2L)
      assert(log.map(_._3) ==
        Seq("retrain-skipped", "retrain", "retrain"))
      assert(handle.get().path == vPath(2L) &&
        IvfIndex.isComplete(spark, vPath(2L)))
      assert(spark.read.parquet(s"${vPath(2L)}/corpus").count() == 110L,
        "the retrain base must carry the earlier batches exactly once")
    } finally {
      handle.get().releaseProfile()
      IvfIndex.delete(spark, base)
    }
  }

  test("DirSwap.recover defers to a LIVE leased owner's in-flight swap") {
    import graft.sources.{DirSwap, StandingStore, TableSpec}
    val root = java.nio.file.Files
      .createTempDirectory("graft-recover-live").toString + "/t"
    val s = new StandingStore(root, Seq(
      TableSpec("a", "k LONG, __batch LONG", Seq("k"))))
    s.landBase(spark.range(0, 10).select(col("id").as("k")), "a")
    // freeze a swap at its commit point: staging written, marker
    // dropped, NO rename run yet — on disk this is exactly what a
    // healthy lease-holding compaction looks like mid-swap
    def stageMidSwap(rows: Long): Unit = {
      s.landStaging(spark.range(0, rows).select(col("id").as("k"),
        lit(StandingStore.BaseBatch).as("__batch")), "a", 1)
      DirSwap.commitSwaps(spark, root, Seq("a"), 0)
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markerStands = fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/.compact/_SWAP"))

    // 1. a LIVE foreign owner holds the root: a reader/fold preamble's
    //    recover must not touch it — racing the owner's renames over
    //    the same dirs can consume the staging and then retire the
    //    freshly-installed live dir (a wedged root, no live copy)
    stageMidSwap(20L)
    val release = holdElsewhere(root)
    s.recoverSwap(spark)
    assert(markerStands, "recover must defer to the live owner")
    assert(s.open(spark, "a").count() == 10L, "live table untouched")
    // 2. released: the marker is now a genuine crash remnant — repair
    release()
    s.recoverSwap(spark)
    assert(!markerStands)
    assert(s.open(spark, "a").count() == 20L, "committed swap rolls forward")

    // 3. the owner's OWN recover-before-stage preamble proceeds under
    //    its lease (per-thread re-entrancy)
    stageMidSwap(30L)
    graft.sources.Lease.withLease(spark, root) { s.recoverSwap(spark) }
    assert(!markerStands && s.open(spark, "a").count() == 30L)

    // 4. a BREAKABLE lease (stale window elapsed) is a crashed owner,
    //    not a live one: recover repairs right through it
    stageMidSwap(40L)
    val lease = new org.apache.hadoop.fs.Path(s"$root/.lease")
    val out = fs.create(lease, true)
    out.write((s"""{"token":"t","host":"gone-host","pid":1,""" +
      s""""acquired_ms":${System.currentTimeMillis - 10L * 3600 * 1000},""" +
      s""""stale_after_ms":${60L * 60 * 1000}}""").getBytes("UTF-8"))
    out.close()
    s.recoverSwap(spark)
    assert(!markerStands && s.open(spark, "a").count() == 40L,
      "a stale holder must not block crash repair")
    fs.delete(lease, false)

    // 5. the WRITE form: a fold preamble must not defer-and-write
    //    into a pending committed swap — the roll-forward would
    //    replace the live dirs with staged copies that predate (and
    //    so discard) the fold. Refuses while the owner's lease is
    //    live; repairs the moment it is not.
    stageMidSwap(50L)
    val release2 = holdElsewhere(root)
    s.recoverSwap(spark) // readers still defer silently
    assert(markerStands)
    val refusal = intercept[IllegalStateException] {
      s.recoverSwapForWrite(spark)
    }
    assert(refusal.getMessage.contains("pending"), s"$refusal")
    // a healthy held root (no swap state) stays writable: the refusal
    // keys on the pending swap, not the lease alone
    release2()
    s.recoverSwapForWrite(spark)
    assert(!markerStands && s.open(spark, "a").count() == 50L,
      "the write form must repair once no live owner holds the root")
    val release3 = holdElsewhere(root)
    s.recoverSwapForWrite(spark) // no marker, no staging: no refusal
    // a FRESH root (table dir never created) under a foreign lease is
    // not a mid-rename window — the first write must not be refused,
    // or the root wedges for as long as the lease stands
    val sFresh = new StandingStore(root + "_fresh", Seq(
      TableSpec("a", "k LONG, __batch LONG", Seq("k"))))
    fs.mkdirs(new org.apache.hadoop.fs.Path(root + "_fresh"))
    val release4 = holdElsewhere(root + "_fresh")
    sFresh.recoverSwapForWrite(spark)
    release4(); release3()
    sFresh.delete(spark)
    s.delete(spark)
  }
}
