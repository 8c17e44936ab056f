package graft

import org.apache.spark.sql.functions._

import graft.sources.{StandingStore, TableSpec}

/** Direct pins on the shared standing-table lifecycle the wrapper
  * structures (DocStore, SignatureIndex, ClusterIndex, CuratedCorpus,
  * EmbedIndex) all compose: fold guards, listing-only counters,
  * sizing (own-dir, sizeFrom sibling, caller override), and the
  * settled-only default compaction. */
class StandingStoreSpec extends SparkSpec {

  test("store verbs: guards, counters, sizing, settled-only compaction") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-store").toString
    val s = new StandingStore(root, Seq(
      TableSpec("a", "k LONG, v LONG, __batch LONG", Seq("k")),
      // b sizes its files off sibling a's dir at a tiny target, the
      // bands-off-sigs discipline
      TableSpec("b", "k LONG, __batch LONG", Seq("k"),
        targetFileBytes = 1024L, sizeFrom = Some("a"))))
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2).as("v"))
    s.landBase(rows(0, 1000), "a")
    s.landBase(rows(0, 1000).select("k"), "b")
    s.landFold(rows(1000, 1100), "a", 0L)
    s.landFold(rows(1000, 1100).select("k"), "b", 0L)
    s.landFold(rows(1100, 1200), "a", 1L)
    s.landFold(rows(1100, 1200).select("k"), "b", 1L)
    assert(s.foldCount(spark) == 2)
    assert(s.settledFoldCount(spark, 0L) == 1)
    // replay overwrites its own partition, never appends beside it
    s.landFold(rows(1000, 1100), "a", 0L)
    assert(s.open(spark, "a").count() == 1200L)
    // guards: the base marker is not a fold id; unknown tables refuse
    intercept[IllegalArgumentException] {
      s.landFold(rows(0, 1), "a", StandingStore.BaseBatch)
    }
    intercept[IllegalArgumentException] { s.open(spark, "zzz") }
    // sizing: a sizes off its own dir at the default target (1 file
    // at fixture scale); b's count derives from A's bytes over B's
    // tiny target; a caller override rescales without a new spec
    val aBytes = {
      val p = new org.apache.hadoop.fs.Path(s"$root/a")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    assert(s.fileCount(spark, "a") == 1)
    assert(s.fileCount(spark, "b") == ((aBytes + 1023) / 1024).toInt)
    assert(s.fileCount(spark, "b") > 1, "fixture must exercise sizing")
    assert(s.fileCount(spark, "a", Some(1024L)) ==
      s.fileCount(spark, "b"))
    // settled-only default compaction: fold 0 bakes in, fold 1 stands,
    // no row lost; the due-check counts only settled folds
    s.compactThrough(spark, 0L)
    assert(s.foldCount(spark) == 1)
    assert(s.open(spark, "a").count() == 1200L &&
      s.open(spark, "b").count() == 1200L)
    assert(!s.maintainThrough(spark, 1, 0L)(),
      "no settled fold may trigger the cadence")
    assert(s.maintainThrough(spark, 1, 1L)())
    assert(s.foldCount(spark) == 0)
    assert(s.open(spark, "a").count() == 1200L)
    s.delete(spark)
  }

  test("retraction: O(ids) tombstones, filtered reads, purging compaction") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-store-retract").toString
    val s = new StandingStore(root, Seq(
      TableSpec("a", "k LONG, v LONG, __batch LONG", Seq("k"),
        retractCol = Some("k")),
      // exempt sibling — the hashes/relabel shape: retraction must
      // never touch it
      TableSpec("b", "k LONG, __batch LONG", Seq("k"))))
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2).as("v"))
    s.landBase(rows(0, 100), "a")
    s.landBase(rows(0, 100).select("k"), "b")
    s.landFold(rows(100, 110), "a", 0L)
    s.landFold(rows(100, 110).select("k"), "b", 0L)

    // no tombstones standing: open is plan-identical to the raw read
    // (the steady state costs nothing)
    assert(!s.open(spark, "a").queryExecution.executedPlan.toString
      .contains("Join"))

    // retract ids spanning base and fold; reads filter at once, the
    // data dirs are untouched (logical delete), the exempt sibling
    // keeps every row, and the filter side BROADCASTS
    val dead = spark.range(0, 200, 7).select(col("id").as("k"))
    s.retract(dead, "k", 0L)
    val openA = s.open(spark, "a")
    assert(openA.count() == 110L - 16L) // multiples of 7 in [0,110)
    assert(openA.where(col("k") % 7 === 0).count() == 0L)
    assert(s.openRaw(spark, "a").count() == 110L, "retract rewrites no data")
    assert(s.open(spark, "b").count() == 110L, "exempt table untouched")
    val plan = openA.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("BroadcastHashJoin"),
      s"tombstone filter must broadcast:\n$plan")
    // replay of the retraction overwrites its own partition
    s.retract(dead, "k", 0L)
    assert(s.retractionBatchIds(spark) == Seq(0L))
    assert(s.open(spark, "a").count() == 94L)

    // a second, UNSETTLED retraction (batch 1): compacting through 0
    // purges every standing tombstone's rows physically but clears
    // only the settled partition; reads keep filtering via batch 1
    s.retract(spark.range(1, 2).select(col("id").as("k")), "k", 1L)
    s.compactThrough(spark, 0L)
    assert(s.openRaw(spark, "a").count() == 93L, "purge is physical")
    assert(s.retractionBatchIds(spark) == Seq(1L),
      "settled tombstone cleared, unsettled kept")
    assert(s.open(spark, "a").where(col("k") === 1).count() == 0L)
    // clearing the last partition retires the dir: absent ≡ drained,
    // and open returns to the join-free steady-state plan
    s.compactThrough(spark, 1L)
    assert(s.retractionBatchIds(spark).isEmpty)
    assert(!new org.apache.hadoop.fs.Path(s"$root/tombs")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$root/tombs")))
    assert(!s.open(spark, "a").queryExecution.executedPlan.toString
      .contains("Join"))
    assert(s.open(spark, "a").count() == 93L)

    // CAUSAL BOUND: a tombstone dated before a standing fold is
    // refused — it would clear as "settled" while its targets' fold is
    // still replayable, turning the next redelivery into a silent
    // resurrection. At the fold clock's watermark it is accepted.
    s.landFold(rows(200, 210), "a", 5L)
    s.landFold(rows(200, 210).select("k"), "b", 5L)
    intercept[IllegalArgumentException] { s.retract(dead, "k", 2L) }
    s.retract(dead, "k", 5L)
    // dead's ids (0..196 step 7) were already purged; the new fold's
    // ids (200..209) are untouched by the standing tombstone
    assert(s.open(spark, "a").count() == 103L)

    // a concurrent maintainer's lease refuses the verb LOUDLY — a
    // delete must never silently race a compaction's staging-to-clear
    // window (and must never be silently skipped)
    val heldRef =
      new java.util.concurrent.atomic.AtomicReference[graft.sources.Lease.Held]
    val t = new Thread(() =>
      heldRef.set(graft.sources.Lease.acquire(spark, root)))
    t.start(); t.join()
    intercept[graft.sources.Lease.HeldElsewhereException] {
      s.retract(dead, "k", 5L)
    }
    val t2 = new Thread(() => heldRef.get().release())
    t2.start(); t2.join()
    s.retract(dead, "k", 5L) // released: the delete proceeds

    // a store with no retractable table refuses the verb
    val bare = new StandingStore(root + "_bare", Seq(
      TableSpec("a", "k LONG, __batch LONG", Seq("k"))))
    intercept[IllegalArgumentException] { bare.retract(dead, "k", 0L) }

    // id cast guard: a null or non-numeric id would store a NULL the
    // anti-join can never match — the delete would silently NO-OP, so
    // the verb must fail loudly instead. Numeric strings cast fine.
    import spark.implicits._
    def loud(body: => Unit): Unit = {
      val e = intercept[Exception] { body }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("retraction id")), s"wrong failure: $e")
    }
    loud { s.retract(Seq("7", "abc").toDF("k"), "k", 5L) }
    loud { s.retract(Seq(Some(7L), None).toDF("k"), "k", 5L) }
    // fractional ids must be LOSSLESS, not truncated: 7.9 silently
    // becoming 7 would delete the wrong document — whether it arrives
    // as a DOUBLE or as a STRING (non-ANSI string→long truncates a
    // decimal suffix, so the string's FORM is checked)
    loud { s.retract(Seq(7.9d).toDF("k"), "k", 5L) }
    loud { s.retract(Seq("7.9").toDF("k"), "k", 5L) }
    s.retract(Seq(21.0d).toDF("k"), "k", 5L) // integral doubles land
    s.retract(Seq("7", "14").toDF("k"), "k", 5L) // numeric strings land
    s.retract(Seq("+35").toDF("k"), "k", 5L) // signed integral form lands
    // column resolution honors the session's case rules (a bare
    // schema lookup would throw where col() resolves)
    s.retract(Seq(28L).toDF("k"), "K", 5L)
    assert(s.open(spark, "a").where(col("k").isin(7L, 14L, 21L, 28L))
      .count() == 0L)
    s.delete(spark)
  }

  test("fold watermark persists across compactions; openAt bounds, guards the floor, never resurrects") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-store-wm").toString + "/t"
    val s = new StandingStore(root, Seq(
      TableSpec("a", "k LONG, v LONG, __batch LONG", Seq("k"),
        retractCol = Some("k"))))
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2).as("v"))
    s.landBase(rows(0, 100), "a")
    assert(s.batchWatermark(spark) == StandingStore.BaseBatch &&
      s.compactedThrough(spark) == StandingStore.BaseBatch)
    s.landFold(rows(100, 110), "a", 0L)
    s.landFold(rows(110, 120), "a", 1L)
    s.landFold(rows(120, 130), "a", 2L)
    assert(s.batchWatermark(spark) == 2L)
    // openAt: base + folds ≤ w, a PARTITION bound
    assert(s.openAt(spark, "a", StandingStore.BaseBatch).count() == 100L)
    assert(s.openAt(spark, "a", 0L).count() == 110L)
    assert(s.openAt(spark, "a", 1L).count() == 120L)
    // compaction persists clock + floor BEFORE collapsing: the
    // watermark survives, bounds below the floor refuse (the collapsed
    // folds cannot be re-excluded — refusing beats silently including)
    s.compactThrough(spark, 1L)
    assert(s.batchWatermark(spark) == 2L,
      "the watermark must survive its folds' collapse")
    assert(s.compactedThrough(spark) == 1L)
    assert(s.openAt(spark, "a", 1L).count() == 120L)
    assert(s.openAt(spark, "a", 2L).count() == 130L)
    intercept[IllegalArgumentException] { s.openAt(spark, "a", 0L) }
    // a FULL collapse: the marker alone carries the clock
    s.compactThrough(spark, Long.MaxValue)
    assert(s.foldCount(spark) == 0 && s.batchWatermark(spark) == 2L)
    assert(s.compactedThrough(spark) == 2L,
      "the floor rides the watermark, not Long.MaxValue")
    // retractions apply IN FULL, even tombstones dated past the
    // bound: a snapshot must never resurrect a deleted row
    s.landFold(rows(130, 140), "a", 3L)
    s.retract(spark.range(0, 1).select(lit(5L).as("k"))
      .unionByName(spark.range(0, 1).select(lit(135L).as("k"))), "k", 3L)
    val v2 = s.openAt(spark, "a", 2L)
    assert(v2.count() == 129L &&
      v2.where(col("k") === 5L).count() == 0L,
      "a later-dated tombstone must still filter the earlier view")
    assert(s.openAt(spark, "a", 3L).count() == 138L)
    // a rebuild resets the clock with the tables
    s.withLease(spark) { s.clearForRewrite(spark) }
    s.landBase(rows(0, 10), "a")
    assert(s.batchWatermark(spark) == StandingStore.BaseBatch &&
      s.compactedThrough(spark) == StandingStore.BaseBatch,
      "clearForRewrite must reset the persisted watermark")

    // a ZERO-ROW fold that ADVANCES the clock still lands (an empty
    // partition dir): the watermark must move whether or not the
    // batch carried rows for this table, or a min-watermark consumer
    // (lockstepView) stalls behind a healthy root — while a REPLAYED
    // old batch folding empty recreates nothing (forward-only; the
    // replay-after-compaction contract)
    s.landFold(rows(0, 0), "a", 0L)
    assert(s.foldCount(spark) == 1 && s.batchWatermark(spark) == 0L,
      "an empty fold on a new batch must advance the clock")
    assert(s.open(spark, "a").count() == 10L,
      "an empty fold adds no rows")
    s.landFold(rows(100, 110), "a", 1L)
    s.compactThrough(spark, Long.MaxValue)
    assert(s.foldCount(spark) == 0)
    s.landFold(rows(0, 0), "a", 1L) // replay of a compacted batch
    assert(s.foldCount(spark) == 0,
      "a replayed compacted batch folding empty must recreate nothing")
    assert(s.batchWatermark(spark) == 1L)
    s.delete(spark)

    // the forward test is PER-TABLE: a batch that lands rows in one
    // table and nothing in a sibling must leave BOTH partition dirs
    // standing, or the healthy batch reads as a torn fold
    val s2 = new StandingStore(root + "_2", Seq(
      TableSpec("x", "k LONG, v LONG, __batch LONG", Seq("k")),
      TableSpec("y", "k LONG, v LONG, __batch LONG", Seq("k"))))
    s2.landBase(rows(0, 5), "x")
    s2.landBase(rows(0, 5), "y")
    s2.landFold(rows(10, 15), "x", 0L) // rows advance the root clock...
    s2.landFold(rows(0, 0), "y", 0L) // ...the sibling's empty fold still lands
    val fs2 = new org.apache.hadoop.fs.Path(root + "_2")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs2.exists(new org.apache.hadoop.fs.Path(
      s"${root}_2/y/__batch=0")),
      "the sibling's empty fold must land its partition dir")
    assert(s2.batchWatermark(spark) == 0L)
    s2.delete(spark)
  }

  test("watermark marker survives a crash in the delete-then-rename gap (tmp fallback)") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft-store-wmgap").toString + "/t"
    val s = new StandingStore(root, Seq(
      TableSpec("a", "k LONG, v LONG, __batch LONG", Seq("k"))))
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2).as("v"))
    s.landBase(rows(0, 10), "a")
    s.landFold(rows(10, 20), "a", 0L)
    s.landFold(rows(20, 30), "a", 1L)
    s.compactThrough(spark, 1L)
    assert(s.batchWatermark(spark) == 1L && s.compactedThrough(spark) == 1L)

    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(s"$root/${StandingStore.WatermarkFile}")
    val tmp = new Path(s"$root/.${StandingStore.WatermarkFile}.tmp")

    // Simulate persistFoldWatermark's HDFS fallback arm crashing
    // between delete(live) and rename(tmp, live): the tmp holds the
    // complete new record, the live marker is durably absent. The
    // clock must NOT collapse to (BaseBatch, BaseBatch) — that floor
    // is the guard-weakening direction.
    val content = {
      val in = fs.open(live)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    fs.delete(live, false)
    assert(s.batchWatermark(spark) == 1L && s.compactedThrough(spark) == 1L,
      "a complete tmp must carry the clock when the live marker is absent")
    // the floor still refuses collapsed bounds through the fallback
    intercept[IllegalArgumentException] { s.openAt(spark, "a", 0L) }

    // a TORN tmp (truncated mid-write, missing the floor key) is
    // never trusted — only the crash-in-gap source, which is always
    // complete, may stand in for the live marker
    val torn = fs.create(tmp, true)
    try torn.write("""{"batch_watermark":1""".getBytes("UTF-8"))
    finally torn.close()
    assert(s.batchWatermark(spark) == StandingStore.BaseBatch &&
      s.compactedThrough(spark) == StandingStore.BaseBatch,
      "a torn tmp must read as the absent-marker default")

    // the nastier tear: truncation INSIDE a multi-digit value — both
    // keys still parse ("…compacted_through":12} cut to "…:1"), but
    // the floor would read LOW, the guard-weakening direction. Only
    // the missing closing brace betrays it; the completeness check
    // must refuse.
    val tornDigit = fs.create(tmp, true)
    try tornDigit.write(
      """{"batch_watermark":12,"compacted_through":1""".getBytes("UTF-8"))
    finally tornDigit.close()
    assert(s.batchWatermark(spark) == StandingStore.BaseBatch &&
      s.compactedThrough(spark) == StandingStore.BaseBatch,
      "a tmp truncated inside a digit must read as the default, " +
        "never as a too-low floor")

    // the next persist heals the gap (rename-over or delete+rename)
    s.landFold(rows(30, 40), "a", 2L)
    s.compactThrough(spark, 2L)
    assert(s.batchWatermark(spark) == 2L && s.compactedThrough(spark) == 2L)
    assert(fs.exists(live) && !fs.exists(tmp),
      "a successful persist leaves a live marker and no staging tmp")

    // clearForRewrite clears the staging name too: a stranded tmp
    // must not shadow a fresh root's absent marker (ADVICE r15)
    val stray = fs.create(tmp, true)
    try stray.write(content.getBytes("UTF-8")) finally stray.close()
    s.withLease(spark) { s.clearForRewrite(spark) }
    assert(!fs.exists(tmp) && !fs.exists(live),
      "clearForRewrite must delete the marker AND its staging tmp")
    assert(s.batchWatermark(spark) == StandingStore.BaseBatch)
    s.delete(spark)
  }

  test("stageCompactThrough without the lease throws — the staging guard actually fires") {
    // The require exists to catch FUTURE misuse (a lease-less caller
    // under a live foreign owner would stage a mid-swap root); this is
    // the case that fires it, so deleting the guard goes red
    // (VERDICT r18 #2 — the crash-matrix specs all run UNDER the
    // lease and never exercised the negative)
    val root = java.nio.file.Files
      .createTempDirectory("graft-store-lease").toString
    val s = new StandingStore(root, Seq(
      TableSpec("a", "k LONG, __batch LONG", Seq("k"))))
    val e = intercept[IllegalArgumentException] {
      s.stageCompactThrough(spark, 0L)
    }
    assert(e.getMessage.contains(s"requires the $root lease"),
      s"the guard must name the root and the remedy: ${e.getMessage}")
  }
}
