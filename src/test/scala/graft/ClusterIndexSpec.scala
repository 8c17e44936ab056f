package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{ClusterIndex, Clusters}

/** The at-rest cluster-assignment lifecycle: write / foldBatch /
  * open / compact / delete. The contract is the incrementalResolve
  * theorem carried across the SESSION boundary — open-after-fold,
  * from any SparkSession, equals the from-scratch resolve of
  * corpus ∪ batches — plus the replay-idempotence the partitioned
  * layout buys. */
class ClusterIndexSpec extends SparkSpec {

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fixtureRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-clusteridx").toString

  test("fold chains merges across batches and equals the from-scratch resolve") {
    import spark.implicits._
    val corpus = (1L to 10L).toDF("doc_id")
    val corpusPairs = Seq((2L, 1L), (4L, 3L), (6L, 5L)).toDF("a", "b")
    val base = Clusters.resolve(corpus, "doc_id", corpusPairs, "a", "b")
      .select("doc_id", "cluster")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(base, path)

    // batch A merges standing clusters {1,2} and {3,4} through doc 100
    val batchA = Seq(100L, 101L).toDF("doc_id")
    val pairsA = Seq((100L, 2L), (100L, 4L)).toDF("a", "b")
    ClusterIndex.foldBatch(path, batchA, "doc_id", pairsA, "a", "b", 0L)
    // batch B merges the A-merged family with {5,6} — the relabel
    // chain 3→1 then 5→1 must COMPOSE at open time
    val batchB = Seq(200L).toDF("doc_id")
    val pairsB = Seq((200L, 4L), (200L, 6L)).toDF("a", "b")
    ClusterIndex.foldBatch(path, batchB, "doc_id", pairsB, "a", "b", 1L)

    val expected = asMap(Clusters.resolve(
      corpus.unionByName(batchA).unionByName(batchB), "doc_id",
      corpusPairs.unionByName(pairsA).unionByName(pairsB), "a", "b"))
    val got = asMap(ClusterIndex.open(spark, path))
    assert(got == expected)
    // the chained merge really happened: all of {1..6,100,200} → 1
    assert(Seq(2L, 3L, 4L, 5L, 6L, 100L, 200L).forall(got(_) == 1L))
    assert(got(101L) == 101L && got(7L) == 7L)

    // keeper flag: exactly the docs that are their own label
    val k = ClusterIndex.openWithKeeper(spark, path)
      .filter(col("keeper") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(k == got.values.toSet)
    ClusterIndex.delete(spark, path)
  }

  test("openAt pins the as-of view: later folds' rows AND relabel maps are both excluded") {
    import spark.implicits._
    val corpus = (1L to 10L).toDF("doc_id")
    val corpusPairs = Seq((2L, 1L), (4L, 3L), (6L, 5L)).toDF("a", "b")
    val base = Clusters.resolve(corpus, "doc_id", corpusPairs, "a", "b")
      .select("doc_id", "cluster")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(base, path)
    ClusterIndex.foldBatch(path, Seq(100L).toDF("doc_id"),
      "doc_id", Seq((100L, 2L), (100L, 4L)).toDF("a", "b"), "a", "b", 0L)
    val asOf0 = asMap(ClusterIndex.open(spark, path))
    // batch 1 merges the family with {5,6}: its relabel entry maps a
    // label batch-0 rows CARRY (3→1 composed), so a view at batch 0
    // that applied the full chain would relabel rows its own clock
    // has not seen merged — the chain must bound with the rows
    ClusterIndex.foldBatch(path, Seq(200L).toDF("doc_id"),
      "doc_id", Seq((200L, 4L), (200L, 6L)).toDF("a", "b"), "a", "b", 1L)
    assert(asMap(ClusterIndex.openAt(spark, path, 0L)) == asOf0,
      "openAt(0) must equal what open() answered before batch 1")
    assert(asMap(ClusterIndex.openAt(spark, path, 1L)) ==
      asMap(ClusterIndex.open(spark, path)),
      "openAt at the watermark must equal the live open")
    assert(asMap(ClusterIndex.openAt(spark, path,
      graft.sources.StandingStore.BaseBatch)) == asMap(base),
      "openAt at the base must equal the snapshot as written")
    // the collapse floor travels through the custom compact body
    ClusterIndex.compactThrough(spark, path, 0L)
    assert(ClusterIndex.batchWatermark(spark, path) == 1L)
    intercept[IllegalArgumentException] {
      ClusterIndex.openAt(spark, path, graft.sources.StandingStore.BaseBatch)
    }
    assert(asMap(ClusterIndex.openAt(spark, path, 0L)) == asOf0,
      "the as-of view must survive its folds' collapse into the base")
    ClusterIndex.delete(spark, path)
  }

  test("a second SparkSession opens the table a prior session folded") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (4L, 3L)).toDF("a", "b")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id", pairs, "a", "b")
        .select("doc_id", "cluster"), path)
    val batch = Seq(50L).toDF("doc_id")
    ClusterIndex.foldBatch(path, batch, "doc_id",
      Seq((50L, 2L), (50L, 3L)).toDF("a", "b"), "a", "b", 0L)
    val first = asMap(ClusterIndex.open(spark, path))

    // a FRESH session (own state, no RAM caches) probes the same
    // at-rest table — the cross-session durability the session-RAM
    // assignment cache cannot provide
    val session2 = spark.newSession()
    val second = asMap(ClusterIndex.open(session2, path))
    assert(second == first)
    assert(Seq(1L, 2L, 3L, 4L, 50L).forall(second(_) == 1L))
    ClusterIndex.delete(spark, path)
  }

  test("replaying a fold with the same batch id leaves the table unchanged") {
    import spark.implicits._
    val corpus = (1L to 8L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (6L, 5L)).toDF("a", "b")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id", pairs, "a", "b")
        .select("doc_id", "cluster"), path)
    val batch = Seq(100L).toDF("doc_id")
    val batchPairs = Seq((100L, 1L), (100L, 5L)).toDF("a", "b")
    ClusterIndex.foldBatch(path, batch, "doc_id", batchPairs, "a", "b", 3L)
    val once = asMap(ClusterIndex.open(spark, path))
    val rowsOnce = ClusterIndex.open(spark, path).count()

    // at-least-once redelivery: the SAME batch id replays against a
    // table its first play already changed — the dynamic partition
    // overwrite plus the batch-id endpoint guard must converge to the
    // identical composed answer, not duplicate or re-singleton rows
    ClusterIndex.foldBatch(path, batch, "doc_id", batchPairs, "a", "b", 3L)
    assert(asMap(ClusterIndex.open(spark, path)) == once)
    assert(ClusterIndex.open(spark, path).count() == rowsOnce)
    assert(once(100L) == 1L && once(5L) == 1L && once(6L) == 1L)
    ClusterIndex.delete(spark, path)
  }

  test("compact rewrites the base, resets the chain, and preserves the answer") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (4L, 3L)).toDF("a", "b")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id", pairs, "a", "b")
        .select("doc_id", "cluster"), path)
    ClusterIndex.foldBatch(path, Seq(70L).toDF("doc_id"),
      "doc_id", Seq((70L, 2L), (70L, 4L)).toDF("a", "b"), "a", "b", 0L)
    val before = asMap(ClusterIndex.open(spark, path))
    assert(spark.read.parquet(s"$path/relabel").count() > 0)
    assert(ClusterIndex.foldCount(spark, path) == 1)

    // the cadence dial: not due below the threshold, compacts at it
    assert(!ClusterIndex.maintain(spark, path, maxFolds = 2))
    assert(ClusterIndex.maintain(spark, path, maxFolds = 1))
    assert(ClusterIndex.foldCount(spark, path) == 0)
    assert(asMap(ClusterIndex.open(spark, path)) == before)
    // sized rewrite: the compacted base is a single file at this scale
    assert(new java.io.File(s"$path/assignments/__batch=-1")
      .listFiles().count(_.getName.endsWith(".parquet")) == 1)

    ClusterIndex.compact(spark, path)
    assert(asMap(ClusterIndex.open(spark, path)) == before)
    // the chain is reset and the labels are baked into the base
    // (explicit schema: the reset chain is an empty partitioned dir)
    assert(spark.read
      .schema("old_cluster LONG, new_cluster LONG, __batch LONG")
      .parquet(s"$path/relabel").count() == 0)
    val batches = spark.read.parquet(s"$path/assignments")
      .select(col("__batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(batches == Seq(ClusterIndex.BaseBatch))
    ClusterIndex.delete(spark, path)
  }

  test("compactThrough folds only settled batches; a replayed left-alone batch converges") {
    import spark.implicits._
    val corpus = (1L to 10L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (4L, 3L), (6L, 5L)).toDF("a", "b")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id", pairs, "a", "b")
        .select("doc_id", "cluster"), path)
    // batch 0 (settled) merges {1,2}+{3,4}; batch 1 (in flight)
    // merges the result with {5,6} — ITS map keys the batch-0
    // terminal label, the cross-boundary composition under test
    ClusterIndex.foldBatch(path, Seq(100L).toDF("doc_id"),
      "doc_id", Seq((100L, 2L), (100L, 4L)).toDF("a", "b"), "a", "b", 0L)
    val pairs1 = Seq((200L, 4L), (200L, 6L)).toDF("a", "b")
    ClusterIndex.foldBatch(path, Seq(200L).toDF("doc_id"),
      "doc_id", pairs1, "a", "b", 1L)
    val before = asMap(ClusterIndex.open(spark, path))
    assert(before(200L) == 1L && before(6L) == 1L)

    // in-loop cadence from foreachBatch(2): only batch 0 is settled —
    // one settled fold < dial 2 means not due; dial 1 compacts
    assert(!ClusterIndex.maintainThrough(spark, path, maxFolds = 2,
      throughBatch = 1L - 1))
    assert(ClusterIndex.maintainThrough(spark, path, maxFolds = 1,
      throughBatch = 1L - 1))
    def batchDirs(table: String): Set[String] =
      new java.io.File(s"$path/$table").listFiles()
        .filter(_.isDirectory).filterNot(_.getName.startsWith("."))
        .map(_.getName).toSet
    // batch 0 folded into the base; batch 1's partitions still stand
    assert(batchDirs("assignments") == Set("__batch=-1", "__batch=1"))
    assert(batchDirs("relabel").contains("__batch=1") &&
      !batchDirs("relabel").contains("__batch=0"))
    // the composed answer is untouched: batch 1's kept map applies
    // over the settled base exactly as it did over the partitions
    assert(asMap(ClusterIndex.open(spark, path)) == before)

    // the capability the settled bound buys: REPLAYING the left-alone
    // batch across the compaction converges (its overwrite re-lands
    // identical content against the unchanged settled labels)
    ClusterIndex.foldBatch(path, Seq(200L).toDF("doc_id"),
      "doc_id", pairs1, "a", "b", 1L)
    assert(asMap(ClusterIndex.open(spark, path)) == before)
    assert(ClusterIndex.open(spark, path).count() == before.size.toLong)

    // once batch 1 settles, the full compact bakes everything
    ClusterIndex.compact(spark, path)
    assert(asMap(ClusterIndex.open(spark, path)) == before)
    assert(batchDirs("assignments") == Set("__batch=-1"))
    ClusterIndex.delete(spark, path)
  }

  test("open memoizes the composed relabel chain until a fold changes it") {
    import spark.implicits._
    val corpus = (1L to 8L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (4L, 3L)).toDF("a", "b")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id", pairs, "a", "b")
        .select("doc_id", "cluster"), path)
    ClusterIndex.foldBatch(path, Seq(70L).toDF("doc_id"),
      "doc_id", Seq((70L, 2L), (70L, 4L)).toDF("a", "b"), "a", "b", 0L)
    val first = asMap(ClusterIndex.open(spark, path))
    val composesAfterFirst = ClusterIndex.chainComposes.get()
    // probe-heavy consumer: repeated opens — and a SECOND session's
    // open (the cache keys on the at-rest listing, not the session) —
    // must serve the chain from the memo, no relabel collect
    assert(asMap(ClusterIndex.open(spark, path)) == first)
    assert(asMap(ClusterIndex.open(spark.newSession(), path)) == first)
    assert(ClusterIndex.chainComposes.get() == composesAfterFirst,
      "a re-open re-collected the relabel chain")
    // a new fold rewrites the relabel dir: the fingerprint changes,
    // the memo invalidates, and the composed answer stays right
    ClusterIndex.foldBatch(path, Seq(80L).toDF("doc_id"),
      "doc_id", Seq((80L, 6L), (80L, 70L)).toDF("a", "b"), "a", "b", 1L)
    val second = asMap(ClusterIndex.open(spark, path))
    assert(ClusterIndex.chainComposes.get() > composesAfterFirst,
      "the changed chain must be re-composed")
    assert(second(80L) == 1L && second(6L) == 1L && second(70L) == 1L)
    assert(asMap(ClusterIndex.open(spark, path)) == second)
    ClusterIndex.delete(spark, path)
  }

  test("compact crash BETWEEN the two swaps: stale chain chases to a no-op, recovery finishes") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (4L, 3L)).toDF("a", "b")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id", pairs, "a", "b")
        .select("doc_id", "cluster"), path)
    ClusterIndex.foldBatch(path, Seq(70L).toDF("doc_id"),
      "doc_id", Seq((70L, 2L), (70L, 4L)).toDF("a", "b"), "a", "b", 0L)
    val before = asMap(ClusterIndex.open(spark, path))
    // stage the compact (under the lease, like the real verb), then
    // crash after the FIRST swap (assignments): the live table holds
    // terminal labels beside the STALE chain
    graft.sources.Lease.withLease(spark, path) {
      ClusterIndex.stageCompact(spark, path)
      graft.sources.DirSwap.commitSwaps(spark, path,
        Seq("assignments", "relabel"), upTo = 1)
    }
    assert(spark.read
      .schema("old_cluster LONG, new_cluster LONG, __batch LONG")
      .parquet(s"$path/relabel").count() > 0, "mixed-state fixture")
    // the ORDER argument, before any recovery: compacted labels are
    // terminal (never relabel keys), so the stale chain composes to a
    // no-op and open() still answers correctly
    assert(asMap(ClusterIndex.open(spark, path)) == before)
    // the next fold's recovery preamble rolls the relabel swap forward
    ClusterIndex.foldBatch(path, Seq(80L).toDF("doc_id"),
      "doc_id", Seq((80L, 70L)).toDF("a", "b"), "a", "b", 1L)
    val got = asMap(ClusterIndex.open(spark, path))
    assert(got == before + (80L -> before(70L)))
    // exactly one fold partition stands — the compacted base absorbed
    // batch 0, so the chain reset really landed
    assert(ClusterIndex.foldCount(spark, path) == 1)
    ClusterIndex.delete(spark, path)
  }

  test("rewriting over a prior table fails fast mid-crash, never composes the stale chain") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (4L, 3L)).toDF("a", "b")
    val path = fixtureRoot() + "/idx"
    ClusterIndex.write(
      Clusters.resolve(corpus, "doc_id", pairs, "a", "b")
        .select("doc_id", "cluster"), path)
    ClusterIndex.foldBatch(path, Seq(70L).toDF("doc_id"),
      "doc_id", Seq((70L, 2L), (70L, 4L)).toDF("a", "b"), "a", "b", 0L)
    assert(spark.read.parquet(s"$path/relabel").count() > 0)
    // simulate write() crashing after it dropped the old chain: the
    // table must fail FAST (missing relabel), not silently relabel
    // fresh clusters through merges from the previous snapshot
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/relabel"), true)
    intercept[Exception] { ClusterIndex.open(spark, path).collect() }
    // re-running the write (the documented repair) heals to exactly
    // the new snapshot's labels
    val fresh = (1L to 8L).toDF("doc_id")
      .withColumn("cluster", col("doc_id"))
    ClusterIndex.write(fresh, path)
    assert(asMap(ClusterIndex.open(spark, path)) ==
      (1L to 8L).map(i => i -> i).toMap)
    ClusterIndex.delete(spark, path)
  }

  test("q_dedup_clusters_atrest equals the in-RAM incremental answer on testdata") {
    val sf = "/root/testdata/sf0.001"
    val atRest = SparkEntry.queries("q_dedup_clusters_atrest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val inRam = SparkEntry.queries("q_dedup_clusters_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(atRest.nonEmpty && atRest == inRam)
  }

  test("stageCompact without the lease throws before touching the root") {
    // the staging seam's mechanical precondition, fired (VERDICT r18
    // #2): a never-built path proves the require precedes all work
    val path = fixtureRoot() + "/never-built"
    val e = intercept[IllegalArgumentException] {
      ClusterIndex.stageCompact(spark, path)
    }
    assert(e.getMessage.contains(s"requires the $path lease"),
      s"the guard must name the root and the remedy: ${e.getMessage}")
  }
}
