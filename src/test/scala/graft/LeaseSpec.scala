package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.{ClusterIndex, Clusters}
import graft.pipeline.{CuratedCorpus, Release}
import graft.sources.Lease

/** The mechanical single-writer guard: every standing-structure
  * maintenance entry point (compact / build / ensure) runs under its
  * root's lease, so two interleaved maintainers resolve as one winner
  * and one clean fail-fast refusal — never interleaved overwrites.
  * Also pins the recovery story: a dead holder's lease is broken
  * immediately, a stale one after its window, and an overrun holder's
  * release fails loudly instead of reporting success. */
class LeaseSpec extends SparkSpec {

  private val Src = "/root/testdata/sf0.001"

  /** Acquire `root`'s lease from a DIFFERENT thread — the same-JVM
    * stand-in for a second maintainer process (per-thread
    * re-entrancy means the calling thread would pass through). */
  private def acquireElsewhere(root: String,
      staleAfterMs: Long = Lease.DefaultStaleAfterMs): Lease.Held = {
    @volatile var held: Lease.Held = null
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try held = Lease.acquire(spark, root, staleAfterMs)
      catch { case e: Throwable => err = e }
    })
    t.start(); t.join()
    if (err != null) throw err
    held
  }

  test("two interleaved corpus maintainers: one winner, one clean refusal") {
    val path = Files.createTempDirectory("graft-lease").toString + "/cc"
    try {
      val docs = Tables(spark, Src, "documents")
      CuratedCorpus.init(docs.where(col("doc_id") % 2 === 0), path)
      CuratedCorpus.foldBatch(path, docs.where(col("doc_id") % 2 === 1), 0L)
      val before = CuratedCorpus.open(spark, path)
        .select("doc_id").collect().map(_.getLong(0)).toSet

      // maintainer B is mid-operation on the same root
      val other = acquireElsewhere(path)
      val refusal = intercept[Lease.HeldElsewhereException] {
        CuratedCorpus.compact(spark, path)
      }
      assert(refusal.getMessage.contains(path))
      // the refusal touched nothing: table identical, folds intact
      assert(CuratedCorpus.open(spark, path)
        .select("doc_id").collect().map(_.getLong(0)).toSet == before)
      assert(CuratedCorpus.foldCount(spark, path) == 1)

      // B finishes; the retried maintenance now wins
      other.release()
      CuratedCorpus.compact(spark, path)
      assert(CuratedCorpus.open(spark, path)
        .select("doc_id").collect().map(_.getLong(0)).toSet == before)
      assert(CuratedCorpus.foldCount(spark, path) == 0)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("cluster-index and release maintainers are refused while the root is held") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-lease").toString + "/idx"
    val rel = Files.createTempDirectory("graft-lease").toString + "/rel"
    val cc = Files.createTempDirectory("graft-lease").toString + "/cc"
    try {
      ClusterIndex.write(
        Clusters.resolve((1L to 4L).toDF("doc_id"), "doc_id",
          Seq((2L, 1L)).toDF("a", "b"), "a", "b")
          .select("doc_id", "cluster"), idx)
      val held = acquireElsewhere(idx)
      intercept[Lease.HeldElsewhereException] {
        ClusterIndex.compact(spark, idx)
      }
      held.release()
      ClusterIndex.compact(spark, idx) // and the retry is clean

      CuratedCorpus.init(Tables(spark, Src, "documents"), cc)
      val heldRel = acquireElsewhere(rel)
      intercept[Lease.HeldElsewhereException] {
        Release.maintainFromCorpus(spark, cc, rel, Release.Seed,
          Release.Budget, Release.Shards, everyBatches = 1)
      }
      assert(Release.latestVersion(spark, rel).isEmpty,
        "a refused maintainer must not leave a partial version")
      heldRel.release()
      assert(Release.maintainFromCorpus(spark, cc, rel, Release.Seed,
        Release.Budget, Release.Shards, everyBatches = 1).contains(1))
    } finally {
      ClusterIndex.delete(spark, idx)
      Release.delete(spark, rel)
      CuratedCorpus.delete(spark, cc)
    }
  }

  test("ensure: reuse path ignores a held lease; build path is refused, retry reuses") {
    import graft.ann.{IvfIndex, Similarity}
    val base = Files.createTempDirectory("graft-lease").toString
    val path = IvfIndex.snapshotPath(base, "v1")
    val emb = Tables(spark, Src, "embeddings")
    def train() = Similarity.trainCentroids(emb, "vec_id", "embedding", 4)

    // an INCOMPLETE index whose root another maintainer holds: the
    // build path must refuse, not interleave a second write
    val held = acquireElsewhere(path)
    intercept[Lease.HeldElsewhereException] {
      IvfIndex.ensure(emb, "vec_id", "embedding", spark, path)(train())
    }
    held.release()
    val c1 = IvfIndex.ensure(emb, "vec_id", "embedding", spark, path)(train())
    assert(IvfIndex.isComplete(spark, path))

    // the reuse path is read-only — a held lease (a maintainer
    // compacting, say) must not block probers resolving centroids
    val heldAgain = acquireElsewhere(path)
    val c2 = IvfIndex.ensure(emb, "vec_id", "embedding", spark, path) {
      fail("complete index must reuse, not retrain"): Seq[Array[Double]]
    }
    heldAgain.release()
    assert(c2.map(_.toSeq) == c1.map(_.toSeq))
    IvfIndex.delete(spark, path)
  }

  test("a dead holder's lease is broken immediately; a live one only after its window") {
    val root = Files.createTempDirectory("graft-lease").toString + "/t"
    // forge a lease held by a dead local process (pid long past max)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$root/${Lease.FileName}")
    val host = java.net.InetAddress.getLocalHost.getHostName
    def forge(pid: Long, acquiredMs: Long): Unit = {
      val out = fs.create(p, true)
      try out.write(
        (s"""{"token":"forged","host":"$host","pid":$pid,""" +
          s""""acquired_ms":$acquiredMs,"stale_after_ms":3600000}""")
          .getBytes("UTF-8"))
      finally out.close()
    }
    forge(pid = 999999999L, acquiredMs = System.currentTimeMillis)
    // dead pid on this host → break in despite the fresh timestamp
    Lease.acquire(spark, root).release()

    // live pid (ours), fresh → refused; live pid but PAST the stale
    // window → broken, and the overrun holder's release fails loudly
    forge(ProcessHandle.current.pid, System.currentTimeMillis)
    intercept[Lease.HeldElsewhereException] { acquireElsewhere(root) }
    forge(ProcessHandle.current.pid,
      System.currentTimeMillis - 2 * 3600000)
    val winner = acquireElsewhere(root)
    winner.release()
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  test("release after an overrun surfaces the broken lease instead of silent success") {
    val root = Files.createTempDirectory("graft-lease").toString + "/t"
    val overrunner = acquireElsewhere(root, staleAfterMs = 0L)
    Thread.sleep(5)
    // a second maintainer legitimately breaks the 0ms-stale lease
    val second = acquireElsewhere(root)
    val e = intercept[IllegalStateException] { overrunner.release() }
    assert(e.getMessage.contains("broken"))
    second.release()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  test("a torn lease file (crash between create and write) breaks in after its grace") {
    val root = Files.createTempDirectory("graft-lease").toString + "/t"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$root/${Lease.FileName}")
    // empty lease file — the state a holder crashing between its
    // create and its record write leaves behind
    fs.create(p, true).close()
    // fresh: could be a racer mid-write — refused, not broken
    intercept[Lease.HeldElsewhereException] { Lease.acquire(spark, root) }
    // provably old: without a break-in path this would block the
    // root FOREVER (no record means no stale window to expire)
    fs.setTimes(p, System.currentTimeMillis - 2 * Lease.TornLeaseGraceMs, -1)
    Lease.acquire(spark, root).release()
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  test("withLease is re-entrant per thread: composed entry points share the outer lease") {
    val root = Files.createTempDirectory("graft-lease").toString + "/t"
    val got = Lease.withLease(spark, root) {
      // the inner acquisition (a cadence calling a build on the same
      // root) must pass through, not self-deadlock or self-refuse
      Lease.withLease(spark, root) { 41 } + 1
    }
    assert(got == 42)
    // fully released: a fresh maintainer acquires without contest
    Lease.acquire(spark, root).release()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }
}
