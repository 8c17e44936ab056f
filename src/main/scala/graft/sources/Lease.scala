package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Best-effort SINGLE-WRITER lease for a standing structure's root —
 * the mechanical guard behind the serialize-your-maintainers contract
 * every standing table here documents ([[DirSwap]],
 * [[graft.pipeline.Release.maintainFromCorpus]],
 * [[graft.ann.IvfIndex.ensure]]). A maintenance entry point
 * (compact / build / ensure) acquires the lease for the root it is
 * about to rewrite; a SECOND concurrent maintainer fails fast with
 * [[Lease.HeldElsewhereException]] instead of silently destroying a
 * landed partition — the failure mode a scheduler retrying a "stuck"
 * job would otherwise hit exactly once per incident, at the worst
 * possible moment.
 *
 * Mechanics: one file at `root/.lease`, created with
 * `FileSystem.create(path, overwrite = false)` — atomic on HDFS-like
 * stores, best-effort (existence-check-then-create) on the local FS —
 * holding a JSON record of the owner: a random token, `host:pid`, and
 * the acquisition time with a stale-after window.
 *
 * Break-in rules, in order:
 *   1. the holder is a DEAD process on THIS host (pid not alive) —
 *      break immediately: a crashed maintainer must not stall its own
 *      restart for the stale window;
 *   2. the record is older than its stale-after window — break: the
 *      holder is presumed dead on another host (or wedged past any
 *      reasonable run time — size `staleAfterMs` beyond the longest
 *      maintenance operation).
 *
 * Stale-lease recovery story: a maintainer that dies holding the
 * lease leaves the file behind; the next maintainer breaks in by rule
 * 1 (same host) or rule 2 (elsewhere), and the structure's own crash
 * contract ([[DirSwap.recover]], commit markers) makes the re-run
 * safe. A LIVE holder that overran the stale window can be broken by
 * rule 2 — that race is fundamental to lease-by-file — but it is
 * surfaced loudly: [[Lease.Held.release]] re-reads the file and
 * throws if the token changed, so the overrunning maintainer's run
 * fails instead of reporting success over a root someone else now
 * owns. (The staged-swap discipline bounds the damage meanwhile:
 * both writers stage before swapping, so the loser's work is wasted,
 * not interleaved.)
 *
 * Re-entrancy is per THREAD: a maintainer composing entry points on
 * one root (the release cadence calling the build; a fold loop's
 * in-line `maintain`) passes through [[withLease]] without
 * re-acquiring. A different thread — same JVM or not — is a different
 * maintainer and is refused.
 */
object Lease {

  /** The lease file's name under the structure root. */
  val FileName = ".lease"

  /** Default stale-after: one hour — beyond any maintenance op here,
    * short enough that a crashed remote holder clears within an
    * operational response time. */
  val DefaultStaleAfterMs: Long = 60L * 60 * 1000

  /** Grace for a lease file that EXISTS but carries no parseable
    * record: microseconds-fresh means a racer between its create and
    * its write (back off); older than this means a holder that
    * crashed mid-acquire and would otherwise block the root forever
    * (break in). */
  val TornLeaseGraceMs: Long = 60L * 1000

  /** Another maintainer holds the root. Fail-fast signal — do NOT
    * retry in a loop; the holder's cadence owns the root. */
  final class HeldElsewhereException(msg: String)
    extends IllegalStateException(msg)

  /** A held lease; [[release]] deletes the file after verifying the
    * token is still ours. */
  final class Held private[Lease] (spark: SparkSession, root: String,
      token: String) {
    def release(): Unit = {
      val p = leasePath(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val current = readRecord(spark, root)
      heldRoots.get().remove(root)
      if (!current.exists(_.token == token))
        throw new IllegalStateException(
          s"lease on $root was broken while held (stale window overrun?) — " +
            "this maintainer's writes past the window raced another owner")
      fs.delete(p, false)
      ()
    }
  }

  private def leasePath(root: String) = new Path(s"$root/$FileName")

  private final case class Record(token: String, host: String, pid: Long,
    acquiredMs: Long, staleAfterMs: Long)

  // roots leased by THIS thread — the re-entrancy ledger
  private val heldRoots = ThreadLocal.withInitial(() =>
    new java.util.HashSet[String]())

  private def localHost: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "unknown-host" }

  /** Hostnames that do NOT identify a machine: two containers both
    * reporting one of these must never conclude "same host, pid
    * dead" about each other — only the stale window may break their
    * leases. (Two DISTINCT machines sharing a real hostname remain a
    * deployment caveat; the stale window is the backstop.) */
  private def confidentHost(h: String): Boolean =
    h.nonEmpty && h != "unknown-host" && h != "localhost" &&
      h != "localhost.localdomain"

  private def breakable(r: Record): Boolean = {
    val holder = ProcessHandle.of(r.pid)
    val deadHere = confidentHost(r.host) && r.host == localHost &&
      !(holder.isPresent && holder.get.isAlive)
    deadHere || System.currentTimeMillis - r.acquiredMs > r.staleAfterMs
  }

  /** True iff THIS thread holds `root`'s lease — the re-entrancy
    * ledger's public face, for a verb that must behave differently
    * under its own lease than beside someone else's
    * ([[DirSwap.recover]] repairs under its caller's lease but defers
    * to a live foreign owner). */
  def heldByThisThread(root: String): Boolean =
    heldRoots.get().contains(root)

  /** True iff `root`'s lease file names an owner still live by the
    * break-in rules — the check a SCANNER (e.g. snapshot retention)
    * uses to leave an in-flight build's root alone without acquiring
    * anything. A torn-fresh file (racer mid-write) counts as live. */
  def heldByLiveOwner(spark: SparkSession, root: String): Boolean = {
    val p = leasePath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readRecord(spark, root) match {
      case Some(r) => !breakable(r)
      case None => fs.exists(p) &&
        System.currentTimeMillis -
          fs.getFileStatus(p).getModificationTime <= TornLeaseGraceMs
    }
  }

  private def readRecord(spark: SparkSession,
      root: String): Option[Record] = {
    val p = leasePath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def str(k: String) =
        ("\"" + k + "\":\"([^\"]*)\"").r.findFirstMatchIn(s).map(_.group(1))
      def num(k: String) =
        ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(s)
          .map(_.group(1).toLong)
      for {
        t <- str("token"); h <- str("host"); pid <- num("pid")
        acq <- num("acquired_ms"); stale <- num("stale_after_ms")
      } yield Record(t, h, pid, acq, stale)
    } catch { case _: java.io.IOException => None } // torn read: racer won
  }

  /** Acquire the root's lease or throw [[HeldElsewhereException]].
    * Prefer [[withLease]], which releases on every exit path. */
  def acquire(spark: SparkSession, root: String,
      staleAfterMs: Long = DefaultStaleAfterMs): Held = {
    val p = leasePath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = java.util.UUID.randomUUID().toString
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(
          (s"""{"token":"$token","host":"${localHost}",""" +
            s""""pid":${ProcessHandle.current.pid},""" +
            s""""acquired_ms":${System.currentTimeMillis},""" +
            s""""stale_after_ms":$staleAfterMs}""").getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      readRecord(spark, root) match {
        case Some(r) if breakable(r) =>
          fs.delete(p, false) // break the dead holder's lease, then race
          if (!tryCreate())
            throw new HeldElsewhereException(
              s"lost the break-in race for $root — another maintainer won")
        case Some(r) =>
          throw new HeldElsewhereException(
            s"$root is being maintained by ${r.host}:${r.pid} " +
              s"(lease age ${System.currentTimeMillis - r.acquiredMs} ms, " +
              s"stale after ${r.staleAfterMs} ms) — one maintainer per root")
        case None if !fs.exists(p) =>
          // vanished between create-failure and read: the holder
          // released; one immediate retry, then defer to the winner
          if (!tryCreate())
            throw new HeldElsewhereException(
              s"$root lease contended — another maintainer is active")
        case None =>
          // exists but unreadable: a racer mid-write (fresh — back
          // off) or a holder that crashed between create and write
          // (torn forever — break in once provably old, else every
          // future maintainer would be refused by an empty file)
          val age = System.currentTimeMillis -
            fs.getFileStatus(p).getModificationTime
          if (age <= TornLeaseGraceMs)
            throw new HeldElsewhereException(
              s"$root lease is being written by another maintainer")
          fs.delete(p, false)
          if (!tryCreate())
            throw new HeldElsewhereException(
              s"lost the torn-lease break-in race for $root")
      }
    }
    heldRoots.get().add(root)
    new Held(spark, root, token)
  }

  /**
   * Run an IN-LOOP MAINTENANCE CADENCE tolerating a concurrent
   * maintainer: [[HeldElsewhereException]] is fail-fast by design for
   * a standalone maintenance JOB (the holder's cadence owns the
   * root), but a cadence riding inside a production stream's
   * `foreachBatch` must not let an ad-hoc compact against its root
   * abort the stream — the right unit to fail is the tick, not the
   * query. Returns `Right(result)` or `Left(refusalMessage)`; the
   * caller skips the tick, surfaces the message, and retries next
   * batch. The FOLD must stay OUTSIDE this wrapper: folds are
   * replay-idempotent and unleased by design, so they never refuse —
   * wrapping one would only hide a real failure.
   */
  def cadence[A](body: => A): Either[String, A] =
    try Right(body)
    catch { case e: HeldElsewhereException => Left(e.getMessage) }

  /** [[cadence]] with the stream routers' shared skip policy: a
    * refusal surfaces through `onRefused` and counts as "did not
    * compact" — one implementation, so the policy cannot drift
    * between routers. */
  def cadenceOrSkip(onRefused: String => Unit)(body: => Boolean): Boolean =
    cadence(body) match {
      case Right(r) => r
      case Left(msg) => onRefused(msg); false
    }

  /** Run `body` holding the root's lease, releasing on every exit
    * path. Re-entrant per thread: if THIS thread already holds the
    * root (an outer entry point on the same structure), the body runs
    * under the outer lease. */
  def withLease[A](spark: SparkSession, root: String,
      staleAfterMs: Long = DefaultStaleAfterMs)(body: => A): A =
    if (heldRoots.get().contains(root)) body
    else {
      val h = acquire(spark, root, staleAfterMs)
      var primary: Throwable = null
      try body
      catch { case t: Throwable => primary = t; throw t }
      finally {
        try h.release()
        catch {
          case t: Throwable =>
            if (primary != null) primary.addSuppressed(t) else throw t
        }
      }
    }
}
