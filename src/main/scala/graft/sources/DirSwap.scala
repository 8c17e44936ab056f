package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Staged-directory swap for path-rooted standing tables — the
 * [[graft.operators.CdcOps.compactSnapshotRetained]] commit discipline
 * where the atomic unit is a directory rename instead of a metastore
 * handle. A compaction writes each table dir's replacement FULLY under
 * `root/.compact/<table>` (parquet's `_SUCCESS` is the staging commit
 * marker), then [[swapStaged]] renames each live dir aside and the
 * staged dir in, pruning the retired data strictly after every swap
 * landed.
 *
 * Crash contract: staging completes before any live dir is touched, so
 * no crash loses rows. [[swapStaged]] drops a SWAP-COMMIT marker
 * (`root/.compact/_SWAP`) after validating the staging and before the
 * first rename, so a multi-table swap is all-or-nothing under
 * [[recover]]: marker absent → no live dir was touched, the staging is
 * inert and the next compaction overwrites it; marker present → the
 * swap committed, and recover rolls every not-yet-swapped table
 * forward from its staged copy, finishes any dir caught between its
 * two renames, and prunes strictly after. Compaction and fold entry
 * points call [[recover]] first, so "re-run the operation" is the
 * whole repair story.
 *
 * TABLE ORDER matters to callers even so: between the crash and the
 * next recover, READERS (and a replaying fold's probe) see a mixed
 * state where a prefix of `tables` is compacted and the rest is not.
 * Order `tables` so every such prefix is benign — the
 * CONTENT-IDENTITY / dedup-probe table before the row tables it
 * guards ([[graft.pipeline.CuratedCorpus]]: hashes before docs, so a
 * replayed batch finds its content standing in the base and dedups to
 * zero), and any table whose compacted form is self-sufficient before
 * the metadata that rewrites it ([[graft.dedup.ClusterIndex]]:
 * assignments before relabel, so the stale chain applied to terminal
 * labels chases to a no-op). Each caller's compact scaladoc must
 * argue its own prefix states.
 *
 * SINGLE-WRITER contract: the compactor must be the table's own
 * fold/append loop (the in-loop `maintain`/`compactEvery` dials) or an
 * exclusive maintainer. Staging is a point-in-time snapshot and the
 * swap prunes the live dir it replaces, so a SECOND process landing a
 * partition between the staging read and the swap would have that
 * write silently destroyed. [[graft.sources.Lease]] is the mechanical
 * guard: maintenance entry points acquire one per table root, so a
 * concurrent maintainer fails fast instead of destroying writes.
 * Recover-before-stage is part of the same contract: entry points
 * recover BEFORE writing a new staging, so no stale `.old_*` or
 * staged dir from a prior crash survives into a fresh swap.
 */
object DirSwap {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Staging location for `table` under `root` — write the
    * replacement here, fully, before [[swapStaged]]. */
  def stagingDir(root: String, table: String): String =
    s"$root/.compact/$table"

  private def swapMarker(root: String) = new Path(s"$root/.compact/_SWAP")

  /** Swap every staged `tables` dir in, then prune the retired dirs
    * and the staging root. Requires each staging dir to be fully
    * written (`_SUCCESS` present). Order `tables` so every prefix is
    * a benign mixed state for readers (see class doc). */
  def swapStaged(spark: SparkSession, root: String,
      tables: Seq[String]): Unit = {
    val fs = fsOf(spark, root)
    commitSwaps(spark, root, tables, tables.size)
    // every swap landed — now (and only now) retire the old data (the
    // commit marker leaves with the staging root)
    (tables.map(t => s"$root/.old_$t") :+ s"$root/.compact")
      .foreach(d => fs.delete(new Path(d), true))
  }

  /** The validate → mark → swap prefix of [[swapStaged]], stopping
    * after `upTo` table swaps and never pruning — the crash-injection
    * seam the standing tables' crash-matrix specs drive. Production
    * code must call [[swapStaged]]. */
  private[graft] def commitSwaps(spark: SparkSession, root: String,
      tables: Seq[String], upTo: Int): Unit = {
    val fs = fsOf(spark, root)
    tables.foreach { t =>
      require(fs.exists(new Path(s"${stagingDir(root, t)}/_SUCCESS")),
        s"staging dir for $root/$t is not fully written")
    }
    // the swap's commit point: from here, recover() completes the
    // whole multi-table swap instead of leaving a mixed state standing
    fs.create(swapMarker(root), true).close()
    tables.take(upTo).foreach { t =>
      // a leftover .old_<t> (a prior swap that crashed post-swap,
      // pre-prune) must go first: renaming onto an existing directory
      // either nests the source inside it or fails — both checked
      // renames below would then corrupt or abort the swap
      fs.delete(new Path(s"$root/.old_$t"), true)
      require(fs.rename(new Path(s"$root/$t"), new Path(s"$root/.old_$t")),
        s"compact swap could not retire $root/$t")
      require(fs.rename(new Path(stagingDir(root, t)), new Path(s"$root/$t")),
        s"compact swap failed for $root/$t")
    }
  }

  /** Finish a crashed swap. Three repairs, each a no-op on a healthy
    * root: (1) a table whose live dir is missing but whose
    * fully-written staging copy exists gets the staging renamed in
    * (the crash landed between that table's two renames); (2) if the
    * swap-commit marker is present, every remaining staged table is
    * rolled FORWARD — the swap committed, so a mixed state must not
    * outlive recovery (a half-compacted CuratedCorpus would otherwise
    * strand doc folds whose hash partitions already collapsed);
    * (3) retired `.old_*` dirs are pruned once their live dir exists
    * again.
    *
    * Repair is for the DEAD. A `_SWAP` marker under a root whose
    * [[Lease]] names a LIVE owner is a healthy IN-FLIGHT swap — the
    * owner is between its marker drop and its prune — and is
    * indistinguishable on disk from a crash. A concurrent "repair"
    * would race the owner's renames over the same dirs (the
    * interleaving that consumes the staging and then retires the
    * freshly-installed live dir leaves the root with NO live copy —
    * a wedged table, not a failed compact). So recover SKIPS, whole,
    * when a live foreign owner holds the root, unless this thread is
    * that owner (the recover-before-stage preamble every leased
    * maintainer runs). Crashed holders read as not-live by the
    * lease's break-in rules (dead pid on this host immediately, the
    * stale window elsewhere), so a genuine crash is repaired by the
    * next caller the moment its lease is breakable — the same wait a
    * successor maintainer already accepts to acquire the root. */
  def recover(spark: SparkSession, root: String,
      tables: Seq[String]): Unit = {
    if (!Lease.heldByThisThread(root) && Lease.heldByLiveOwner(spark, root))
      return
    recoverUnconditionally(spark, root, tables)
  }

  /** [[recover]] for a WRITE preamble — a fold about to land a
    * partition. A READER tolerates deferring repair to a live foreign
    * owner (mixed swap states are benign to read, by the table-order
    * contract), but a WRITER must not land rows into a root whose
    * COMMITTED swap is still pending: the eventual roll-forward —
    * the owner's own completion, or the repair after its lease
    * breaks — replaces the live dirs with staged copies that predate
    * the write, silently DISCARDING it (and the stream's checkpoint
    * may already have committed the batch: permanent loss, not a
    * retry). So when repair is deferred and the root shows a
    * committed-swap state (`_SWAP` marker, or a missing live dir
    * beside a complete staged copy), this THROWS instead of
    * returning — the batch fails loudly and the at-least-once
    * redelivery retries after the owner finishes (marker gone) or
    * crashes into breakability (repair runs). A COMPLETE staging
    * under the live owner refuses too, marker or not: the owner's
    * swap is imminent and its staging read predates the write. What
    * this cannot detect is the owner still READING (nothing staged
    * yet) — that window is governed by the class doc's single-writer
    * contract (the compactor must BE the fold loop, or exclusive);
    * these refusals are defense-in-depth for the detectable states,
    * not a license to run ad-hoc compactions against a live fold
    * loop. */
  def recoverOrRefuseWrites(spark: SparkSession, root: String,
      tables: Seq[String]): Unit =
    if (!Lease.heldByThisThread(root) && Lease.heldByLiveOwner(spark, root)) {
      val fs = fsOf(spark, root)
      // a missing live dir counts only WITH swap evidence (a retired
      // `.old_` copy or a staging dir): a never-created table on a
      // fresh root is not a mid-rename window, and refusing it would
      // wedge the root's first write for as long as any foreign
      // thread holds the lease
      val pending = fs.exists(swapMarker(root)) || tables.exists { t =>
        val missingLive = !fs.exists(new Path(s"$root/$t"))
        val swapEvidence = fs.exists(new Path(s"$root/.old_$t")) ||
          fs.exists(new Path(stagingDir(root, t)))
        fs.exists(new Path(s"${stagingDir(root, t)}/_SUCCESS")) ||
          (missingLive && swapEvidence)
      }
      if (pending) throw new IllegalStateException(
        s"$root has a swap pending (committed, staged, or mid-rename) " +
          "under a live foreign lease — refusing to land writes the " +
          "swap would discard; redeliver once the owner finishes (or " +
          "its lease breaks)")
    } else recoverUnconditionally(spark, root, tables)

  private def recoverUnconditionally(spark: SparkSession, root: String,
      tables: Seq[String]): Unit = {
    val fs = fsOf(spark, root)
    def live(t: String) = new Path(s"$root/$t")
    def staged(t: String) = new Path(stagingDir(root, t))
    def stagedComplete(t: String) =
      fs.exists(new Path(staged(t), "_SUCCESS"))
    tables.foreach { t =>
      if (!fs.exists(live(t)) && stagedComplete(t))
        require(fs.rename(staged(t), live(t)),
          s"swap recovery failed for ${live(t)}")
    }
    if (fs.exists(swapMarker(root))) {
      // committed: any table still holding a complete staged copy has
      // not swapped yet (a missing live dir was consumed above) —
      // finish its swap exactly as swapStaged would have
      tables.foreach { t =>
        if (stagedComplete(t)) {
          fs.delete(new Path(s"$root/.old_$t"), true)
          require(fs.rename(live(t), new Path(s"$root/.old_$t")),
            s"swap roll-forward could not retire ${live(t)}")
          require(fs.rename(staged(t), live(t)),
            s"swap roll-forward failed for ${live(t)}")
        }
      }
      fs.delete(new Path(s"$root/.compact"), true)
    }
    tables.foreach { t =>
      val old = new Path(s"$root/.old_$t")
      if (fs.exists(live(t)) && fs.exists(old)) { fs.delete(old, true); () }
    }
  }
}
