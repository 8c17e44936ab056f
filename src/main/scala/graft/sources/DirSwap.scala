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
 * no crash loses rows. The only non-live window is a dir between its
 * two renames; [[recover]] finishes exactly that case (live missing,
 * staging fully written) and prunes leftovers, and is safe to run on a
 * healthy root — compaction entry points call it first, so "re-run the
 * compact" is the whole repair story.
 *
 * SINGLE-WRITER contract: the compactor must be the table's own
 * fold/append loop (the in-loop `maintain`/`compactEvery` dials) or an
 * exclusive maintainer. Staging is a point-in-time snapshot and the
 * swap prunes the live dir it replaces, so a SECOND process landing a
 * partition between the staging read and the swap would have that
 * write silently destroyed — the same serialize-your-writers rule as
 * `IvfIndex.ensure`, enforced by deployment (a lock), not by this
 * helper.
 */
object DirSwap {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Staging location for `table` under `root` — write the
    * replacement here, fully, before [[swapStaged]]. */
  def stagingDir(root: String, table: String): String =
    s"$root/.compact/$table"

  /** Swap every staged `tables` dir in, then prune the retired dirs
    * and the staging root. Requires each staging dir to be fully
    * written (`_SUCCESS` present). */
  def swapStaged(spark: SparkSession, root: String,
      tables: Seq[String]): Unit = {
    val fs = fsOf(spark, root)
    tables.foreach { t =>
      require(fs.exists(new Path(s"${stagingDir(root, t)}/_SUCCESS")),
        s"staging dir for $root/$t is not fully written")
    }
    tables.foreach { t =>
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
    // every swap landed — now (and only now) retire the old data
    (tables.map(t => s"$root/.old_$t") :+ s"$root/.compact")
      .foreach(d => fs.delete(new Path(d), true))
  }

  /** Finish a crashed swap: for each table whose live dir is missing
    * but whose fully-written staging copy exists, rename the staging
    * copy in; retired `.old_*` dirs are pruned once their live dir
    * exists again. No-op on a healthy root. */
  def recover(spark: SparkSession, root: String,
      tables: Seq[String]): Unit = {
    val fs = fsOf(spark, root)
    tables.foreach { t =>
      val (live, staged, old) = (new Path(s"$root/$t"),
        new Path(stagingDir(root, t)), new Path(s"$root/.old_$t"))
      if (!fs.exists(live) && fs.exists(staged) &&
        fs.exists(new Path(staged, "_SUCCESS")))
        require(fs.rename(staged, live), s"swap recovery failed for $live")
      if (fs.exists(live) && fs.exists(old)) { fs.delete(old, true); () }
    }
  }
}
