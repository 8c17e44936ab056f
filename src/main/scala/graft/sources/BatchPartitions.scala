package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Listing-only view of the `__batch=<b>` partition scheme every
 * standing table here shares (curated corpus, cluster index, IVF
 * corpus): batch ids are read from DIRECTORY NAMES, never from data,
 * so watermarks, fold counts, and maintenance dials stay O(listing)
 * at any corpus size. One implementation — the counters that key on
 * it must not be able to diverge.
 */
object BatchPartitions {

  private val Part = "^__batch=(-?\\d+)$".r

  /** All batch ids present under `dir` (including the base marker).
    * `nested = true` looks one level down first — the
    * `cell=<i>/__batch=<b>` two-level layout. */
  def ids(spark: SparkSession, dir: String,
      nested: Boolean = false): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots =
      if (nested) fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
      else Seq(p)
    roots
      .flatMap(r => fs.listStatus(r).toSeq.filter(_.isDirectory))
      .flatMap(_.getPath.getName match {
        case Part(n) => Some(n.toLong)
        case _ => None
      })
      .distinct
  }
}
