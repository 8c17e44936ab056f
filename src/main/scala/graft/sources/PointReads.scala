package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Driver-bounded POINT READS of a key-sorted parquet table — the read
 * side of the [[Layout]] discipline: [[Layout.writeRangeSorted]] (and
 * every sorted fold partition here) gives each parquet page a narrow
 * `[min, max]` slice of the key domain; a pushed set-of-keys predicate
 * then skips every page containing no probe key, so the scan reads
 * `O(|keys| · pageRows)` rows no matter how large the table is. This
 * is what turns a standing index's per-batch probe from
 * corpus-proportional into batch-proportional at 100 TB.
 *
 * Why not plain `isin`: Spark translates a large IN to parquet's
 * NATIVE set predicate (`FilterApi.in`, above
 * `spark.sql.parquet.pushdown.inFilterThreshold`), which the parquet
 * column index evaluates only coarsely — measured here, a
 * 200-scattered-key probe of a sorted 1M-row table reads 743k rows
 * under native IN vs 109k under or-of-equalities. Below the
 * threshold Spark builds the or-of-eq form itself, but as a
 * LEFT-DEEP chain whose recursive parquet stats visitor overflows
 * the stack near ~2000 keys. [[keyedFilter]] therefore pushes a
 * BALANCED or-of-eq tree (visitor depth log₂ |keys|, no overflow at
 * any capped size, full page-granular skipping) AND'd with `isin`,
 * whose InSet hash-set makes the surviving rows' Spark-side filter
 * O(1) per row — the or-branch short-circuits to true matches only.
 *
 * Key-set sizes are CAPPED ([[MaxKeys]], the
 * [[graft.dedup.Sampling]] driver-collect discipline): the filter
 * expression carries one literal per key, so an uncapped set would
 * trade an executor scan for a driver/planner blow-up. Callers fall
 * back to their scan-shaped plan above the cap — correct either way,
 * the cap only picks which side pays.
 *
 * Contract for index layouts that want bounded probes (the
 * [[graft.dedup.SignatureIndex]] / embedding-twin discipline):
 * sort the probed column within files at write AND compact time, and
 * keep pages small on narrow rows
 * (`parquet.page.row.count.limit`, [[PageRowLimit]]) — page rows are
 * the constant factor in the probe's read bound.
 */
object PointReads {

  /** Cap on driver-collected probe keys — a MEASURED planner-cost
    * cutover, not a correctness bound: the filter costs ~1.5 ms/key
    * of driver-side analysis + codegen + pushdown translation
    * (measured on this box: 2k keys ≈ 1 s, 4k ≈ 3 s, 16k ≈ 22 s,
    * 64k ≈ 100 s, linear), and past a few seconds that SERIAL driver
    * time loses to the distributed scan the point read avoids — the
    * scan parallelizes, the planner does not. 4096 keys ≈ 3 s of
    * driver work per probe, comfortably under a micro-batch cadence,
    * and covers a ~1k-document batch at typical band counts; a batch
    * large enough to overflow it is no longer a micro-batch and
    * amortizes the scan it falls back to. PointReadsSpec exercises
    * the filter AT this cap end to end. */
  val MaxKeys: Int = 4096

  /** Page row limit for NARROW sorted index tables (band keys,
    * candidate ids): 40-byte rows never hit the 1 MB page-size flush,
    * so without this one page can hold 20k rows and a point probe
    * reads 20k rows per key. */
  val PageRowLimit: Int = 512

  /** The pushdown-precise set filter: `key ∈ keys` as
    * `isin && balanced-or-of-eq` (see class doc). Empty key set →
    * `false` (a probe with no keys matches nothing). */
  def keyedFilter(key: Column, keys: Seq[Any]): Column =
    if (keys.isEmpty) lit(false)
    else key.isin(keys: _*) && balancedOrEq(key, keys)

  private def balancedOrEq(key: Column, keys: Seq[Any]): Column =
    if (keys.length == 1) key === lit(keys.head)
    else {
      val (l, r) = keys.splitAt(keys.length / 2)
      balancedOrEq(key, l) || balancedOrEq(key, r)
    }

  /** Collect `df`'s distinct `keyCol` values, or None above `cap` —
    * the probe-or-fallback decision in one verb. `limit(cap + 1)`
    * bounds the fetch itself: at ≤ cap rows the limited result IS the
    * complete distinct set. */
  def distinctKeys(df: DataFrame, keyCol: String,
      cap: Int = MaxKeys): Option[Seq[Any]] = {
    val rows = df.select(keyCol).distinct().limit(cap + 1).collect()
    if (rows.length > cap) None else Some(rows.toSeq.map(_.get(0)))
  }
}
