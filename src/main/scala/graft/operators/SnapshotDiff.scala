package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot differencing — REVERSE CDC: given two keyed snapshots of a
 * table, emit the minimal change set (op I/U/D per key) that
 * transforms old into new. The complement of the apply path
 * (`CdcOps.applyChanges` folds events into a snapshot; this recovers
 * events from snapshots) — the standard bootstrap when a source has no
 * change log, and the reconciliation audit when it does (diff the
 * replica against the source; a non-empty diff is the drift).
 *
 * Semantics: keys present only in `newSnap` → I (new values); only in
 * `oldSnap` → D (old values, so the event carries what was deleted);
 * present in both with any compared column differing under NULL-SAFE
 * inequality → U (new values); identical rows emit nothing. Keys are
 * assumed non-null (primary-key contract, same as the apply path).
 *
 * Scale shape: one hash exchange per side on the key columns feeding a
 * sort-merge full-outer join — O(|old| + |new|) shuffled rows, no
 * fan-out, uniform PK keys so no skew. When both snapshots are stored
 * bucketed by key (graft.sources.Bucketed) even those two exchanges
 * disappear and the diff is a pure streaming merge per bucket.
 */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshot diff needs at least one key column")
    require(compareCols.nonEmpty, "snapshot diff needs columns to compare")
    val o = oldSnap.select(
      keys.map(k => col(k).as(s"__ok_$k")) ++
        compareCols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newSnap.select(
      keys.map(k => col(k).as(s"__nk_$k")) ++
        compareCols.map(c => col(c).as(s"__n_$c")): _*)
    val joined = o.join(n,
      keys.map(k => col(s"__ok_$k") === col(s"__nk_$k")).reduce(_ && _),
      "full_outer")
    val inOld = col(s"__ok_${keys.head}").isNotNull
    val inNew = col(s"__nk_${keys.head}").isNotNull
    val changed = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    val op = when(!inOld, "I").when(!inNew, "D")
      .when(changed, "U") // both present, identical → NULL → filtered
    joined
      .select(
        keys.map(k => coalesce(col(s"__nk_$k"), col(s"__ok_$k")).as(k)) ++
          Seq(op.as("op")) ++
          // pick by SIDE PRESENCE, not value nullness: an update that
          // nulls a column must emit NULL, which coalesce would mask
          compareCols.map(c =>
            when(inNew, col(s"__n_$c")).otherwise(col(s"__o_$c")).as(c)): _*)
      .where(col("op").isNotNull)
  }
}
