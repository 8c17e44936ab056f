package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time (as-of) join: for each left row, attach the payload of
 * the single right row sharing its key whose `rightTs` is the greatest
 * value at-or-before `leftTs`; ties on `rightTs` break toward the
 * greatest `tieBreak`. Left rows with no qualifying right row keep NULL
 * payload columns (left-outer semantics). NULL join keys never match,
 * mirroring SQL equality (a NULL-keyed left row gets NULL payload).
 *
 * This is the operator the reference's CDC model implies but never
 * needs (its apply step always wants the latest state, `JdbcWriter
 * .java:385-433` LWW); a training-data pipeline needs the general
 * form — "state as of the example's event time" — to avoid label
 * leakage when joining features to outcomes.
 *
 * Implementation is the sort-merge as-of shape that scales: tag both
 * sides, union, and run a single `last(payload, ignoreNulls)` window
 * per key ordered by (ts, side, tieBreak). Right rows sort before left
 * rows at equal timestamps, so "at-or-before" includes exact-time
 * matches. One exchange on the key and one within-partition sort —
 * no per-row probe, no range explosion, and AQE can split a skewed
 * key's sort spill. A join-then-rank formulation would materialize
 * every (left, preceding-right) pair first: O(matches) shuffle versus
 * this plan's O(left + right).
 */
object AsOf {

  /**
   * @param payload right-side columns to attach, emitted as
   *                `asof_<name>` on the result
   */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val tieType = right.schema(tieBreak).dataType
    val payStruct = struct(payload.map(c => col(c).as(s"asof_$c")): _*)

    // Right rows with NULL key or NULL timestamp can never be the
    // "latest at-or-before" under SQL comparison semantics — drop them
    // before the union rather than letting the window group them.
    val rightRows = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        col(key).as("__k"), col(rightTs).as("__t"),
        col(tieBreak).as("__tb"), payStruct.as("__pay"),
        lit(0).as("__side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema))
          .as("__lrow"))

    val leftRows = left.select(
      col(key).as("__k"), col(leftTs).as("__t"),
      lit(null).cast(tieType).as("__tb"),
      lit(null).cast(rightRows.schema("__pay").dataType).as("__pay"),
      lit(1).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__lrow"))

    // Rights (side 0) sort before lefts (side 1) at equal ts, so an
    // exact-time right row is visible to its left row; among equal-ts
    // rights, ascending tieBreak makes `last` pick the greatest.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightRows.unionByName(leftRows)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: payload.map(c =>
        col(s"__asof.asof_$c").as(s"asof_$c")): _*)
  }
}
