package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Sampling

/** Token-budget fill: the distributed prefix-sum form must equal the
  * definitive one-window-per-source form exactly (same kept rows,
  * same running totals) at every chunk granularity — chunks is a
  * performance dial, never a semantics dial — and the kept set must
  * be a true budget-bounded prefix of the deal order. */
class SamplingSpec extends SparkSpec {

  private val Src = "/root/testdata/sf0.001"
  private val Seed = 7L
  private val Budget = 600L

  private def docs = Tables(spark, Src, "documents")

  private def rows(df: DataFrame): Set[(Long, String, Long, Long)] =
    df.select(col("doc_id"), col("source"),
        col("n_tokens").cast("long"), col("cum_tokens").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("chunked prefix-sum ≡ per-source window, at every chunk dial") {
    val ref = rows(Sampling.tokenBudgetFillByWindow(
      docs, "source", "doc_id", "text", Seed, Budget))
    assert(ref.nonEmpty)
    for (chunks <- Seq(1, 4, 256)) {
      val got = rows(Sampling.tokenBudgetFill(
        docs, "source", "doc_id", "text", Seed, Budget, chunks))
      assert(got == ref, s"chunks=$chunks diverged from the window form")
    }
  }

  test("null-source docs form their own budget group, never silently dropped") {
    // a null source is a valid per-source group: the window form keeps
    // it, so the distributed form must too (its chunk-offset join is
    // null-safe — a plain equi-join would drop every such row)
    val nulled = docs.withColumn("source",
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("source")))
    val ref = rows(Sampling.tokenBudgetFillByWindow(
      nulled, "source", "doc_id", "text", Seed, Budget))
    assert(ref.exists(_._2 == null), "fixture must keep null-source rows")
    for (chunks <- Seq(1, 256)) {
      val got = rows(Sampling.tokenBudgetFill(
        nulled, "source", "doc_id", "text", Seed, Budget, chunks))
      assert(got == ref, s"chunks=$chunks diverged on a null-source corpus")
    }
  }

  test("kept set is the maximal budget-bounded prefix of the deal order") {
    // unfiltered running totals in deal order, from first principles
    val all = Sampling.tokenBudgetFillByWindow(
        docs, "source", "doc_id", "text", Seed, budget = Long.MaxValue)
      .collect()
      .map(r => (r.getString(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val kept = Sampling.tokenBudgetFill(
        docs, "source", "doc_id", "text", Seed, Budget)
      .collect()
      .map(r => (r.getString(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    for ((s, cums) <- all) {
      val expected = cums.takeWhile(_ <= Budget)
      assert(kept.getOrElse(s, Seq.empty) == expected,
        s"source $s: kept totals are not the budget-bounded prefix")
      // every source truncates at this budget (the constant's intent)
      assert(expected.length < cums.length, s"source $s never truncated")
    }
  }

  test("budget beyond the corpus keeps everything; budget 0 keeps only empties") {
    val n = docs.count()
    val allKept = Sampling.tokenBudgetFill(
      docs, "source", "doc_id", "text", Seed, budget = 10000000L)
    assert(allKept.count() == n)
    val zero = Sampling.tokenBudgetFill(
        docs, "source", "doc_id", "text", Seed, budget = 0L)
      .select("n_tokens").collect().map(_.getLong(0))
    assert(zero.forall(_ == 0L))
  }

  test("a high-cardinality source column fails fast instead of flooding the driver") {
    // per-doc sources (the contract violation: srcCol as an arbitrary
    // attribute, e.g. per-URL) with the cap dialed down so the guard
    // trips at harness scale — the message must state the contract
    val perDoc = docs.withColumn("source", concat(lit("u"), col("doc_id")))
    val keyed = perDoc.select(
      col("doc_id"), col("source"),
      coalesce(graft.text.TextAnalysis.tokenCount(col("text")).cast("long"),
        lit(0L)).as("n_tokens"),
      graft.dedup.Dedup.shuffleKey(col("doc_id"), Seed).as("__key"))
    val e = intercept[IllegalArgumentException] {
      Sampling.fillCounted(keyed, "source", "doc_id", Budget,
        chunks = 4, maxPrefixRows = 16).collect()
    }
    assert(e.getMessage.contains("low-cardinality"))
    // under the cap, the same data fills fine (the guard is a guard,
    // not a behavior change)
    assert(Sampling.fillCounted(keyed, "source", "doc_id", Budget,
      chunks = 4).count() > 0)
  }

  test("same seed reproduces the fill; a new seed re-deals it") {
    val a = rows(Sampling.tokenBudgetFill(
      docs, "source", "doc_id", "text", Seed, Budget))
    val b = rows(Sampling.tokenBudgetFill(
      docs, "source", "doc_id", "text", Seed, Budget))
    assert(a == b)
    val c = rows(Sampling.tokenBudgetFill(
      docs, "source", "doc_id", "text", Seed + 1, Budget))
    assert(a.map(_._1) != c.map(_._1),
      "a new seed must change which documents make the cut")
  }
}
