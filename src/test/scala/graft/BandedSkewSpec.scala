package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.ShuffledJoin
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * The banded self-join family under a PATHOLOGICAL hot bucket
 * (VERDICT r16 #3): a boilerplate corpus where 30 % of documents are
 * byte-identical, so one band key per band carries 30 % of the band
 * rows — the worst case for the `bands.join(bands, band_key)`
 * candidate expansion. Two claims, both load-immune (byte/row
 * accounting from the executed plan, never wall clock):
 *
 *  1. the FANOUT stays bucket-bounded: verified pairs are exactly the
 *     hot bucket's C(hot, 2) — banding never leaks a cross-bucket
 *     candidate, so the quadratic cost is confined to the bucket the
 *     data actually earned (the dial that keeps 100 TB feasible);
 *  2. AQE's skew-split fires ON the self-join: the hot reduce
 *     partition is split into PartialReducerPartitionSpec chunks
 *     (both sides — a self-join is skewed on both), so no single task
 *     owns the whole bucket. The window-skew pin
 *     (PlanQualitySpec's lastWriteWins case) covers the exchange AQE
 *     cannot help; this covers the one it can.
 *
 * The skew dials are scaled to test-sized data (KB thresholds instead
 * of the 256 MB production default) — the assertion is that the
 * MECHANISM engages on this plan shape, i.e. nothing in the funnel
 * (the distinct above the join, the exchange reuse of the self-join's
 * two sides) disqualifies it from OptimizeSkewedJoin; at production
 * sizes the default dials trip on the same shape.
 */
class BandedSkewSpec extends SparkSpec {

  /** n docs, the first 30 % byte-identical (the boilerplate page),
    * the rest with fully disjoint token sets — so every verified pair
    * is a hot-bucket pair by construction. */
  private def boilerplate(n: Int): DataFrame = {
    val hot = (n * 3) / 10
    spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < hot,
        lit("terms of service apply to this page please read carefully " +
          "before proceeding further"))
        .otherwise(concat_ws(" ",
          concat(lit("a"), col("id")), concat(lit("b"), col("id")),
          concat(lit("c"), col("id")), concat(lit("d"), col("id")),
          concat(lit("e"), col("id")))).as("text"))
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Test-scaled skew dials: enough reduce partitions that the median
    * is an honest baseline, broadcasts off (at scale the band table is
    * far above any broadcast threshold), KB-sized skew thresholds. */
  private val SkewConfs = Seq(
    "spark.sql.shuffle.partitions" -> "64",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB")

  /** Final adaptive plan, flattened through query-stage leaves. */
  private def finalPlan(df: DataFrame): Seq[SparkPlan] =
    PlanInspect.executedNodes(df)

  /** The two skew assertions over an already-collected frame. */
  private def assertSkewSplit(df: DataFrame, what: String): Unit = {
    val nodes = finalPlan(df)
    val skewJoins = nodes.collect { case j: ShuffledJoin if j.isSkewJoin => j }
    assert(skewJoins.nonEmpty,
      s"$what: no skew-split join in the final adaptive plan —\n" +
        df.queryExecution.executedPlan)
    val partials = nodes.collect {
      case r: AQEShuffleReadExec => r.partitionSpecs.collect {
        case p: PartialReducerPartitionSpec => p }
    }.flatten
    assert(partials.nonEmpty, s"$what: no PartialReducerPartitionSpec")
    // the split must genuinely divide the hot bucket: per skewed
    // reducer, >= 2 chunks and no chunk holding more than 60 % of the
    // reducer's bytes (byte accounting from map output stats —
    // load-immune)
    partials.groupBy(_.reducerIndex).foreach { case (red, ps) =>
      val sizes = ps.map(_.dataSize)
      assert(sizes.length >= 2,
        s"$what: skewed reducer $red split into only ${sizes.length} chunk")
      assert(sizes.max * 10 <= sizes.sum * 6,
        s"$what: reducer $red's largest chunk ${sizes.max} of ${sizes.sum} " +
          "bytes — the split left one task owning most of the bucket")
    }
  }

  test("minhash banded self-join: 30%-hot bucket splits under AQE; verified pairs are exactly the bucket's") {
    val n = 1000
    val hot = (n * 3) / 10
    withConfs(SkewConfs: _*) {
      val (pairs, release) =
        Dedup.nearDupPairsManaged(boilerplate(n), "doc_id", "text", 0.9)
      try {
        val got = pairs.collect()
        // bucket-bounded fanout: every verified pair is a hot-bucket
        // pair (identical docs, jaccard exactly 1) — cold docs have
        // disjoint shingle sets, and a freak 32-bit band collision
        // between them dies in the verify
        assert(got.length == hot * (hot - 1) / 2,
          s"expected exactly ${hot * (hot - 1) / 2} hot-bucket pairs, " +
            s"got ${got.length}")
        assert(got.forall(_.getDouble(2) == 1.0),
          "a cross-bucket pair leaked through the banding")
        assertSkewSplit(pairs, "minhash banded self-join")
      } finally release()
    }
  }

  test("simhash banded self-join: the same hot bucket splits under AQE") {
    val n = 1000
    val hot = (n * 3) / 10
    withConfs(SkewConfs: _*) {
      val pairs = Dedup.simhashNearDupPairsWide(boilerplate(n),
        "doc_id", "text", maxHamming = 3, bands = 4, words = 1)
      val got = pairs.collect()
      // identical docs fingerprint identically: hamming 0, and each of
      // the 4 bands carries the full 30 % bucket
      assert(got.length == hot * (hot - 1) / 2,
        s"expected exactly ${hot * (hot - 1) / 2} hamming-0 pairs, " +
          s"got ${got.length}")
      assert(got.forall(_.getLong(2) == 0L),
        "a cross-bucket pair leaked through the simhash banding")
      assertSkewSplit(pairs, "simhash banded self-join")
    }
  }
}
