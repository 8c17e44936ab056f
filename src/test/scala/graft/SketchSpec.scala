package graft

import org.apache.spark.sql.functions._

import graft.analytics.SketchQueries

/** Properties the sketch-calibration queries rely on: error bounds on
  * a known-cardinality input, union-vs-one-shot HLL agreement (the
  * mergeability that makes daily-sketch rollups sound), and
  * determinism across runs (what makes the oracle verdicts stable). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val n = 50000

  private lazy val ids = spark.range(0, n * 4)
    .select((col("id") % n).as("v"), (col("id") % 7).as("g"))

  test("approx_count_distinct holds the rsd bound on known cardinality") {
    val est = ids.agg(
      approx_count_distinct(col("v"), SketchQueries.DistinctRsd).as("e"))
      .head().getLong(0)
    assert(math.abs(est - n).toDouble / n <= SketchQueries.SketchTol,
      s"est=$est exact=$n")
  }

  test("count-min estimates never undercount, hold the eps bound, and merge order-independently") {
    // known skewed frequencies: value v appears (v % 50) + 1 times
    val data = (0 until 2000).flatMap(v =>
      Seq.fill(v % 50 + 1)(s"tok$v")).toDF("t")
    def estimates(parts: Int): Map[String, Long] = {
      val bytes = data.repartition(parts)
        .agg(count_min_sketch(col("t"), lit(SketchQueries.CmsEps),
          lit(SketchQueries.CmsConfidence), lit(SketchQueries.CmsSeed)))
        .head().getAs[Array[Byte]](0)
      val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      (0 until 2000).map(v => s"tok$v" -> sk.estimateCount(s"tok$v")).toMap
    }
    val e1 = estimates(1)
    // counters SUM, so any partitioning merges to the same grid — the
    // property that makes the calibration verdicts stable
    assert(estimates(13) == e1, "CMS estimates depend on partitioning")
    val total = data.count()
    val bound = math.ceil(SketchQueries.CmsEps * total).toLong
    (0 until 2000).foreach { v =>
      val exact = v % 50 + 1
      val est = e1(s"tok$v")
      assert(est >= exact, s"tok$v undercounted: $est < $exact")
      assert(est - exact <= bound, s"tok$v over eps bound: $est vs $exact")
    }
  }

  test("HLL union of partial sketches matches the one-shot sketch") {
    // Group-wise sketches unioned == sketch over the whole column:
    // HLL register state is a per-bucket max, so any partition of the
    // input merges to the same registers — the property the daily
    // rollup (q_events_sketch_rollup) is built on.
    val oneShot = ids.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"))).as("e"))
      .head().getLong(0)
    val unioned = ids.groupBy("g").agg(hll_sketch_agg(col("v")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    assert(unioned == oneShot, s"unioned=$unioned oneShot=$oneShot")
    assert(math.abs(oneShot - n).toDouble / n <= SketchQueries.SketchTol)
  }

  test("approx_percentile rank error stays within the accuracy bound") {
    // Uniform 0..n-1: value error == rank error, bounded by
    // n/accuracy.
    val est = ids.select(col("v").cast("double").as("v"))
      .agg(approx_percentile(col("v"), lit(0.5),
        lit(SketchQueries.PercentileAccuracy)).as("e"))
      .head().getDouble(0)
    val bound = 4.0 * n / SketchQueries.PercentileAccuracy
    assert(math.abs(est - n / 2.0) <= bound, s"est=$est")
  }

  test("HLL sketches survive a parquet round-trip and union incrementally") {
    // The production shape behind q_events_sketch_rollup: persist the
    // per-group sketch TABLE (a binary column), then fold a new
    // batch's sketches in by union — no raw-data rescan. The estimate
    // after the round-trip must equal the all-at-once estimate.
    val dir = java.nio.file.Files.createTempDirectory("graft-sk").toString
    val (old_, fresh) = (ids.filter(col("g") < 5), ids.filter(col("g") >= 5))
    old_.groupBy("g").agg(hll_sketch_agg(col("v")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .unionByName(fresh.groupBy("g").agg(hll_sketch_agg(col("v")).as("sk")))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    val direct = ids.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"))).as("e")).head().getLong(0)
    assert(merged == direct, s"merged=$merged direct=$direct")
  }

  test("calibration queries are deterministic across runs") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_events_approx_users", "q_events_sketch_rollup",
        "q_lineitem_approx_quantiles")) {
      val a = SparkEntry.queries(q)(spark, sf).collect().toSeq
      val b = SparkEntry.queries(q)(spark, sf).collect().toSeq
      assert(a == b, s"$q drifted between runs")
      assert(a.nonEmpty && a.forall(r => r.getBoolean(r.length - 1)),
        s"$q verdict not uniformly within tolerance")
    }
  }
}
