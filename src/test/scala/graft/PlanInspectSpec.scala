package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/**
 * The shared executed-plan traversal ([[PlanInspect]]) that ScaleSmoke's
 * runtime gates and the plan-quality specs stand on: it must reach
 * exchanges THROUGH AQE's query-stage nesting, and its record metric
 * must return 0 (not throw) on a shuffle-free plan — the smoke's
 * `require(written > 0 …)` turns that 0 into its own loud diagnostic
 * instead of an `empty.max` crash masking it.
 */
class PlanInspectSpec extends SparkSpec {

  test("executedNodes reaches the exchange inside AQE query stages; the record metric is live") {
    val df = spark.range(1000)
      .groupBy((col("id") % 7).as("k")).count()
    val rows = df.collect()
    assert(rows.length == 7)
    val nodes = PlanInspect.executedNodes(df)
    assert(nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"no exchange found through the query-stage nesting:\n" +
        df.queryExecution.executedPlan)
    val written = PlanInspect.maxShuffleRecordsWritten(df)
    // partial aggregation: at most one row per key per map partition
    val mapParts = spark.range(1000).rdd.getNumPartitions
    assert(written > 0 && written <= 7L * mapParts,
      s"expected a live partial-agg record count, got $written")
  }

  test("a shuffle-free plan yields 0, never an empty.max throw") {
    val df = spark.range(100).filter(col("id") > 50).toDF()
    df.collect()
    assert(PlanInspect.executedNodes(df).nonEmpty)
    assert(PlanInspect.maxShuffleRecordsWritten(df) == 0L)
  }
}
