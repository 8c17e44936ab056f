package graft

import org.apache.spark.sql.functions._

import graft.analytics.RangeJoin

/**
 * RangeJoin.joinTrailingWindow must be EXACTLY the inequality join it
 * replaces: the banding (bucket + two-replica explode + residual
 * filter) is a plan optimization, not an approximation. Verified
 * against a naive theta-join on real events plus hand-built boundary
 * rows (window edges inclusive/exclusive, cross-bucket matches, NULL
 * keys, self-lineage frames).
 */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val WindowUs = 10L * 60 * 1000000

  test("banded join ≡ naive inequality join on real events (incl. left-outer rows)") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("v_ts_us"),
        col("event_id").as("v_event_id"))

    val banded = RangeJoin.joinTrailingWindow(clicks, views,
        "user_id", "ts_us", "v_ts_us", WindowUs)
      .select("event_id", "v_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet

    val naiveViews = views.withColumnRenamed("user_id", "vu")
    val naive = clicks.join(naiveViews,
        col("vu") === col("user_id") &&
          col("v_ts_us") > col("ts_us") - WindowUs &&
          col("v_ts_us") <= col("ts_us"), "left")
      .select("event_id", "v_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet

    assert(banded == naive)
    assert(banded.nonEmpty && banded.exists(_._2.nonEmpty),
      "fixture produced no matches — test is vacuous")
    assert(banded.exists(_._2.isEmpty),
      "fixture produced no left-outer rows — test is vacuous")
  }

  test("window boundaries: ts inclusive, ts-window exclusive, cross-bucket matches") {
    // left at t=1000us with window 1000us: matches (0, 1000]
    val left = Seq((1L, "u", 1000L)).toDF("id", "k", "t")
    val right = Seq(
      ("u", 0L, "at_lower_bound"),     // t - w exactly: excluded
      ("u", 1L, "just_inside_lower"),  // crosses bucket boundary (bin 0 vs 1)
      ("u", 1000L, "at_ts"),           // exactly ts: included
      ("u", 1001L, "after_ts"),        // future: excluded
      (null.asInstanceOf[String], 500L, "null_key"),
      ("other", 500L, "other_key")).toDF("k", "rt", "tag")
    val got = RangeJoin.joinTrailingWindow(left, right, "k", "t", "rt", 1000L)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got == Set("just_inside_lower", "at_ts"))
  }

  test("a right row never matches the same left row twice via both replicas") {
    val left = Seq((1L, "u", 1500L)).toDF("id", "k", "t")
    val right = Seq(("u", 1200L, "v")).toDF("k", "rt", "tag")
    val got = RangeJoin.joinTrailingWindow(left, right, "k", "t", "rt", 1000L)
    assert(got.count() == 1)
  }

  test("clashing right column names are rejected") {
    val left = Seq((1L, "u", 1L)).toDF("id", "k", "t")
    val right = Seq(("u", 2L, 3L)).toDF("k", "rt", "t")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.joinTrailingWindow(left, right, "k", "t", "rt", 10L)
    }
    assert(e.getMessage.contains("pre-renamed"))
  }
}
