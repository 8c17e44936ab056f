package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, Long, Long)*) = // (id, key, ts)
    rows.toDF("id", "k", "t")

  private def rightDf(rows: (Long, Long, Long, String)*) = // (rid, key, ts, tag)
    rows.toDF("rid", "k", "t", "tag")

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame) =
    AsOf.joinAsOf(l, r, key = "k", leftTs = "t", rightTs = "t",
      tieBreak = "rid", payload = Seq("rid", "tag"))
      .orderBy("id")
      .select("id", "asof_rid", "asof_tag")
      .collect()

  test("picks the latest right row at-or-before, including exact-time matches") {
    val l = leftDf((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L))
    val r = rightDf((901L, 10L, 90L, "a"), (902L, 10L, 100L, "b"),
      (903L, 10L, 200L, "c"))
    val got = run(l, r)
    // id=1 at t=100: exact-time 902 wins over 901; id=2 at 205 → 903;
    // id=3 at 50 precedes everything → null payload.
    assert(got(0) == Row(1L, 902L, "b"))
    assert(got(1) == Row(2L, 903L, "c"))
    assert(got(2) == Row(3L, null, null))
  }

  test("equal right timestamps break toward the greatest tieBreak") {
    val l = leftDf((1L, 7L, 100L))
    val r = rightDf((5L, 7L, 100L, "low"), (9L, 7L, 100L, "high"),
      (6L, 7L, 100L, "mid"))
    assert(run(l, r).head == Row(1L, 9L, "high"))
  }

  test("keys never cross; NULL keys and NULL right timestamps never match") {
    // Tuple-derived schemas mark the longs non-nullable and Catalyst
    // would fold the operator's isNotNull guards to true — build
    // genuinely nullable schemas so the guards are exercised.
    import org.apache.spark.sql.types._
    val lSchema = StructType(Seq(StructField("id", LongType),
      StructField("k", LongType), StructField("t", LongType)))
    val rSchema = StructType(Seq(StructField("rid", LongType),
      StructField("k", LongType), StructField("t", LongType),
      StructField("tag", StringType)))
    val l = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 10L, 100L), Row(2L, null, 100L)),
      lSchema)
    val r = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(901L, 11L, 90L, "otherkey"),
        Row(902L, null, 90L, "nullkey"),
        Row(903L, 10L, null, "nullts")),
      rSchema)
    val got = run(l, r)
    assert(got(0) == Row(1L, null, null), "wrong-key/null-ts rights must not match")
    assert(got(1) == Row(2L, null, null), "NULL-keyed left row gets NULL payload")
  }

  test("equivalence with the join-then-rank formulation on random data") {
    val rnd = new Random(4242L)
    val l = leftDf((1L to 200L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong)): _*)
    val r = rightDf((1L to 300L).map(i =>
      (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, s"t$i")): _*)

    val naive = l.join(r.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(Window.partitionBy("id")
        .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("id"), col("rid").as("asof_rid"), col("tag").as("asof_tag"))
      .orderBy("id").collect()

    assert(run(l, r).toSeq == naive.toSeq)
  }
}
