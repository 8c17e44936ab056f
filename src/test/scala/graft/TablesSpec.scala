package graft

import org.apache.spark.sql.functions._

/** The resolved-plan cache behind [[Tables]]: memoization, explicit
  * invalidation for in-session rewrites (the ScaleSmoke pattern), and
  * the rewrite hazard the cache would otherwise create. */
class TablesSpec extends SparkSpec {

  test("plan cache memoizes per (session, dir, table); invalidate serves the rewritten dir") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tables-cache").toString
    spark.range(5).select(col("id").as("k"))
      .write.parquet(s"$dir/t.parquet")

    val a = Tables(spark, dir, "t")
    assert(a.count() == 5)
    assert(Tables(spark, dir, "t") eq a,
      "second read must return the SAME cached frame (one driver-side " +
        "listing + schema resolution per table, the catalog contract)")

    // in-session rewrite: without invalidation the cached plan pins
    // the pre-rewrite file listing (stale rows at best, deleted-file
    // read failures at worst) — the harness that rewrites must call
    // invalidate, exactly as ScaleSmoke's synthesized tables do
    spark.range(12).select(col("id").as("k"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    Tables.invalidate(dir)
    val b = Tables(spark, dir, "t")
    assert(!(b eq a), "invalidate must drop the dir's cached plans")
    assert(b.count() == 12, "the re-read must serve the rewritten files")
  }
}
