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

  test("rowCount reads the exact count from parquet footers") {
    // the catalog-statistics read that sizes adaptive LSH dials must
    // equal a full count() for every driver table shape (single-file
    // tables here; the directory branch lists *.parquet parts)
    val dir = "/root/testdata/sf0.001"
    Seq("embeddings", "documents", "events").foreach { t =>
      assert(Tables.rowCount(spark, dir, t) == Tables(spark, dir, t).count(),
        s"footer count of $t must equal count()")
    }
  }

  test("invalidate reaches registered family caches and unpersists their frames") {
    // the family objects memoize persisted frames DERIVED from a
    // dir's files (signatures, fingerprints, normalized wire);
    // invalidate(dir) must drop those too or a rewritten dir keeps
    // serving pre-rewrite derivations — and must unpersist, or the
    // executor block cache keeps the stale bytes alive
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tables-derived").toString
    val m = Tables.registerSessionCache(scala.collection.concurrent
      .TrieMap.empty[(org.apache.spark.sql.SparkSession, String),
        org.apache.spark.sql.DataFrame])
    try {
      val df = spark.range(3).toDF("k").persist()
      df.count()
      m.put((spark, dir), df)
      m.put((spark, s"$dir-other"), df)
      Tables.invalidate(dir)
      assert(m.keySet == Set((spark, s"$dir-other")),
        "only the invalidated dir's entries may drop")
      assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "the dropped entry's frame must unpersist")
      m.remove((spark, s"$dir-other"))
      ()
    } finally
      // a throwaway registrant must deregister, or its sweep closures
      // (holding the map) outlive the test in the global registry
      Tables.deregisterSessionCache(m)
  }
}
