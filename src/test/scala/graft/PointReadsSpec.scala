package graft

import org.apache.spark.sql.functions._

import graft.sources.{Layout, PointReads}

/** The capped point-read filter must stay PLANNER-SAFE at its cap:
  * [[PointReads.keyedFilter]] with a MaxKeys-sized key set builds a
  * ~2·MaxKeys-node predicate tree (balanced or-of-eq AND isin, the
  * key expression duplicated per literal), and the probe-vs-fallback
  * cutover rests on the claim that this analyzes, optimizes, pushes
  * down, and runs in time a micro-batch cadence tolerates — the cap
  * itself is the measured ~1.5 ms/key planner-cost cutover
  * ([[PointReads.MaxKeys]]). This spec drives one cap-sized probe of
  * a sorted table end to end. */
class PointReadsSpec extends SparkSpec {

  test("keyedFilter plans and runs at the MaxKeys cap") {
    val n = PointReads.MaxKeys
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pointreads").toString
    try {
      Layout.writeRangeSorted(
        spark.range(200000).select(col("id").as("k"),
          (col("id") * 7).as("v")),
        "k", 8, s"$dir/t")
      val table = spark.read.parquet(s"$dir/t")
      // every third id, exactly cap-many keys
      val keys: Seq[Any] = (0 until n).map(i => (i * 3).toLong)
      require(n * 3 < 200000, "keys must fall inside the table domain")
      val hit = table.filter(PointReads.keyedFilter(col("k"), keys))
      // count() drives the whole stack: analysis over the ~2·cap-node
      // tree, the parquet stats visitor (balanced → depth log₂ n, no
      // overflow), and execution
      assert(hit.count() == n.toLong,
        "cap-sized key set must match exactly its keys")
      assert(hit.agg(sum(col("v"))).head.getLong(0) ==
        (0 until n).map(i => (i * 3).toLong * 7).sum,
        "cap-sized probe returned wrong rows")
      // one over the cap is the caller's fallback territory by
      // contract — distinctKeys refuses to hand out a larger set
      val wide = spark.range(n + 1).select(col("id").as("key"))
      assert(PointReads.distinctKeys(wide, "key").isEmpty,
        "distinctKeys must refuse a set above the cap")
      assert(PointReads.distinctKeys(wide.limit(3), "key")
        .exists(_.size == 3))
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      ()
    }
  }
}
