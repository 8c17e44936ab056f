package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.sources.Layout

/** The IVF index LAYOUT at rest: embeddings written range-sorted by
  * their assigned cell means a probe that narrows to nProbe cells
  * reads only those cells' row groups — the vectors of every other
  * cell are pruned by parquet footer stats, never deserialized. This
  * is what makes an IVF index on 100 TB of vectors an O(probed cells)
  * scan instead of a full pass; the spec measures it with the same
  * scan metric as LayoutSpec. */
class AnnLayoutSpec extends SparkSpec {

  private val K = 8

  test("cell-sorted embedding layout prunes non-probed cells from the scan") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables(spark, sf, "embeddings")
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", K)
    val clustered = emb.join(
      Similarity.assignCells(emb, "vec_id", "embedding", cents)
        .select("vec_id", "cell"),
      "vec_id")
      .select("vec_id", "cell", "embedding")

    val root = Files.createTempDirectory("graft-ivf-layout").toString
    Layout.writeRangeSorted(clustered, "cell", K, s"$root/by_cell")
    clustered.repartition(K).write.mode("overwrite").parquet(s"$root/naive")

    val total = clustered.count()
    def probe(dir: String): Long = Layout.scanOutputRows(
      spark.read.parquet(s"$root/$dir").filter(col("cell").isin(0, 1)))
    val naive = probe("naive")
    val pruned = probe("by_cell")
    // random order: cells 0 and 1 live in every row group; cell-sorted:
    // only their own (2-of-K cells plus boundary-straddling groups)
    assert(naive >= total * 9 / 10, s"naive layout unexpectedly skipped: $naive")
    assert(pruned <= total * 4 / K, s"cell layout did not prune: $pruned of $total")

    // and the probe result itself is identical on both layouts
    val a = spark.read.parquet(s"$root/by_cell").filter(col("cell").isin(0, 1))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(s"$root/naive").filter(col("cell").isin(0, 1))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
