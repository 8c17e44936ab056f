package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** The layout module's claim is measurable: under a pushed point
  * filter, the parquet scan of a clustered table outputs a fraction of
  * the rows the same scan outputs on a randomly-ordered copy of the
  * same data (row-group min/max skipping). Assert the actual scan
  * metric, not just file ranges. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val NumFiles = 16
  private val N = 250000L

  // Two INDEPENDENT uniform columns: a scrambles the row coordinate
  // of a 500×500 grid, b the column coordinate — a carries no
  // information about b (a same-modulus scramble of id for both would
  // make b a function of a and fake the skipping results).
  private lazy val data = spark.range(N).select(
    col("id"),
    (((col("id") % 500) * 271) % 500).as("a"),
    (((col("id") / 500).cast("long") * 333) % 500).as("b"))

  private lazy val dirs = {
    val root = Files.createTempDirectory("graft-layout").toString
    data.repartition(NumFiles).write.mode("overwrite")
      .parquet(s"$root/naive")
    Layout.writeRangeSorted(data, "a", NumFiles, s"$root/range_a")
    Layout.writeZOrdered(data, "a", "b", 4, NumFiles, s"$root/zorder")
    root
  }

  private def probe(layout: String, c: String, v: Int): Long =
    Layout.scanOutputRows(
      spark.read.parquet(s"$dirs/$layout").filter(col(c) === v))

  test("range-sorted layout: point filter on the sort column skips almost everything") {
    val naive = probe("naive", "a", 250)
    val sorted = probe("range_a", "a", 250)
    // 16 files ⇒ the sorted layout reads ~1 file; random order reads
    // every row group (each spans the whole 0..499 domain).
    assert(naive >= N * 9 / 10, s"naive layout unexpectedly skipped: $naive")
    assert(sorted <= N / 8, s"range layout did not skip: $sorted vs $naive")
  }

  test("range-sorted layout gives no skipping on the other column") {
    // The motivation for z-order: b=250 lives in every a-sorted file.
    assert(probe("range_a", "b", 250) >= N * 9 / 10)
  }

  test("z-order layout skips on BOTH filter columns") {
    val za = probe("zorder", "a", 250)
    val zb = probe("zorder", "b", 250)
    // Each file owns ~16 of the 256 grid cells; a fixed a-bin (or
    // b-bin) touches 16 cells, which the Z-curve packs into a minority
    // of the files. Weaker than the dedicated sort, far better than
    // nothing — the documented trade.
    assert(za <= N * 6 / 10, s"z-order did not skip on a: $za")
    assert(zb <= N * 6 / 10, s"z-order did not skip on b: $zb")
  }

  test("3-column z-order skips on ALL THREE filter columns") {
    // three INDEPENDENT coordinates of a 64x64x64 grid (disjoint digit
    // positions of id, scrambled per-dim so no column determines
    // another)
    val data3 = spark.range(N).select(
      col("id"),
      (((col("id") % 64) * 37) % 64).as("a"),
      ((((col("id") / 64) % 64) * 41) % 64).as("b"),
      ((((col("id") / 4096) % 64) * 43) % 64).as("c"))
    // 3 dims need more files than 2 for the same per-column skipping:
    // file count sets how many leading z-bits select a file, and those
    // bits round-robin across D columns — at 16 files the 4 selector
    // bits give the last dim only ONE, i.e. half the files; 64 files
    // give every dim two selector bits
    val files3 = 64
    val root = Files.createTempDirectory("graft-layout3").toString
    data3.repartition(files3).write.mode("overwrite").parquet(s"$root/naive")
    Layout.writeZOrdered(data3, Seq("a", "b", "c"), 4, files3, s"$root/z3")
    def p(dir: String, c: String): Long = Layout.scanOutputRows(
      spark.read.parquet(s"$root/$dir").filter(col(c) === 32))
    assert(p("naive", "a") >= N * 9 / 10, "naive layout unexpectedly skipped")
    val (za, zb, zc) = (p("z3", "a"), p("z3", "b"), p("z3", "c"))
    // D=3 dilutes per-column selector bits (the documented trade), but
    // every column must still skip a meaningful fraction
    assert(za <= N * 6 / 10, s"3-dim z-order did not skip on a: $za")
    assert(zb <= N * 6 / 10, s"3-dim z-order did not skip on b: $zb")
    assert(zc <= N * 6 / 10, s"3-dim z-order did not skip on c: $zc")
    // and the layout is a permutation of the input
    val key = (df: DataFrame) => df.select("id").collect()
      .map(_.getLong(0)).sorted
    assert(key(spark.read.parquet(s"$root/z3")).sameElements(key(data3)))
  }

  test("sharded shuffle-deal layout: per-file pos order, shard dirs complete") {
    import graft.dedup.Dedup
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val shards = 8
    val deal = Dedup.shuffleDeal(docs, "doc_id", seed = 7L, shards)
      .select("doc_id", "shard", "pos")
    val out = Files.createTempDirectory("graft-deal").toString + "/epoch0"
    Layout.writeSharded(deal, "shard", "pos", out)

    // every shard directory exists, and TOGETHER they hold exactly
    // the deal (no row lost or re-dealt by the write)
    val dirsOnDisk = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
    assert(dirsOnDisk == (0 until shards).map(s => s"shard=$s").sorted)
    val back = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = deal.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == expected && back.nonEmpty)

    // the layout's point: WITHIN each physical file, rows are already
    // in pos order — the training reader streams files with zero
    // runtime sorting (a single-file read preserves parquet row order)
    for (d <- dirsOnDisk) {
      val files = new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty, s"$d has no data files")
      for (f <- files) {
        val pos = spark.read.parquet(f.getPath).select("pos")
          .collect().map(_.getLong(0)).toSeq
        assert(pos == pos.sorted, s"${f.getName} in $d is not pos-sorted")
      }
    }
  }

  test("layouts preserve the data exactly") {
    val key = (df: DataFrame) => df.select("id", "a", "b")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue)
    val base = key(data)
    assert(key(spark.read.parquet(s"$dirs/range_a")).sameElements(base))
    assert(key(spark.read.parquet(s"$dirs/zorder")).sameElements(base))
  }
}
