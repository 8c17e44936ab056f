package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{CuratedCorpus, PipelineQueries, Release}

/** The standing curated-corpus table: init + folds must hold exactly
  * what curating the union corpus holds (the equivalence contract the
  * incremental release rests on), folds must be replay-idempotent and
  * must drop content the table already holds, and a version built
  * from the standing table must be bit-identical to a full build. */
class CuratedCorpusSpec extends SparkSpec {

  private val Src = "/root/testdata/sf0.001"
  private def docs = Tables(spark, Src, "documents")

  /** 80/10/10 doc-id slices — batches carry strictly larger ids than
    * everything before them (the monotone-id fold contract). */
  private def slices = {
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val (t1, t2) = (mx * 8 / 10, mx * 9 / 10)
    (docs.where(col("doc_id") < t1),
      docs.where(col("doc_id") >= t1 && col("doc_id") < t2),
      docs.where(col("doc_id") >= t2))
  }

  private def tableRows(path: String): Set[(Long, String, Long)] =
    CuratedCorpus.open(spark, path)
      .select("doc_id", "source", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("init + folds ≡ curating the union corpus") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val want = PipelineQueries.curatedTrainDocs(docs)
        .select(col("doc_id"), col("source"),
          coalesce(graft.text.TextAnalysis.tokenCount(col("text"))
            .cast("long"), lit(0L)).as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val got = tableRows(path)
      assert(got == want && got.nonEmpty)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a replayed fold re-lands its own rows, never duplicates or drops them") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val before = tableRows(path)
      CuratedCorpus.foldBatch(path, b1, 0L) // at-least-once redelivery
      assert(tableRows(path) == before)
    } finally CuratedCorpus.delete(spark, path)
  }

  test("content the table already holds never re-lands under a new id") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, _, _) = slices
      CuratedCorpus.init(base, path)
      val before = tableRows(path)
      // re-submit documents the table is KNOWN to hold (they survived
      // curation) under fresh, larger ids — the hash probe must drop
      // every one of them
      val standing = CuratedCorpus.open(spark, path).limit(3)
        .select(col("doc_id"), col("text"))
      val resubmit = docs.join(standing.select("doc_id"), Seq("doc_id"))
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      CuratedCorpus.foldBatch(path, resubmit, 5L)
      assert(tableRows(path) == before,
        "already-held content must not re-land under a new id")
    } finally CuratedCorpus.delete(spark, path)
  }

  test("a release cut from the standing table ≡ a full build (bit-identical)") {
    val cc = Files.createTempDirectory("graft-corpus").toString + "/cc"
    val r1 = Files.createTempDirectory("graft-release").toString + "/full"
    val r2 = Files.createTempDirectory("graft-release").toString + "/incr"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, cc)
      CuratedCorpus.foldBatch(cc, b1, 0L)
      CuratedCorpus.foldBatch(cc, b2, 1L)
      Release.build(docs, r1, 1, Release.Seed, Release.Budget, Release.Shards)
      Release.buildFromCorpus(spark, cc, r2, 1, Release.Seed, Release.Budget,
        Release.Shards)
      assert(Release.manifestJson(spark, r2) == Release.manifestJson(spark, r1),
        "incremental and full builds must produce identical releases")
    } finally {
      CuratedCorpus.delete(spark, cc)
      Release.delete(spark, r1)
      Release.delete(spark, r2)
    }
  }

  test("a second session opens the standing table a prior session built") {
    val path = Files.createTempDirectory("graft-corpus").toString + "/cc"
    try {
      val (base, b1, b2) = slices
      CuratedCorpus.init(base, path)
      CuratedCorpus.foldBatch(path, b1, 0L)
      CuratedCorpus.foldBatch(path, b2, 1L)
      val before = tableRows(path)
      val session2 = spark.newSession()
      val got = CuratedCorpus.open(session2, path)
        .select("doc_id", "source", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == before && got.nonEmpty)
    } finally CuratedCorpus.delete(spark, path)
  }
}
