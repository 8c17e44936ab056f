package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale sanity pass (VERDICT r3 #8): no sf1 dataset ships in this
 * sandbox, so this harness synthesizes a 10× corpus from sf0.1 in /tmp
 * — documents replicated with id offsets and per-copy text salt (so
 * content hashes differ and exact dedup does NOT collapse the copies),
 * embeddings replicated UNSALTED (10 identical copies per vector is
 * the adversarial case for bucketed near-dup: every bucket carries
 * 10× the pairs) — then times the adaptive-knob queries against it.
 *
 * What it demonstrates, beyond unit tests at the thresholds:
 *  - `adaptivePlanes` steps 5 → 9 at 5 000 vectors, holding expected
 *    bucket size ≤ 16 so the in-bucket quadratic step stays linear
 *    overall even with 10 exact duplicates of every vector;
 *  - the Bayardo prefix join and the LSH funnel degrade sub-linearly
 *    (10× rows, well under 100× the pair work);
 *  - packing/pipeline stay scan-bound.
 *
 * Run: `sbt "runMain graft.ScaleSmoke"`. Emits one line per query.
 * /tmp only — testdata is never written.
 */
object ScaleSmoke {

  val Copies = 10
  val OutDir = "/tmp/graft_scale10"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = "/root/testdata/sf0.1"
    val docs = Tables(spark, src, "documents")
    val nDocs = docs.count()
    val emb = Tables(spark, src, "embeddings")
    val nVecs = emb.count()

    val docsX = (0 until Copies).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * nDocs)).as("doc_id"),
        concat(col("text"), lit(s" s$i")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val embX = (0 until Copies).map { i =>
      emb.select(
        (col("vec_id") + lit(i.toLong * nVecs)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    docsX.write.mode(SaveMode.Overwrite).parquet(s"$OutDir/documents.parquet")
    embX.write.mode(SaveMode.Overwrite).parquet(s"$OutDir/embeddings.parquet")
    println(s"[scale] synthesized ${nDocs * Copies} docs / ${nVecs * Copies} vecs at $OutDir")

    val queries = Seq(
      "q_dedup_embed_cos", "q_dedup_lsh_pairs", "q_dedup_clusters",
      "q_dedup_ngram_jaccard", "q_ann_knn_graph", "q_text_pack",
      "q_pipeline_curate", "q_dedup_incremental", "q_dedup_incremental_fuzzy")
    queries.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, OutDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-24s ${sec}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
