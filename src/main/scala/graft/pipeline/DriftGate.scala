package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.text.TextAnalysis

/**
 * Streaming distribution-drift gate — the ingestion-time face of
 * `q_text_vocab_drift`: each arriving micro-batch's token distribution
 * is compared against the STANDING corpus profile and the batch is
 * routed with its total-variation distance, so a source shift (new
 * scraper, broken encoding, language flip) trips an alarm before the
 * batch poisons the mixture. Total variation (½·Σ|p−q|) because it is
 * pure arithmetic — a KL divergence's log would make the verdict
 * engine- and libm-dependent, the same reason the batch audit uses it.
 *
 * The corpus profile is aggregated and persisted ONCE ([[corpusProfile]],
 * same standing-index contract as the dedup corpus indexes: release it
 * when the corpus snapshot is superseded); per batch the gate pays one
 * token aggregation over the BATCH plus a vocabulary-sized join —
 * the shuffle carries the vocabularies, never the documents.
 */
object DriftGate {

  /** Standing token-frequency profile of the corpus, persisted, with a
    * release handle. */
  def corpusProfile(corpus: DataFrame, textCol: String): (DataFrame, () => Unit) = {
    val freq = corpus
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_corpus"))
      .persist()
    (freq, () => { freq.unpersist(); () })
  }

  /**
   * Total-variation distance between the corpus profile's token
   * distribution and `batch`'s. 0 = identical distributions, 1 =
   * disjoint vocabularies. An empty batch (no tokens) returns 0 —
   * no evidence is not drift; emptiness is the dq gate's finding.
   */
  def tvd(profile: DataFrame, batch: DataFrame, textCol: String): Double = {
    val bf = batch
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_batch"))
    val joined = profile.join(bf, Seq("token"), "full_outer")
      .select(coalesce(col("n_corpus"), lit(0L)).as("nc"),
        coalesce(col("n_batch"), lit(0L)).as("nb"))
      .persist()
    try {
      val totals = joined.agg(
        coalesce(sum("nc"), lit(0L)), coalesce(sum("nb"), lit(0L))).head()
      val (tc, tb) = (totals.getLong(0), totals.getLong(1))
      if (tb == 0L || tc == 0L) 0.0
      else {
        // Σ|nc/tc − nb/tb| summed as DOUBLES is last-ulp partial-sum-
        // order dependent, so "disjoint vocabularies ⇒ exactly 1"
        // would hold only for one partitioning. Sum the integer form
        // |nc·tb − nb·tc| in DECIMAL (exact, order-independent — the
        // repo's decimal-sum emission convention) and divide ONCE.
        val num = joined.agg(sum(abs(
            col("nc").cast("decimal(38,0)") * lit(tb) -
            col("nb").cast("decimal(38,0)") * lit(tc))).as("s"))
          .head().getDecimal(0)
        num.doubleValue() / (2.0 * tc.toDouble * tb.toDouble)
      }
    } finally { joined.unpersist(); () }
  }

  /** Per micro-batch: compute [[tvd]] against the standing profile and
    * hand `route` the batch, its distance, and the batch id (typical:
    * distance > threshold → quarantine + alert, else ingest). */
  def gateStream(docs: DataFrame, profile: DataFrame, textCol: String)(
      route: (DataFrame, Double, Long) => Unit): DataStreamWriter[Row] =
    measuredStream(docs, b => tvd(profile, b, textCol))(route)

  // ------------------------------------------------------- embeddings

  /** Standing per-dimension profile of the corpus embedding column:
    * (dim, n_corpus, s_corpus) with DECIMAL sums, persisted, with a
    * release handle — the vector-side twin of [[corpusProfile]]
    * (mirrors the batch audit q_ann_embedding_drift). */
  def embeddingProfile(corpus: DataFrame, vecCol: String): (DataFrame, () => Unit) = {
    val p = dimSums(corpus, vecCol, "n_corpus", "s_corpus").persist()
    (p, () => { p.unpersist(); () })
  }

  /**
   * Mean per-dimension displacement between the corpus profile and
   * `batch`: avg over the UNION of dims of |mean_corpus − mean_batch|.
   * A shifted encoder or a new source moves the batch centroid before
   * it degrades ANN recall — this is the alarm — and a DIMENSIONALITY
   * change is the loudest form of it: the dim join is full-outer and a
   * side with no values contributes mean 0, so a 32-dim batch against
   * a 768-dim profile alarms with the 736 missing dims' |mean_corpus|
   * instead of silently averaging the shared prefix. Either side
   * empty (no batch vectors, or a profile built from an empty corpus)
   * returns 0, as in [[tvd]].
   *
   * Determinism: per-dim diffs are doubles (deterministic per row),
   * rounded to 12 dp and summed in DECIMAL, so the cross-dim total is
   * independent of partial-sum order — the same convention the TVD
   * sum follows. One aggregation action per call.
   */
  def embeddingDist(profile: DataFrame, batch: DataFrame, vecCol: String): Double = {
    val joined = profile
      .join(dimSums(batch, vecCol, "n_batch", "s_batch"), Seq("dim"), "full_outer")
    def meanOf(n: String, s: String): Column =
      when(coalesce(col(n), lit(0L)) > 0,
        col(s).cast("double") / col(n)).otherwise(lit(0.0))
    val diff = round(abs(meanOf("n_corpus", "s_corpus") -
      meanOf("n_batch", "s_batch")), 12).cast("decimal(38,12)")
    // either side empty → 0, the tvd convention: no corpus profile is
    // no evidence of drift (bootstrap), and no batch vectors is the
    // dq gate's finding, not drift
    val r = joined.agg(
      coalesce(sum(coalesce(col("n_batch"), lit(0L))), lit(0L)).as("nb"),
      coalesce(sum(coalesce(col("n_corpus"), lit(0L))), lit(0L)).as("nc"),
      sum(diff).as("s"), count(lit(1)).as("d")).head()
    if (r.getLong(0) == 0L || r.getLong(1) == 0L || r.getLong(3) == 0L) 0.0
    else r.getDecimal(2).doubleValue() / r.getLong(3)
  }

  /** Per micro-batch [[embeddingDist]] against the standing profile. */
  def embeddingGateStream(docs: DataFrame, profile: DataFrame,
      vecCol: String)(
      route: (DataFrame, Double, Long) => Unit): DataStreamWriter[Row] =
    measuredStream(docs, b => embeddingDist(profile, b, vecCol))(route)

  /** Per-dim (dim, non-null count, DECIMAL sum) of an embedding
    * column — the q_ann_embedding_drift aggregation shape: one narrow
    * posexplode, dims-row shuffle, map-side combined. The count is of
    * VALUES (count(v), not count(*)) so null elements can't bias a
    * dim's mean low or dilute the drift average. */
  private def dimSums(df: DataFrame, vecCol: String,
      nName: String, sName: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .select((col("__pos").cast("long") + 1).as("dim"),
        col("__v").cast("decimal(28,10)").as("v"))
      .groupBy("dim")
      .agg(count(col("v")).as(nName), sum(col("v")).as(sName))

  /** The shared foreachBatch shell: persist the batch, run `measure`,
    * hand (batch, measure, batchId) to the router, release. */
  private def measuredStream(docs: DataFrame, measure: DataFrame => Double)(
      route: (DataFrame, Double, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try route(batch, measure(batch), batchId)
        finally batch.unpersist()
        ()
      }
}
