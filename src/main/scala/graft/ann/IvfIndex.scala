package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTED trained-IVF index — the at-rest form of the
 * [[Similarity.trainCentroidsDistributed]] +
 * [[Similarity.ivfTopK]] pair, separating the two costs a production
 * ANN service must not conflate:
 *
 *   - TRAIN (rare): sampled Lloyd seed + full-corpus refinement rounds,
 *     then ONE assignment pass laying the corpus out cell-partitioned —
 *     [[write]], run per corpus snapshot;
 *   - PROBE (constant): read K centroid rows, pick nprobe cells on the
 *     driver, scan ONLY those cells' partitions (directory-level
 *     partition pruning — non-probed cells are never opened), exact
 *     cosine rerank — [[probe]], run per query batch.
 *
 * A harness that retrains per run (the pre-round-8 q_ann_ivf_trained)
 * charges every probe the training bill; at 100 TB the trained index
 * is days of standing state and the probe is the only recurring cost.
 *
 * Layout under `path`:
 *   - `centroids/` — K rows (cell, weights array<double>);
 *   - `corpus/cell=<i>/` — (id, vec) parquet, partitioned by cell, so
 *     `cell IN (...)` prunes at the directory level.
 *
 * The probe's output contract is IDENTICAL to the in-query
 * [[Similarity.ivfTopK]] (same centroids ⇒ same cells, floats
 * round-trip parquet exactly, same rerank) — pinned by the
 * q_ann_ivf_trained golden hash and the equality case in AnnLayoutSpec.
 */
object IvfIndex {

  /** Train-side write: centroids + the corpus laid out cell-partitioned
    * (one assignment pass — K plan-constant dots per row, no shuffle;
    * the write's only exchange is the partitioned output itself). */
  def write(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]], path: String): Unit = {
    require(centroids.nonEmpty, "IvfIndex.write needs at least one centroid")
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "weights")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.assignWithVectors(corpus, idCol, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
  }

  /** Read back the trained centroids (K rows — driver-side by
    * construction, like every centroid structure here). */
  def readCentroids(spark: SparkSession, path: String): Seq[Array[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray).toSeq

  /** Probe-side read: load centroids, scan only the probed cells'
    * partitions, exact cosine rerank ([[Similarity.ivfTopKAssigned]]).
    * Callers probing repeatedly should [[readCentroids]] once and use
    * [[probeResident]] — the K·dims centroid matrix is the RAM-resident
    * half of an IVF index; only the cells live at rest. */
  def probe(spark: SparkSession, path: String,
      queries: Seq[(Long, Array[Double])], idCol: String, vecCol: String,
      nprobe: Int, k: Int): DataFrame =
    probeResident(spark, path, readCentroids(spark, path), queries,
      idCol, vecCol, nprobe, k)

  /** [[probe]] with the centroids already resident: the steady-state
    * per-query-batch cost is ONLY the pruned cell scan + rerank. */
  def probeResident(spark: SparkSession, path: String,
      centroids: Seq[Array[Double]], queries: Seq[(Long, Array[Double])],
      idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    val assigned = spark.read.parquet(s"$path/corpus")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("cell"))
    Similarity.ivfTopKAssigned(assigned, queries, centroids, nprobe, k)
  }
}
