package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.ann.{EmbedIndex, Similarity}

/**
 * Property pin for the point probe's DRIVER-LOCAL verify arithmetic
 * (`vecDoubles` + `cosineLocalMin` + the replicated `round(_, 6)`),
 * which must be bit-identical to the Catalyst expression path
 * ([[Similarity.cosine]] over `vector_dot`) that [[EmbedIndex
 * .probeAtRest]] and the in-RAM probe evaluate — across the float
 * edge cases a real embedding corpus eventually contains: NaN, ±Inf,
 * ±0, subnormals, huge magnitudes, NULL array slots, and
 * length-mismatched vectors. Seeded, so a failure reproduces.
 *
 * The bucket-assignment side needs no property test: both probe paths
 * derive bkeys from the SAME expression ([[EmbedIndex]]'s bucketRows),
 * so only the verify arithmetic can diverge — exactly what this spec
 * sweeps. Three seeded corpora (dims 4/8/16, ~60 vectors each, planted
 * scaled copies so matches exist) are probed through all three paths;
 * the (batch_id, corpus_id, cos) sets must be equal, cosines included.
 * Each corpus is then devolved to layout 1 and migrated in place, and
 * the equality must hold again — the migration leg of the property.
 */
class EmbedProbePropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = true))))

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  /** Cosines compared by CANONICAL BITS (doubleToLongBits): set
    * semantics over primitive NaN never-equals would treat every NaN
    * row as unique and the comparison could never hold. */
  private def pairs(d: DataFrame): Set[(Long, Long, Long)] =
    d.select("batch_id", "corpus_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet

  test("probe ≡ probeAtRest ≡ in-RAM on seeded adversarial corpora (specials, nulls, length mismatch)") {
    val rnd = new scala.util.Random(20260816L)
    val specials: Array[Any] = Array(
      0f, -0f, Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
      Float.MinPositiveValue, 1e-30f, -1e30f, null)
    for (dims <- Seq(4, 8, 16)) {
      val p = EmbedIndex.Params(bands = 2, planesPerBand = 4, dims = dims)
      def vec(): Seq[Any] = {
        // occasional short vector: the verify must score it like the
        // min-length vector_dot expression, never throw
        val len = if (rnd.nextInt(10) == 0) dims - 1 else dims
        Seq.fill(len)(rnd.nextInt(12) match {
          case 0 => specials(rnd.nextInt(specials.length))
          case _ => rnd.nextGaussian().toFloat.asInstanceOf[Any]
        })
      }
      val corpusRows = (0L until 60L).map(i => Row(i, vec()))
      // batch: positive-scaled copies of corpus vectors (same LSH
      // buckets — scaling preserves projection signs, NaN stays NaN —
      // cosine exactly 1 for finite nonzero) plus fresh vectors
      val batchRows = (0 until 15).map { j =>
        val src = corpusRows(rnd.nextInt(60)).getSeq[Any](1)
        Row(1000L + j, src.map {
          case null => null
          case f: Float => (f * 2f).asInstanceOf[Any]
        })
      } ++ (0 until 5).map(j => Row(2000L + j, vec())) ++
        // DUPLICATE batch ids with independent vectors (a same-batch
        // re-embedding): each version must meet exactly the buckets IT
        // hashed to — the point probe once paired every version with
        // every bucket ANY version hit, diverging from the join paths
        // precisely here
        (0 until 4).flatMap(j =>
          Seq(Row(3000L + j, vec()), Row(3000L + j, vec())))
      val corpus = df(corpusRows)
      val batch = df(batchRows)
      val root = java.nio.file.Files
        .createTempDirectory("graft-embprop").toString
      val path = s"$root/emb"
      val (idx, release) = Similarity.corpusEmbedIndex(corpus, "vec_id",
        "embedding", p.bands, p.planesPerBand, p.dims)
      try {
        EmbedIndex.write(corpus, "vec_id", "embedding", path, p)
        val inRam = pairs(Similarity.probeEmbedIndex(batch, idx, "vec_id",
          "embedding", p.bands, p.planesPerBand, p.dims, 0.5))
        val point = pairs(EmbedIndex.probe(batch, path, "vec_id",
          "embedding", 0.5))
        val scan = pairs(EmbedIndex.probeAtRest(batch, path, "vec_id",
          "embedding", 0.5))
        assert(point == inRam,
          s"dims=$dims: point probe diverged from in-RAM:\n" +
            s"only-point=${point -- inRam}\nonly-inram=${inRam -- point}")
        assert(scan == inRam,
          s"dims=$dims: scan probe diverged from in-RAM:\n" +
            s"only-scan=${scan -- inRam}\nonly-inram=${inRam -- scan}")
        assert(inRam.nonEmpty,
          s"dims=$dims: fixture must produce matches (planted copies)")
        // the MIGRATION path under the same adversarial data: devolve
        // to layout 1 and migrate in place — the rebuilt posting list
        // re-derives from vecs through the shared bucketRows body, so
        // probes must still equal the in-RAM contract bit-for-bit
        // (specials, null slots, and short vectors included)
        EmbedFixtures.devolveToLayout1(spark, path)
        assert(EmbedIndex.migrateLayout(spark, path))
        assert(pairs(EmbedIndex.probe(batch, path, "vec_id",
          "embedding", 0.5)) == inRam,
          s"dims=$dims: point probe diverged after migration")
        assert(pairs(EmbedIndex.probeAtRest(batch, path, "vec_id",
          "embedding", 0.5)) == inRam,
          s"dims=$dims: scan probe diverged after migration")
      } finally {
        release()
        EmbedIndex.delete(spark, root)
      }
    }
  }
}
