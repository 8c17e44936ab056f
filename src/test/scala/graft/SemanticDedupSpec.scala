package graft

import org.apache.spark.sql.Row

import graft.ann.Similarity

/**
 * Invariants of the SemDeDup keep rule (Similarity.semanticDedup),
 * checked against a brute-force in-memory recompute so a future change
 * to the join/aggregation shape can't silently alter the semantics.
 * The cell partition is taken FROM the operator's own output — the
 * spec pins the shadow rule given an assignment, not the argmax
 * (that's ivfTopK's contract, covered by AnnRecallSpec).
 */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 16

  private def lcg(s: Long): Long =
    s * 6364136223846793005L + 1442695040888963407L
  private def unit(seed: Long): Array[Double] = {
    var s = lcg(seed)
    val v = Array.fill(Dims) {
      s = lcg(s); (s >>> 11).toDouble / (1L << 53).toDouble - 0.5 }
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // 3 well-separated unit centers; 60 points = center + small noise so
  // within-cluster cosines are high and cross-cluster ones are not.
  private val centers = (0 until 3).map(c => unit(500 + c))
  private val points: Seq[(Long, Array[Float])] = (0L until 60L).map { i =>
    val c = centers((i % 3).toInt)
    val noise = unit(900 + i)
    (i, c.indices.map(d => (c(d) + 0.1 * noise(d)).toFloat).toArray)
  }
  private lazy val df = points.toDF("vec_id", "embedding")

  private def run(threshold: Double): Seq[Row] =
    Similarity.semanticDedup(df, "vec_id", "embedding", centers, threshold)
      .orderBy("vec_id").collect().toSeq

  test("semantic dedup: verdicts match a brute-force within-cell recompute") {
    val threshold = 0.6
    val rows = run(threshold)
    assert(rows.size == points.size)
    val vecs = points.toMap
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val shadows = points.map(_._1).filter(a =>
        a < id && cellOf(a) == cellOf(id) &&
          cos(vecs(a), vecs(id)) >= threshold)
      val dropped = r.getBoolean(2)
      assert(dropped == shadows.nonEmpty, s"vec $id dropped=$dropped")
      if (shadows.nonEmpty) {
        assert(r.getLong(3) == shadows.min, s"vec $id shadow_id")
        val expect = BigDecimal(shadows.map(a => cos(vecs(a), vecs(id))).max
          ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(4) - expect) < 2e-6, s"vec $id max_sim")
      } else {
        assert(r.isNullAt(3) && r.isNullAt(4), s"kept vec $id carries shadow")
      }
    }
    // the clustered fixture must actually exercise both verdicts
    assert(rows.count(_.getBoolean(2)) > 0 &&
      rows.count(r => !r.getBoolean(2)) > 0)
  }

  test("semantic dedup: threshold endpoints") {
    // above any cosine: nothing shadowed
    assert(run(1.5).forall(r => !r.getBoolean(2)))
    // at the cosine floor every pair qualifies: exactly the lowest id
    // per cell survives and every drop's shadow IS that cell minimum
    val all = run(-1.0)
    val cellMin = all.groupBy(_.getInt(1))
      .map { case (c, rs) => c -> rs.map(_.getLong(0)).min }
    all.foreach { r =>
      val isMin = r.getLong(0) == cellMin(r.getInt(1))
      assert(r.getBoolean(2) == !isMin)
      if (!isMin) assert(r.getLong(3) == cellMin(r.getInt(1)))
    }
  }

  test("at-rest semantic dedup ≡ in-query rule on the same trained centroids") {
    import java.nio.file.Files
    import graft.ann.IvfIndex
    val sf = "/root/testdata/sf0.001"
    val emb = Tables(spark, sf, "embeddings")
    val cents = Similarity.trainCentroidsDistributed(
      emb, "vec_id", "embedding", 8, refineIters = 2)
    val root = Files.createTempDirectory("graft-semdedup-idx").toString + "/idx"
    IvfIndex.write(emb, "vec_id", "embedding", cents, root)
    val threshold = 0.3

    val atRest = IvfIndex.semanticDedup(
      spark, root, "vec_id", "embedding", threshold)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val inQuery = Similarity.semanticDedup(
      emb, "vec_id", "embedding", cents, threshold)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    // floats round-trip parquet exactly and the cell layout was
    // materialized with the same argmax, so the verdicts are
    // bit-identical — not merely close
    assert(atRest == inQuery && atRest.nonEmpty)
    // the fixture exercises both verdicts, or the equality is vacuous
    assert(atRest.count(_(2) == true) > 0 && atRest.count(_(2) == false) > 0)
  }

  test("q_dedup_semantic_trained golden hash at sf0.01 (oracle-less query)") {
    // Trained centroids make this query non-SQL-expressible, so the
    // driver only row-counts it; this pinned hash is its correctness
    // gate (same convention as q_ann_ivf_trained). Any change to
    // training, assignment, the shadow rule, or the at-rest layout
    // that alters the output must consciously re-pin.
    val out = SparkEntry.queries("q_dedup_semantic_trained")(
      spark, "/root/testdata/sf0.01")
      .collect()
      .map { r =>
        val shadow = if (r.isNullAt(3)) "-" else r.getLong(3).toString
        val sim = if (r.isNullAt(4)) "-" else r.getDouble(4).toString
        s"${r.getLong(0)}|${r.getInt(1)}|${r.getBoolean(2)}|$shadow|$sim"
      }
      .mkString("\n")
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(out.getBytes("UTF-8")).map("%02x".format(_)).mkString
    info(s"q_dedup_semantic_trained sf0.01 hash=$hash rows=${out.linesIterator.size}")
    assert(hash == "ee5e8d6f6b6b757dbc8c5f84c6314262", s"golden hash drifted: $hash")
  }
}
