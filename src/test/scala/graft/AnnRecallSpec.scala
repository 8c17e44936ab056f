package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann.Similarity

/**
 * Recall instrumentation for the approximate ANN paths — a regression
 * guard for every future bucketing/probing/centroid change. Floors are
 * pinned a margin below the measured values at these fixed seeds, so a
 * change that quietly tanks recall fails loudly while noise does not.
 */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"
  private val Dims = 64

  private def topKSet(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }

  /** Mean over queries of |approx ∩ exact| / |exact|. */
  private def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val (a, e) = (topKSet(approx), topKSet(exact))
    val per = e.map { case (q, truth) =>
      a.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size }
    per.sum / per.size
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF recall@5: trained k-means centroids >= first-K, both above floor") {
    // Clustered fixture: 4 well-separated unit centers (LCG-seeded),
    // 200 points = center + small deterministic noise. First-K
    // centroids all land in cluster 0's neighborhood (ids 0..3 are
    // consecutive points of one cluster), so k-means must win or tie.
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    def unit(seed: Long): Array[Double] = {
      var s = lcg(seed)
      val v = Array.fill(Dims) { s = lcg(s); (s >>> 11).toDouble / (1L << 53).toDouble - 0.5 }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = (0 until 4).map(c => unit(1000 + c))
    val points = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      val noise = unit(2000 + i)
      (i, c.indices.map(d => c(d) + 0.15 * noise(d)).toArray)
    }
    // cluster-major ids: 0..49 are cluster 0, 50..99 cluster 1, …
    val clusterMajor = points.sortBy { case (i, _) => (i % 4, i) }
      .zipWithIndex.map { case ((_, v), nid) => (nid.toLong, v.map(_.toFloat)) }
    val df = clusterMajor.toDF("vec_id", "embedding")
    val queries = clusterMajor.take(8)
      .map { case (i, v) => (i, v.map(_.toDouble)) }
    val exact = Similarity.bruteForceTopK(
      df, df.filter(col("vec_id") < 8), "vec_id", "embedding", 5)

    val firstK = clusterMajor.take(4).map(_._2.map(_.toDouble)).toSeq
    val trained = Similarity.trainCentroids(df, "vec_id", "embedding", k = 4)
    val rFirst = recallAtK(
      Similarity.ivfTopK(df, queries, "vec_id", "embedding", firstK, 1, 5), exact)
    val rTrained = recallAtK(
      Similarity.ivfTopK(df, queries, "vec_id", "embedding", trained, 1, 5), exact)
    info(s"IVF recall@5 firstK=$rFirst trained=$rTrained")
    assert(rTrained >= rFirst, s"trained $rTrained < firstK $rFirst")
    assert(rTrained >= 0.9, s"trained recall $rTrained below floor")

    // distributed refinement (full-corpus assignment + decimal-sum
    // updates) must hold the sampled trainer's recall on the clustered
    // fixture and stay deterministic across runs
    val refined = Similarity.refineCentroids(
      df, "embedding", trained, iters = 2)
    val refined2 = Similarity.refineCentroids(
      df, "embedding", trained, iters = 2)
    assert(refined.map(_.toSeq) == refined2.map(_.toSeq),
      "distributed refinement must be deterministic")
    val rRefined = recallAtK(
      Similarity.ivfTopK(df, queries, "vec_id", "embedding", refined, 1, 5), exact)
    info(s"IVF recall@5 refined=$rRefined")
    assert(rRefined >= rTrained, s"refined $rRefined < sampled $rTrained")
    assert(rRefined >= 0.9, s"refined recall $rRefined below floor")
  }

  test("trainCentroids is deterministic and respects k/sample bounds") {
    val df = (0L until 50L).map(i => (i, Array.fill(8)((i % 7).toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.trainCentroids(df, "vec_id", "embedding", 3, 32, 5)
    val b = Similarity.trainCentroids(df, "vec_id", "embedding", 3, 32, 5)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.length == 3 && a.head.length == 8)
    intercept[IllegalArgumentException] {
      Similarity.trainCentroids(df, "vec_id", "embedding", 60)
    }
  }

  test("oracle xxh64Long matches Spark's xxhash64 (the sample-order key)") {
    // The trained-pair oracle restates the trainer's xxhash64 sample
    // order in SQL; its Scala-side constant derivation (XxRowInit)
    // chains through the same hashLong — pin that chain against the
    // engine's own expression over a spread of magnitudes, including
    // negative ids (the oracle's wraparound arm).
    val ids = Seq(0L, 1L, 2L, 499L, 123456789L, Long.MaxValue, -1L,
      Long.MinValue, -987654321L)
    val expect = ids.toDF("id")
      .select(col("id"), xxhash64(lit(42L), col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mod = BigInt(1) << 64
    val inner = graft.ann.AnnQueries.xxh64Long(BigInt(42), BigInt(42))
    ids.foreach { id =>
      val u = if (id < 0) BigInt(id) + mod else BigInt(id)
      val h = graft.ann.AnnQueries.xxh64Long(u, inner)
      val signed = if (h >= (BigInt(1) << 63)) h - mod else h
      assert(signed.toLong == expect(id), s"xxh64 mismatch for id=$id")
    }
    // and the folded-constant form the SQL actually uses: INIT is the
    // running hash after the leading lit(42L) field
    assert(graft.ann.AnnQueries.XxRowInit ==
      (inner + BigInt("27D4EB2F165667C5", 16) + 8) % mod)
  }

  test("q_ann_ivf_trained golden hash at sf0.01 (regression armor)") {
    // The trained pair is oracle-backed since round 15 (the seeded
    // Lloyd chain restated in DuckDB SQL); this pinned hash stays as
    // belt-and-braces regression armor on the Spark side alone.
    // Any change to sampling, seeding, assignment, or refinement that
    // alters the output must consciously re-pin.
    val out = SparkEntry.queries("q_ann_ivf_trained")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getInt(1)}|${r.getLong(2)}|${r.getDouble(3)}")
      .mkString("\n")
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(out.getBytes("UTF-8")).map("%02x".format(_)).mkString
    info(s"q_ann_ivf_trained sf0.01 hash=$hash rows=${out.linesIterator.size}")
    assert(hash == "33deb5d510c9f9ea5db0d9ffe6fcad46", s"golden hash drifted: $hash")
  }

  test("trained-oracle drift tripwire: DuckDB evaluates the full trained SQL chain at sf0.001 (VERDICT r15 #8)") {
    // CentroidK/Dims/TrainRefineIters are interpolated into ~12
    // materialized CTE stages of the DuckDB restatement; a constant
    // bump that breaks the ORACLE side (HUGEINT overflow in mul64,
    // CTE-chain blowup) would otherwise surface only as a red driver
    // row. This runs the driver-replica compare (tools/check.py, the
    // same canon/diff the driver applies) over exactly the trained
    // pair, in-process, so `sbt test` trips before the driver does.
    import scala.sys.process._
    val probe = Process(Seq("python3", "-c", "import duckdb, pandas")).!(
      ProcessLogger(_ => ()))
    assume(probe == 0, "python3+duckdb not available on this box")
    val script = Seq("tools/check.py", "/root/repo/tools/check.py")
      .map(new java.io.File(_)).find(_.exists)
      .getOrElse(fail("tools/check.py not found")).getAbsolutePath
    val sfDir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files
      .createTempDirectory("graft-oracle-trip").toString
    val names = Seq("q_ann_ivf_trained", "q_dedup_semantic_trained")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$out/$n")
    }
    def jsonStr(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"").replace("\n", "\\n")
      .replace("\r", "\\r").replace("\t", "\\t") + "\""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      names.map(n => s"${jsonStr(n)}: ${jsonStr(SparkEntry.oracleSql(n))}")
        .mkString("{", ",", "}").getBytes("UTF-8"))
    val buf = new StringBuilder
    val exit = Process(Seq("python3", script, sfDir, out, "--subset"))
      .!(ProcessLogger(l => { buf.append(l).append('\n'); () }))
    assert(exit == 0 && buf.toString.contains("2/2 ok"),
      s"trained-oracle DuckDB evaluation failed:\n$buf")
  }

  test("sf0.001 recall floors: IVF top-k and LSH/banded near-dup pairs") {
    import graft.ann.AnnQueries.{NearDupThreshold, NearDupBands, NearDupBandPlanes}
    val emb = Tables(spark, Sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val exactTop = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5)

    val trained = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val rIvf = recallAtK(Similarity.ivfTopK(
      emb, queries, "vec_id", "embedding", trained, 2, 5), exactTop)

    // exact near-dup ground truth: all pairs with cosine >= threshold
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val truePairs = pairSet(base.as("x").crossJoin(base.as("y"))
      .filter(col("x.id") < col("y.id"))
      .filter(Similarity.cosine(col("x.v"), col("y.v")) >= NearDupThreshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")))
    val np = Similarity.adaptivePlanes(emb.count())
    val rLsh = pairSet(Similarity.lshNearDupPairs(
      emb, "vec_id", "embedding", np, Dims, NearDupThreshold))
      .intersect(truePairs).size.toDouble / truePairs.size
    val rBanded = pairSet(Similarity.bandedNearDupPairs(
      emb, "vec_id", "embedding", NearDupBands, NearDupBandPlanes, Dims,
      NearDupThreshold)).intersect(truePairs).size.toDouble / truePairs.size
    info(f"sf0.001 recall: ivf=$rIvf%.3f lsh=$rLsh%.3f banded=$rBanded%.3f " +
      s"(truePairs=${truePairs.size})")
    // not a structural invariant (different plane sets: 5 adaptive vs
    // 3×6 banded) but deterministic at these seeds — a pinned guard
    assert(rBanded >= rLsh - 1e-9,
      "banding (OR-amplification) lost recall vs the single band")
    // floors pinned below measured (ivf .650, lsh .091, banded .141) at
    // these seeds — the corpus is near-random, so near-dup recall at
    // cos>=0.2 (a ~78° angle) is structurally low for hyperplane LSH;
    // the guard is against regressions, not a quality bar
    assert(rIvf >= 0.55, s"IVF recall $rIvf below floor")
    assert(rLsh >= 0.06, s"LSH recall $rLsh below floor")
    assert(rBanded >= 0.11, s"banded recall $rBanded below floor")
  }
}
