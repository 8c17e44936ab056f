package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.dedup.Dedup
import graft.multimodal.{Multimodal, MultimodalQueries}
import graft.text.TextAnalysis

/** Unit coverage for the training-data pipeline operators. */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("tokenization, counts, and ratios") {
    val df = Seq("The  cat, sat. On THE mat!").toDF("text").select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      size(TextAnalysis.bpeTokens(col("text"))).as("nb"),
      TextAnalysis.stopwordRatio(col("text")).as("sr"),
      TextAnalysis.punctRatio(col("text")).as("pr"))
    val r = df.head()
    assert(r.getAs[Int]("n") == 6)          // the cat, sat. on the mat!
    assert(r.getAs[Int]("nb") == 9)         // the cat , sat . on the mat !
    assert(r.getAs[Double]("sr") == 0.333333) // 'the' ×2 of 6 tokens
    assert(r.getAs[Double]("pr") > 0)
  }

  test("language ID picks marker language; und when no evidence") {
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("der hund und die katze", "de"),
      ("le chat et la maison est grande", "fr"),
      ("你好世界", "zh"),
      ("xyzzy plugh", "und"),
      // tie-break: one 'the' (en) vs one 'der' (de) — equal scores,
      // LangMarkers order wins (the r21 argmax-array rewrite must
      // preserve the when-chain's first-language-wins rule)
      ("the der", "en"),
      // es-vs-fr tie on shared marker 'la' plus one each: es first
      ("la el le", "es"),
      ("", "und")).toDF("text", "want")
      .select(col("want"), TextAnalysis.langId(col("text")).as("got"))
    df.collect().foreach(r => assert(r.getString(1) == r.getString(0),
      s"want ${r.getString(0)}"))
    // NULL text scores NULL everywhere → und (the when-chain's
    // null-condition fallthrough, preserved by the array form)
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.langId(col("text")).as("got")).head()
    assert(nulls.getString(0) == "und")
  }

  test("char fingerprint is deterministic and order-sensitive") {
    val df = Seq("abc", "acb", "abc").toDF("t")
      .select(TextAnalysis.charFingerprint(col("t")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(2) && fps(0) != fps(1))
    assert(fps(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("exact-dup hash collapses case/punctuation variants") {
    val df = Seq("Hello,  World!", "hello world", "different doc").toDF("t")
      .select(Dedup.exactHash(col("t")).as("h"))
    val hs = df.collect().map(_.getString(0))
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }

  test("identical docs get identical minhash signatures; disjoint docs differ") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.minhashSignature(col("text")).as("sig"))
    val sigs = docs.orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("near-dup funnel finds the planted pair and skips unrelated docs") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, words), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getDouble(2) > 0.8)
  }

  test("degenerate docs (< 3 tokens) never band together") {
    val docs = Seq((1L, "only two"), (2L, "tiny doc"), (3L, "x y"),
      (4L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (5L, (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.1).collect()
    // 4-5 are identical; 1/2/3 have empty shingle sets and must not pair
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 5L)))
  }

  test("adaptive LSH plane count keeps expected bucket size bounded") {
    import Similarity._
    assert(adaptivePlanes(1) == MinPlanes)
    assert(adaptivePlanes(TargetBucketSize << 4) == 4)     // exact fit
    assert(adaptivePlanes((TargetBucketSize << 4) + 1) == 5)
    assert(adaptivePlanes(500) == 5)
    assert(adaptivePlanes(5000) == 9)
    assert(adaptivePlanes(Long.MaxValue / 4) == MaxPlanes) // clamped
    // bucket-size bound n ≤ target·2^p holds up to the clamp point
    for (n <- Seq(100L, 1000L, 100000L, TargetBucketSize << MaxPlanes)) {
      val p = adaptivePlanes(n)
      assert(n <= (1L << p) * TargetBucketSize, s"n=$n p=$p")
    }
  }

  test("seeded shuffle: reproducible deal, balanced shards, sources interleave") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_sample_shuffle")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // same seed ⇒ the identical deal, bit for bit
    val again = SparkEntry.queries("q_sample_shuffle")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == again && rows.nonEmpty)
    // every doc dealt exactly once; positions are 1..|shard| per shard
    assert(rows.map(_._1).distinct.size == rows.size)
    val byShard = rows.groupBy(_._2)
    byShard.values.foreach(s =>
      assert(s.map(_._3).sorted == (1L to s.size).toSeq))
    // LCG uniformity: no shard more than twice the mean
    val mean = rows.size / byShard.size
    assert(byShard.values.map(_.size).max <= 2 * mean,
      s"unbalanced shards: ${byShard.values.map(_.size).max} vs mean $mean")
    // the interleave claim: reading a shard in pos order never dwells
    // on one source — with 20 uniform sources a same-source run of
    // even 8 would be ~1-in-millions by chance
    val src = Tables(spark, dir, "documents").select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val maxRun = byShard.values.map { s =>
      val ordered = s.sortBy(_._3).map(t => src(t._1))
      ordered.foldLeft((0, 0, "")) { case ((best, cur, prev), x) =>
        val c = if (x == prev) cur + 1 else 1
        (math.max(best, c), c, x)
      }._1
    }.max
    assert(maxRun <= 8, s"sources do not interleave: max run $maxRun")
  }

  test("shuffle deal property: permutation, valid shards, seeds re-deal membership") {
    val docs = (0L until 400L).map(i => Tuple1(i)).toDF("doc_id")
    val deals = Seq(1L, 2L, 3L, 4L, 5L).map { seed =>
      val rows = Dedup.shuffleDeal(docs, "doc_id", seed, 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // a deal is a permutation into valid shards
      assert(rows.size == 400 && rows.values.forall(s => s >= 0 && s < 8))
      seed -> rows
    }.toMap
    // different seeds must actually RE-DEAL shard membership (the
    // low-bit shard key failed exactly this: seed-invariant cosets)
    val pairs = for (a <- deals.keys; b <- deals.keys if a < b) yield (a, b)
    // a uniform re-deal moves 1−1/shards = 7/8 of docs in expectation;
    // 5/8 is the regression floor (the affine-key bug moved ~1/5)
    pairs.foreach { case (a, b) =>
      val moved = deals(a).count { case (id, s) => deals(b)(id) != s }
      assert(moved > 250,
        s"seeds $a/$b moved only $moved of 400 docs between shards")
    }
    // non-power-of-two shard counts are rejected (high-bit split)
    intercept[IllegalArgumentException] {
      Dedup.shuffleDeal(docs, "doc_id", 1L, 12)
    }
  }

  test("hashed-gram span coverage ≡ string-keyed audit at sf0.01") {
    // Dedup.spanCoverageHashed trades the gram-string shuffle key for
    // two xxhash64 longs (fixed-width shuffle rows — the 100 TB form);
    // barring a 128-bit collision the audit is unchanged, and this
    // pins that equivalence on the real corpus at the driver's gate
    // scale.
    val dir = "/root/testdata/sf0.01"
    val stringKeyed = SparkEntry.queries("q_dedup_span_coverage")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val hashed = Dedup.spanCoverageHashed(
        Tables(spark, dir, "documents"), "doc_id", "text",
        graft.dedup.DedupQueries.SpanGramLen)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(hashed == stringKeyed && hashed.nonEmpty)
  }

  test("blocked prefix-filter Jaccard ≡ naive in-block pairwise join") {
    // Blocks of varying size; doc ids REUSED across blocks (unique only
    // within a block); a <2-token doc; pairs straddling the threshold.
    val mk = (n: Int, seed: String) => (1 to n).map(i => s"$seed$i").mkString(" ")
    val docs = Seq(
      ("en", "web", 1L, mk(20, "w")),
      ("en", "web", 2L, mk(20, "w") + " tail"),        // ~0.9 vs doc 1
      ("en", "web", 3L, mk(10, "w") + " " + mk(10, "q")), // mid-sim vs 1
      ("en", "web", 4L, mk(20, "z")),                  // unrelated
      ("en", "web", 5L, "solo"),                       // empty shingles
      ("de", "web", 1L, mk(15, "d")),                  // id 1 reused
      ("de", "web", 2L, mk(15, "d") + " mehr"),
      ("en", "book", 9L, mk(12, "b")),                 // singleton block
    ).toDF("lang", "source", "doc_id", "text")
    val naive = {
      val d = docs.select(col("doc_id"), col("lang"), col("source"),
        Dedup.shingles(col("text"), 2).as("sh"))
      d.as("x").join(d.as("y"), Seq("lang", "source"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .withColumn("jaccard", Dedup.jaccard(col("x.sh"), col("y.sh")))
        .filter(col("jaccard") >= 0.3)
        .select(col("lang"), col("source"),
          col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("jaccard"))
    }
    val blocked = Dedup.blockedJaccardPairs(
      docs, Seq("lang", "source"), "doc_id", "text", 2, 0.3)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val (n, b) = (naive.collect().map(key).sortBy(_.toString).toSeq,
      blocked.collect().map(key).sortBy(_.toString).toSeq)
    assert(n.nonEmpty, "fixture must produce pairs")
    assert(b == n)
  }

  test("blockedJaccardPairsManaged release() unpersists both intermediates") {
    // Assertions track the IDS this call adds, never the global count:
    // earlier tests legitimately leave persisted intermediates behind
    // (the unmanaged faces), and Spark's ContextCleaner unpersists
    // unreferenced ones on GC timing — a count-based assert flakes
    // whenever a cleanup lands mid-test.
    val docs = Seq(("en", 1L, "a b c d"), ("en", 2L, "a b c e"))
      .toDF("lang", "doc_id", "text")
    def ids = spark.sparkContext.getPersistentRDDs.keySet
    val before = ids
    val (pairs, release) = Dedup.blockedJaccardPairsManaged(
      docs, Seq("lang"), "doc_id", "text", 2, 0.3)
    pairs.collect()
    val added = ids -- before
    assert(added.size == 2, s"expected 2 new cached intermediates, got $added")
    release()
    assert((ids & added).isEmpty, "release() must unpersist both")
  }

  test("managed LSH funnels release their signature caches; results unchanged") {
    val mk = (seed: String) => (1 to 20).map(i => s"$seed$i").mkString(" ")
    val docs = Seq((1L, mk("w")), (2L, mk("w") + " tail"), (3L, mk("z")))
      .toDF("doc_id", "text")
    val corpus = Seq((10L, mk("w")), (11L, mk("q"))).toDF("doc_id", "text")
    // id-set tracking, not global counts — see the release() test above
    def ids = spark.sparkContext.getPersistentRDDs.keySet

    val before1 = ids
    val (pairs, relPairs) = Dedup.nearDupPairsManaged(docs, "doc_id", "text", 0.5)
    val gotPairs = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotPairs == Seq((1L, 2L)))
    val addedPairs = ids -- before1
    assert(addedPairs.size == 1, s"expected 1 new cache, got $addedPairs")
    relPairs()
    assert((ids & addedPairs).isEmpty)

    val before2 = ids
    val (est, relEst) = Dedup.minhashEstimatePairsManaged(docs, "doc_id", "text")
    assert(est.collect().nonEmpty)
    relEst()
    val lingerEst = ids -- before2
    assert(lingerEst.isEmpty, s"minhash estimate cache must release: $lingerEst")

    val before3 = ids
    val (inc, relInc) = Dedup.incrementalNearDupManaged(
      docs, corpus, "doc_id", "text", 0.5)
    val gotInc = inc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotInc == Set((1L, 10L), (2L, 10L)))
    val addedInc = ids -- before3
    assert(addedInc.size == 2, s"expected 2 new caches, got $addedInc")
    relInc()
    assert((ids & addedInc).isEmpty)

    // split build/probe: releasing a probe batch keeps the standing
    // corpus index cached for the next probe
    val before4 = ids
    val (idx, relIdx) = Dedup.corpusNearDupIndex(corpus, "doc_id", "text")
    val (probe, relProbe) = Dedup.probeNearDupIndex(
      docs, idx, "doc_id", "text", 0.5)
    assert(probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == gotInc)
    val addedIdx = ids -- before4
    relProbe()
    assert((ids & addedIdx).size == 1,
      "corpus index must survive a probe release")
    relIdx()
    assert((ids & addedIdx).isEmpty)
  }

  test("incremental cluster maintenance ≡ from-scratch resolve") {
    import graft.dedup.Clusters
    // standing corpus: clusters {1,2,3}, {10,11}, singleton 20
    val corpusDocs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val corpusPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val assignments = Clusters.resolve(corpusDocs, "doc_id",
      corpusPairs, "doc_a", "doc_b").select("doc_id", "cluster")
    // batch: 30 BRIDGES the two standing clusters (the merge case),
    // 31-32 pair with each other, 33 joins singleton 20, 34 is alone,
    // and 0 joins cluster {1,2,3} with an id SMALLER than its rep
    val batchDocs = Seq(30L, 31L, 32L, 33L, 34L, 0L).toDF("doc_id")
    val newPairs = Seq((30L, 3L), (30L, 11L), (31L, 32L), (33L, 20L), (0L, 2L))
      .toDF("doc_a", "doc_b")
    val inc = Clusters.incrementalResolve(assignments, batchDocs, "doc_id",
      newPairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val scratch = Clusters.resolve(
      corpusDocs.unionByName(batchDocs), "doc_id",
      corpusPairs.unionByName(newPairs), "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inc == scratch, s"incremental $inc vs scratch $scratch")
    // the bridge merged {1,2,3}+{10,11}+{30}+{0} under min id 0
    assert(inc.contains((30L, 0L, 0)) && inc.contains((10L, 0L, 0)) &&
      inc.contains((1L, 0L, 0)) && inc.contains((0L, 0L, 1)))
    assert(inc.contains((34L, 34L, 1)), "edge-free batch doc stays a singleton")
  }

  test("incremental cluster maintenance property: ≡ from-scratch on 15 random graphs") {
    import graft.dedup.Clusters
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 15) {
      val nCorpus = 5 + rnd.nextInt(20)
      val nBatch = 1 + rnd.nextInt(10)
      // corpus ids 0..nCorpus-1; batch ids interleave ABOVE AND BELOW
      // (negative) so batch minima sometimes undercut corpus reps
      val corpusIds = (0L until nCorpus.toLong).toSeq
      val batchIds = (0 until nBatch).map(i =>
        if (rnd.nextBoolean()) 100L + i else -1L - i)
      val corpusPairs = Seq.fill(rnd.nextInt(nCorpus * 2))(
        (corpusIds(rnd.nextInt(nCorpus)), corpusIds(rnd.nextInt(nCorpus))))
        .filter(p => p._1 != p._2)
      val all = corpusIds ++ batchIds
      // batch-touching edges: batch↔corpus and batch↔batch
      val newPairs = Seq.fill(rnd.nextInt(3 * nBatch))(
        (batchIds(rnd.nextInt(nBatch)), all(rnd.nextInt(all.length))))
        .filter(p => p._1 != p._2)
      val assignments = Clusters.resolve(corpusIds.toDF("doc_id"), "doc_id",
        corpusPairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .select("doc_id", "cluster")
      val inc = Clusters.incrementalResolve(assignments,
        batchIds.toDF("doc_id"), "doc_id",
        newPairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val scratch = Clusters.resolve(all.toDF("doc_id"), "doc_id",
        (corpusPairs ++ newPairs).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(inc == scratch,
        s"trial $trial: nCorpus=$nCorpus nBatch=$nBatch\ninc=$inc\nscr=$scratch")
    }
  }

  test("incremental probes tolerate empty batch and empty corpus") {
    // day-one shape (standing corpus empty) and quiet-batch shape —
    // every probe must return an empty result, not throw
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val empty = docs.filter(lit(false))
    assert(Dedup.incrementalNearDup(empty, docs, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.incrementalNearDup(docs, empty, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.simhashProbePairs(empty, docs, "doc_id", "text", 5, 6, 2).count() == 0)
    assert(Dedup.simhashProbePairs(docs, empty, "doc_id", "text", 5, 6, 2).count() == 0)
    val exAll = Dedup.incrementalExactDedup(docs, empty, "doc_id", "text")
      .collect()
    assert(exAll.length == 1 && !exAll.head.getBoolean(2),
      "against an empty corpus every batch doc is new")
    assert(Dedup.incrementalExactDedup(empty, docs, "doc_id", "text").count() == 0)
  }

  test("cluster resolution: chains collapse to the min id, singletons keep their own") {
    import graft.dedup.Clusters
    val docs = (1L to 8L).toDF("doc_id")
    // chain 5-4-3-2-1 (diameter 4, forces multiple propagation rounds)
    // plus pair (6,7); 8 is a singleton
    val pairs = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val want = Seq(
      (1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0), (4L, 1L, 0), (5L, 1L, 0),
      (6L, 6L, 1), (7L, 6L, 0), (8L, 8L, 1))
    // local union-find path (default threshold) and the distributed
    // min-propagation path (threshold 0) must agree exactly; 5 and 4
    // bracket the fixture's exact edge count across the r21 bounded
    // probe's local/distributed cutover (probe fetches threshold+1
    // rows — 5 edges ≤ 5 stays local, 5 > 4 falls through)
    Seq(Clusters.LocalEdgeThreshold, 0L, 5L, 4L).foreach { thresh =>
      val got = Clusters.resolve(docs, "doc_id", pairs, "doc_a", "doc_b",
        localThreshold = thresh)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.toSeq == want, s"threshold=$thresh")
    }
  }

  test("large-star/small-star ≡ union-find on a 500-node random graph") {
    import graft.dedup.Clusters
    val rnd = new scala.util.Random(42)
    val n = 500
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val docs = (0L until n.toLong).toDF("doc_id")
    val pairs = edges.toDF("doc_a", "doc_b")
    def run(thresh: Long) =
      Clusters.resolve(docs, "doc_id", pairs, "doc_a", "doc_b",
        localThreshold = thresh)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val local = run(Long.MaxValue) // driver union-find
    val dist = run(0L)             // large-star/small-star
    assert(dist == local)
    assert(local.map(_._2).distinct.length > 1, "fixture has multiple components")
  }

  test("distributed clusters converge in log rounds on a diameter-30 chain") {
    import graft.dedup.Clusters
    val docs = (0L to 30L).toDF("doc_id")
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // localThreshold=0 forces the distributed path; the old
    // diameter-round min-label loop threw here (30 > maxIters=20)
    val got = Clusters.resolve(docs, "doc_id", pairs, "doc_a", "doc_b",
      localThreshold = 0L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.forall(_._2 == 0L), "all 31 chain nodes label to min id 0")
    assert(got.count(_._3 == 1) == 1 && got.head == ((0L, 0L, 1)))
  }

  test("simhash: identical → equal, near-dup → close, unrelated → far (Hamming)") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = words + " extra"
    val other = (1 to 60).map(i => s"q$i").mkString(" ")
    val hs = Seq(words, words, near, other).toDF("t")
      .select(Dedup.simhash16(col("t"))).collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(ham(hs(0), hs(2)) < ham(hs(0), hs(3)))
  }

  test("native simhash16 ≡ 16×aggregate HOF formulation, bit-identical") {
    // Edge shapes: empty, whitespace-only, single token, mixed case,
    // multi-space runs, CJK (code points > 1 UTF-16 unit stay 1 "char"
    // in both folds), long docs, and punctuation-glued tokens.
    val docs = Seq(
      null, "", "   ", "one", "ONE", "Hello  World", "a b c d e f g",
      "中文 測試 文本", "naïve café über", "tok1 tok2,tok3 tok4.",
      (1 to 200).map(i => s"word$i").mkString(" "),
      "\tlead trail \n", "ONE one One oNe").toDF("t")
    val both = docs.select(
      Dedup.simhash16(col("t")).as("native"),
      Dedup.simhash16Hof(col("t")).as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("native charPolyHash ≡ aggregate HOF formulation, incl. NULL/empty/non-BMP") {
    // The HOF folds ascii(substr(i,1)) — code points — so the native
    // pass must agree on multibyte BMP chars AND supplementary-plane
    // code points (surrogate pairs in the JVM string). NULL and ''
    // both hash to 0 on both formulations.
    val docs = Seq(
      null, "", " ", "a", "abc", "The quick brown fox",
      "中文測試", "naïve café", "𝕏 𝄞 𐍈 emoji: 😀🎉",
      "mixed 中 and 😀 planes", (1 to 500).map(_.toString).mkString("|"))
      .toDF("t")
    val both = docs.select(
      TextAnalysis.charPolyHash(col("t")).as("native"),
      TextAnalysis.charPolyHashHof(col("t")).as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("simhash banded pairs ≡ naive quadratic Hamming join (pigeonhole exactness)") {
    // near-dups (1-2 token edits), exact dups, and unrelated docs; the
    // banded candidate set must contain EVERY pair the naive join
    // passes at maxHamming, for several band counts
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),                      // exact dup: hamming 0
      (3L, base + " extra"), (4L, base.replace("tok7", "swapped")),
      (5L, (1 to 40).map(i => s"other$i").mkString(" ")),
      (6L, "short doc"), (7L, "short doc too")
    ).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"), Dedup.simhash60(col("text")).as("fp"))
    val naive = fp.as("x").crossJoin(fp.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming",
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("long"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_a"), col("doc_b"), col("hamming")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    for ((maxH, bands) <- Seq((5, 6), (3, 4), (0, 2), (9, 10))) {
      val n = pairs(naive.filter(col("hamming") <= maxH)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("hamming")))
      val b = pairs(Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxH, bands))
      assert(b == n, s"maxHamming=$maxH bands=$bands")
    }
    // the fixture must actually exercise the operator
    val got = pairs(Dedup.simhashNearDupPairs(docs, "doc_id", "text", 5, 6))
    assert(got.exists(_._3 == 0) && got.nonEmpty)
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 6, 6)
    }

    // WIDE fingerprint (120-bit, 20-bit bands): word 0 must be
    // bit-identical to simhash60, and the pigeonhole equivalence must
    // hold against the naive quadratic join over the FULL 120-bit
    // Hamming distance
    import org.apache.spark.sql.graftshim.GraftShims.{column => toCol, expression => toExpr}
    val wideFp = docs.select(col("doc_id"),
      Dedup.simhash60(col("text")).as("fp60"),
      toCol(graft.functions.SimHashWide(toExpr(col("text")), 2)).as("fpw"))
    wideFp.collect().foreach { r =>
      assert(r.getLong(1) == r.getSeq[Long](2).head,
        s"wide word 0 must equal simhash60 for doc ${r.getLong(0)}")
    }
    val naiveWide = wideFp.as("x").crossJoin(wideFp.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming",
        (bit_count(element_at(col("x.fpw"), 1).bitwiseXOR(element_at(col("y.fpw"), 1))) +
         bit_count(element_at(col("x.fpw"), 2).bitwiseXOR(element_at(col("y.fpw"), 2))))
          .cast("long"))
    for ((maxH, bands) <- Seq((5, 6), (3, 4), (11, 12))) {
      val n = pairs(naiveWide.filter(col("hamming") <= maxH)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("hamming")))
      val b = pairs(Dedup.simhashNearDupPairsWide(
        docs, "doc_id", "text", maxH, bands, words = 2))
      assert(b == n, s"wide maxHamming=$maxH bands=$bands")
    }
    // 15 bands ⇒ 8-bit bands straddling the 60-bit word boundary → rejected
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairsWide(docs, "doc_id", "text", 5, 15, words = 2)
    }

    // the SHARED-fingerprint contract the query layer relies on
    // (DedupQueries.cachedSimhashFp): word 0 sliced from one words=2
    // pass fed through simhashNearDupPairsFromFp ≡ the words=1
    // operator over the raw docs
    val sharedFp = Dedup.simhashFingerprints(docs, "doc_id", "text",
      "doc_id", words = 2)
    assert(pairs(Dedup.simhashNearDupPairsFromFp(
        sharedFp.select(col("doc_id"), slice(col("fp"), 1, 1).as("fp")),
        5, 6, words = 1)) ==
      pairs(Dedup.simhashNearDupPairs(docs, "doc_id", "text", 5, 6)),
      "sliced shared fingerprint must reproduce the words=1 pairs exactly")
  }

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(cs.toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("brute-force top-k returns k ranked neighbors with deterministic ties") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(0.9f, 0.1f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 2).orderBy("rank").collect()
    // 1 and 3 tie on cosine; deterministic tie-break by neighbor id
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L))
  }

  test("LSH bucket is stable and in range") {
    val vecs = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(20)
    val b1 = vecs.select(Similarity.lshBucket(col("embedding"), 8, 64).as("b"))
      .collect().map(_.getLong(0))
    val b2 = vecs.select(Similarity.lshBucket(col("embedding"), 8, 64).as("b"))
      .collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("LCG plane family saturates near 2^10 effective buckets — the documented resolution bound, pinned") {
    // the shared plane family's weights are an arithmetic progression
    // (one LCG striding the flattened (plane, dim) index), so high
    // planes are nearly linearly dependent and the EFFECTIVE bucket
    // count plateaus near ~2^10 regardless of the nominal 2^planes —
    // the reason EmbedIndex's class doc tells operators to shard a
    // corpus past ~targetBucket·2^10 rows across band sets or roots
    // instead of dialing planes up. Until now that bound was a doc
    // sentence; this pins the plateau so a family change that shifts
    // the resolution (either way) shows up as a failing number, and
    // the doc's advice stays calibrated to the code.
    val dims = 16
    val vecs = spark.range(50000).select(
      transform(sequence(lit(0), lit(dims - 1)), j =>
        (pmod(hash(col("id"), j), lit(1000)).cast("double") / 500.0 - 1.0)
          .cast("float")).as("embedding"))
      .persist()
    try {
      def effective(planes: Int): Long =
        vecs.select(Similarity.lshBucket(col("embedding"), planes, dims)
          .as("b")).agg(countDistinct(col("b"))).head().getLong(0)
      val e8 = effective(8)
      val e16 = effective(16)
      // at 8 planes the family still genuinely splits (most of the 256
      // nominal buckets are populated at 50k rows)
      assert(e8 >= 100 && e8 <= 256,
        s"8-plane family resolution drifted: $e8 effective buckets")
      // doubling to 16 planes buys single-digit multiples, NOT the
      // 256× an independent family would: the plateau sits well under
      // 2^12, i.e. near the documented ~2^10
      assert(e16 <= 4096,
        s"16-plane effective buckets $e16 left the documented ~2^10 " +
          "plateau — the family (or its saturation story) changed")
      assert(e16 < e8 * 16L,
        s"8→16 planes multiplied buckets $e8→$e16 — the family no " +
          "longer saturates; update the sharding guidance it anchors")
    } finally {
      vecs.unpersist()
      ()
    }
  }

  test("IVF-flat finds an exact twin through its probed cell") {
    val dims = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(j =>
        (((seed * 31 + j) * 2654435761L % 997).toFloat / 499f) - 1f)
    // vec 30 is an exact twin of vec 2
    val rows = (0L until 40L).map(i =>
      (i, (if (i == 30L) vec(2) else vec(i.toInt)).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val cents = (0 until 4).map(i => vec(i).map(_.toDouble)).toSeq
    val queries = Seq((2L, vec(2).map(_.toDouble)))
    val top = Similarity.ivfTopK(df, queries, "vec_id", "embedding",
      cents, 2, 3).orderBy("rank").collect()
    // the twin shares the query's own cell → guaranteed candidate,
    // exact rerank puts it first with cosine 1
    assert(top.head.getAs[Long]("neighbor_id") == 30L)
    assert(top.head.getAs[Double]("cos") == 1.0)
    assert(top.map(_.getAs[Int]("rank")).toSeq == (1 to top.length))
    // deterministic across plans
    val again = Similarity.ivfTopK(df, queries, "vec_id", "embedding",
      cents, 2, 3).orderBy("rank").collect()
    assert(top.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("banded near-dup ⊇ single-band pairs, ⊆ exact threshold pairs") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(120)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = pairSet(Similarity.bandedNearDupPairs(
      emb, "vec_id", "embedding", 3, 6, 64, 0.2))
    val single = pairSet(Similarity.lshNearDupPairs(
      emb, "vec_id", "embedding", 6, 64, 0.2))
    // band 0 uses planes [0,6) — exactly the single-band plane set —
    // so banded candidates contain every single-band pair
    assert(single.subsetOf(banded), "OR-amplification only adds pairs")
    // every emitted pair passed the exact cosine verify
    val exact = {
      val b = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      pairSet(b.as("x").crossJoin(b.as("y"))
        .filter(col("x.id") < col("y.id"))
        .withColumn("cos", Similarity.cosine(col("x.v"), col("y.v")))
        .filter(col("cos") >= 0.2)
        .select(col("x.id").as("id_a"), col("y.id").as("id_b")))
    }
    assert(banded.subsetOf(exact), "no false positives after verify")
    assert(banded.nonEmpty)
  }

  test("multimodal decode preserves batch shape and schema; frames bounded") {
    val raw = MultimodalQueries.rawAssets(spark, "/root/testdata/sf0.001")
    val nParts = raw.rdd.getNumPartitions
    val dec = Multimodal.decode(raw)
    assert(dec.rdd.getNumPartitions == nParts) // narrow: no shuffle
    assert(dec.toDF().columns.toSeq ==
      Seq("asset_id", "kind", "width", "height", "n_frames", "sample_rate", "avg_byte"))
    val d = dec.toDF().cache()
    assert(d.count() == raw.count())
    assert(d.filter(col("kind") === "image" &&
      (col("width") < 16 || col("width") > 255)).count() == 0)
    val frames = Multimodal.sampleFrames(
      d.join(raw.toDF().select(col("asset_id"), col("content")), "asset_id"), 4)
    val bad = frames.join(d.select(col("asset_id"), col("n_frames")), "asset_id")
      .filter(col("frame_no") >= col("n_frames")).count()
    assert(bad == 0)
    assert(frames.groupBy("asset_id").count().agg(max("count")).head().getLong(0) <= 4)
    d.unpersist()
  }

  test("contamination: overlap fractions, short docs score 0, eval side excluded") {
    // train doc 1 shares both its shingles with eval doc 10; train doc 2
    // shares nothing; train doc 3 is too short for any 3-shingle.
    val docs = Seq(
      (1L, "a b c d", true, false),        // shingles: "a b c", "b c d"
      (2L, "x y z w", true, false),
      (3L, "hi there", true, false),
      (10L, "a b c d e", false, true)      // eval: contains both of doc 1's
    ).toDF("doc_id", "text", "is_train", "is_test")
    val got = Dedup.contamination(docs, "doc_id", "text",
        col("is_train"), col("is_test"), k = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1.0, true),
      (2L, 2L, 0L, 0.0, false),
      (3L, 0L, 0L, 0.0, false)))
  }

  test("chunking: stride windows, short tail, verbatim text, empty docs dropped") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val docs = Seq((1L, text), (2L, "one two"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 1: starts 0,3,6,9 → windows of 4,4,4,1 tokens
    assert(got.toSeq == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L),
      (1L, 3L, "t10", 1L),
      (2L, 0L, "one two", 2L)))
  }

  test("quantize: codes span 0..255, constant vectors reconstruct exactly") {
    val vecs = Seq(
      (1L, Seq(0.0f, 0.5f, 1.0f)),
      (2L, Seq(2.0f, 2.0f, 2.0f))   // constant → mx == mn
    ).toDF("vec_id", "embedding")
    val got = Similarity.scalarQuantize(vecs, "vec_id", "embedding")
      .orderBy("vec_id", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 0.0), (1L, 2L, 128L, 0.001961), (1L, 3L, 255L, 0.0),
      (2L, 1L, 0L, 0.0), (2L, 2L, 0L, 0.0), (2L, 3L, 0L, 0.0)))
  }
}
