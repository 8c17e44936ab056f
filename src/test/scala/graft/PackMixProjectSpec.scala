package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Invariants for the round-6 operators: sequence packing, mixture
  * rebalancing, and JL random projection. */
class PackMixProjectSpec extends SparkSpec {
  import spark.implicits._

  private val seqLen = 8

  private def packed = {
    val docs = Seq(
      (0L, "a b c"),            // 3 tokens, shard 0
      (1L, "d e f g h i j"),    // 7 tokens, shard 1
      (2L, "k l m n o p q r s t u v"), // 12 tokens, shard 0 — straddles
      (3L, null.asInstanceOf[String]), // dropped
      (4L, "   "),              // 0 tokens, dropped
      (6L, "w x y z a b c d e f")      // 10 tokens, shard 0
    ).toDF("doc_id", "text")
    TextAnalysis.packSequences(docs, "doc_id", "text", seqLen, 2)
  }

  test("packing conserves every document's tokens") {
    val perDoc = packed.groupBy("doc_id")
      .agg(sum("n_tokens_in_seq").as("got")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(0L -> 3L, 2L -> 12L, 6L -> 10L, 1L -> 7L))
  }

  test("every sequence except a shard's last is exactly full") {
    val seqTotals = packed.groupBy("shard", "seq")
      .agg(sum("n_tokens_in_seq").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lastSeq = seqTotals.keys.groupBy(_._1).map { case (s, ks) =>
      s -> ks.map(_._2).max }
    seqTotals.foreach { case ((shard, seq), n) =>
      if (seq < lastSeq(shard)) assert(n == seqLen, s"shard $shard seq $seq")
      else assert(n >= 1 && n <= seqLen)
    }
    // shard 0 carries 3+12+10 = 25 tokens → seqs 0..3; shard 1 only 7.
    assert(lastSeq == Map(0L -> 3L, 1L -> 0L))
  }

  test("span offsets sit inside the sequence and chain contiguously") {
    packed.collect().foreach { r =>
      val off = r.getAs[Long]("seq_offset")
      val n = r.getAs[Long]("n_tokens_in_seq")
      assert(off >= 0 && off < seqLen && n >= 1 && off + n <= seqLen)
    }
    // within a (shard, seq), spans tile [0, total) without gaps
    packed.orderBy("shard", "seq", "doc_id").collect()
      .groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq")))
      .foreach { case (_, rows) =>
        rows.sortBy(_.getAs[Long]("seq_offset"))
          .foldLeft(0L) { (expect, r) =>
            assert(r.getAs[Long]("seq_offset") == expect)
            expect + r.getAs[Long]("n_tokens_in_seq")
          }
      }
  }

  test("packing property: conservation + fullness on 20 random corpora") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 20) {
      val sl = 1 + rnd.nextInt(16)          // seqLen 1..16
      val shards = 1 + rnd.nextInt(4)
      val docs = (0L until 30L).map { i =>
        val n = rnd.nextInt(40)             // 0..39 tokens (empties too)
        (i, if (rnd.nextInt(10) == 0) null else Seq.fill(n)("t").mkString(" "))
      }.toDF("doc_id", "text")
      val out = TextAnalysis.packSequences(docs, "doc_id", "text", sl, shards)
        .collect()
      // conservation: each doc's spans sum to its token count
      val want = docs.collect().map { r =>
        val t = r.getString(1)
        r.getLong(0) -> (if (t == null) 0
          else t.split("\\s+").count(_.nonEmpty))
      }.filter(_._2 > 0).toMap
      val got = out.groupBy(_.getAs[Long]("doc_id"))
        .view.mapValues(_.map(_.getAs[Long]("n_tokens_in_seq")).sum).toMap
      assert(got == want.view.mapValues(_.toLong).toMap, s"trial $trial sl=$sl")
      // fullness: all but each shard's last sequence carry exactly sl
      out.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq")))
        .map { case (k, rows) => k -> rows.map(_.getAs[Long]("n_tokens_in_seq")).sum }
        .groupBy(_._1._1).foreach { case (shard, cells) =>
          val last = cells.keys.map(_._2).max
          cells.foreach { case ((_, seq), n) =>
            if (seq < last) assert(n == sl, s"trial $trial shard $shard seq $seq")
          }
        }
    }
  }

  test("mixture rebalancing hits targets; starved stratum keeps all") {
    // 400 'a' docs, 100 'b' docs, 10 'c' docs; targets 50/25/25 at
    // budget 0.4 of 510 docs → ideal rates a: .255, b: .51, c: 5.1→1.
    val docs = (0 until 400).map(i => (i.toLong, "a", s"doc a $i text")) ++
      (0 until 100).map(i => (400L + i, "b", s"doc b $i text")) ++
      (0 until 10).map(i => (500L + i, "c", s"doc c $i text"))
    val df = docs.toDF("doc_id", "lang", "text")
    val out = Dedup.mixtureSample(df, "lang", "doc_id", "text",
      Seq("a" -> 0.50, "b" -> 0.25, "c" -> 0.25), 0.4).cache()
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // c's rate clamps at 1 → all 10 kept, weight exactly 1
    assert(byLang("c") == 10)
    assert(out.filter(col("lang") === "c").select("weight")
      .collect().forall(_.getDouble(0) == 1.0))
    // a and b land near their ideal expected counts (hash is uniform
    // enough on this corpus for a ±40% band)
    assert(math.abs(byLang("a") - 102L) < 41, s"a=${byLang("a")}")
    assert(math.abs(byLang("b") - 51L) < 21, s"b=${byLang("b")}")
    // deterministic: rerun is identical
    val again = Dedup.mixtureSample(df, "lang", "doc_id", "text",
      Seq("a" -> 0.50, "b" -> 0.25, "c" -> 0.25), 0.4)
    assert(out.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("salted join equals the plain join on a skewed key") {
    import graft.analytics.Skew
    // 90% of big-side rows share one hot key
    val big = (0L until 2000L).map(i =>
      (if (i % 10 == 0) i % 7 else 42L, i, i * 0.5)).toDF("k", "id", "v")
    val small = Seq((42L, "hot"), (0L, "a"), (3L, "b"), (6L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, "k")
      .orderBy("id").collect().toSeq
    val salted = Skew.saltedJoin(big, small, "k", salts = 8, saltBy = Seq("id"))
      .select(plain.head.schema.fieldNames.toIndexedSeq.map(col): _*)
      .orderBy("id").collect().toSeq
    assert(salted == plain, s"salted join diverged (${salted.size} vs ${plain.size})")
    // and the salt actually spreads the hot key across partitions
    val spread = big.withColumn("__salt",
        pmod(hash(col("id")), lit(8)))
      .filter(col("k") === 42L).select("__salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread of 8 salt partitions")
  }

  test("incremental near-dup equals the cross-split slice of the full funnel") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),   // near-dup of 1
      (3L, "one two three four five six"),
      (4L, "one two three four five seven"),        // near-dup of 3
      (5L, "totally different content here now yes")
    ).toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") <= 3)
    val batch = docs.filter(col("doc_id") > 3)
    val inc = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.nearDupPairs(docs, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossSlice = full.collect {
      case (a, b) if a <= 3 && b > 3 => (b, a)
      case (a, b) if b <= 3 && a > 3 => (a, b)
    }
    assert(inc == crossSlice && inc.contains((4L, 3L)), s"inc=$inc full=$full")
  }

  test("random projection: shape, determinism, linearity") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 2.0f, -1.0f)),
      (1L, Array(2.0f, 0.0f, 4.0f, -2.0f)), // 2 × vec 0
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.randomProject(vecs, "vec_id", "embedding", 3, 4, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.size == 9)
    // zero vector projects to 0 in every dimension
    (1 to 3).foreach(j => assert(out((2L, j.toLong)) == 0.0))
    // projection is linear: proj(2v) = 2·proj(v) (6-dp rounding slack)
    (1 to 3).foreach { j =>
      assert(math.abs(out((1L, j.toLong)) - 2 * out((0L, j.toLong))) < 2e-6)
    }
    val again = Similarity.randomProject(vecs, "vec_id", "embedding", 3, 4, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out == again)
  }
}
