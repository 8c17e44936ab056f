package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/**
 * Pins the native RepetitionCounts expression (single imperative pass)
 * against an independent declarative formulation (explode → group →
 * max) and hand-computed edge cases, so any change to tokenization or
 * gram construction breaks loudly.
 */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def counts(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"), TextAnalysis.repetitionCounts(col("text")).as("r"))
      .select(col("id"), col("r.n_tokens"), col("r.n_distinct"),
        col("r.top_bigram"), col("r.n_bigrams"),
        col("r.top_trigram"), col("r.n_trigrams"))
      .orderBy("id").collect()

  test("repetition counts: hand-computed edge cases") {
    val rows = counts(Seq(
      "",                       // no tokens
      "word",                   // 1 token: no grams
      "a a",                    // 1 bigram, repeated token
      "a b a b a",              // bigrams: (a b)x2 (b a)x2; trigrams: (a b a)x2 (b a b)x1
      "  Mixed   CASE  mixed ", // case-folded distinct, ragged whitespace
      "x y z"))                 // all distinct, each gram unique
    assert(rows(0).toSeq.tail == Seq(0, 0, 0, 0, 0, 0))
    assert(rows(1).toSeq.tail == Seq(1, 1, 0, 0, 0, 0))
    assert(rows(2).toSeq.tail == Seq(2, 1, 1, 1, 0, 0))
    assert(rows(3).toSeq.tail == Seq(5, 2, 2, 4, 2, 3))
    assert(rows(4).toSeq.tail == Seq(3, 2, 1, 2, 1, 1))
    assert(rows(5).toSeq.tail == Seq(3, 3, 1, 2, 1, 1))
  }

  test("repetition counts: NULL text yields NULL struct") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.repetitionCounts(col("text")).as("r")).head()
    assert(r.isNullAt(0))
  }

  test("native counts match the declarative explode formulation on real docs") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val native = docs.select(col("doc_id"),
      TextAnalysis.repetitionCounts(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_tokens").as("n"),
        col("r.n_distinct").as("nd"), col("r.top_bigram").as("tb"),
        col("r.top_trigram").as("tt"))
    val toks = TextAnalysis.tokens(col("text"))
    val grams = (n: Int) =>
      docs.select(col("doc_id"), explode(
        filter(
          transform(toks, (_, i) => // gram starting at i, null when past end
            when(i <= size(toks) - n,
              concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))),
          g => g.isNotNull)).as("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id").agg(max("count").as(s"top$n"))
    val declarative = docs.select(col("doc_id"), size(toks).as("dn"),
      size(array_distinct(toks)).as("dnd"))
      .join(grams(2), Seq("doc_id"), "left")
      .join(grams(3), Seq("doc_id"), "left")
    val joined = native.join(declarative, "doc_id").collect()
    assert(joined.length == 500)
    joined.foreach { r =>
      assert(r.getAs[Int]("n") == r.getAs[Int]("dn"), s"n_tokens @ ${r.get(0)}")
      assert(r.getAs[Int]("nd") == r.getAs[Int]("dnd"), s"n_distinct @ ${r.get(0)}")
      assert(r.getAs[Int]("tb").toLong ==
        Option(r.getAs[java.lang.Long]("top2")).map(_.toLong).getOrElse(0L),
        s"top_bigram @ ${r.get(0)}")
      assert(r.getAs[Int]("tt").toLong ==
        Option(r.getAs[java.lang.Long]("top3")).map(_.toLong).getOrElse(0L),
        s"top_trigram @ ${r.get(0)}")
    }
  }
}
