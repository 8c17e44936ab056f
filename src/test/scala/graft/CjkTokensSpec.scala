package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.text.TextAnalysis

/** The CJK character-bigram token fallback, pinned against
  * hand-computed expectations: a spaceless Han/Kana/Hangul run is one
  * whitespace token (invisible to Jaccard/vocab/span metrics); the
  * bigram fallback makes it measurable, and must leave Latin-script
  * text untouched. */
class CjkTokensSpec extends SparkSpec {

  private def toks(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(TextAnalysis.tokensCjk(col("t")).as("toks"))
      .head().getSeq[String](0).toSeq
  }

  test("bigram fallback per script, hand-computed") {
    // mixed token splits at the script boundary, CJK run → bigrams
    assert(toks("Spark引擎很快 fast") ==
      Seq("spark", "引擎", "擎很", "很快", "fast"))
    // a lone CJK char emits itself
    assert(toks("好 ok") == Seq("好", "ok"))
    // whitespace still separates runs — bigrams never cross it
    assert(toks("你好 世界") == Seq("你好", "世界"))
    // Hangul syllables: n chars → n−1 bigrams
    assert(toks("한국어테스트") == Seq("한국", "국어", "어테", "테스", "스트"))
    // Kana
    assert(toks("テストです") == Seq("テス", "スト", "トで", "です"))
    // empty and whitespace-only
    assert(toks("") == Seq.empty && toks("  \t ") == Seq.empty)
  }

  test("Latin-script text tokenizes identically to the whitespace tokenizer") {
    import spark.implicits._
    val texts = Seq("The quick brown fox", "a,b;c  d!", "  padded   runs ",
      "MIXED case Works", "punct-only !!! ???")
    val df = texts.toDF("t").select(
      TextAnalysis.tokens(col("t")).as("ws"),
      TextAnalysis.tokensCjk(col("t")).as("cjk"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"diverged on: $r")
    }
  }

  test("vocab counts and span coverage on a CJK fixture, hand-computed") {
    import spark.implicits._
    // two docs sharing the 機器學習 prefix: bigrams 機器/器學/學習
    val docs = Seq(
      (1L, "機器學習模型訓練"), // 8 chars → 7 bigrams
      (2L, "機器學習很有趣")    // 7 chars → 6 bigrams
    ).toDF("doc_id", "text")

    // vocab: the whitespace tokenizer sees TWO opaque tokens (one per
    // doc — the blindness the fallback removes); the bigram vocab is
    // the union of both docs' bigram sets
    val wsVocab = docs.select(explode(TextAnalysis.tokens(col("text"))))
      .distinct().count()
    assert(wsVocab == 2L)
    val vocab = docs.select(explode(TextAnalysis.tokensCjk(col("text")))
      .as("tok")).distinct().collect().map(_.getString(0)).toSet
    assert(vocab == Set("機器", "器學", "學習", "習模", "模型", "型訓", "訓練",
      "習很", "很有", "有趣"))

    // span coverage at bigram granularity (the q_dedup_span_coverage
    // window shape over tokensCjk): doc 1 has 3 of its 7 positions
    // covered by grams doc 2 also contains, doc 2 has 3 of 6
    val grams = docs.select(col("doc_id"),
      explode(TextAnalysis.tokensCjk(col("text"))).as("gram"))
    val per = grams.groupBy("gram", "doc_id").agg(count(lit(1)).as("cnt"))
    val marked = per.withColumn("n_docs",
      count(lit(1)).over(Window.partitionBy("gram")))
    val cov = marked.groupBy("doc_id").agg(
        sum("cnt").as("n_grams"),
        sum(when(col("n_docs") >= 2, col("cnt")).otherwise(0L)).as("dup"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cov == Map(1L -> ((7L, 3L)), 2L -> ((6L, 3L))))
  }
}
