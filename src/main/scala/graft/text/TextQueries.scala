package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Driver-contract queries for the text-analysis operators, with their
 * DuckDB oracles. All run over the `documents` table — one narrow
 * codegen'd pass each, no shuffle except the final presentation sort.
 */
object TextQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token counting + quality metrics in a single pass.
    "q_text_stats" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val t = col("text")
      docs.select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        size(TextAnalysis.bpeTokens(t)).as("n_bpe_tokens"),
        TextAnalysis.punctRatio(t).as("punct_ratio"),
        TextAnalysis.stopwordRatio(t).as("stopword_ratio"),
        TextAnalysis.meanTokenLen(t).as("mean_token_len"),
        TextAnalysis.qualityScore(t).as("quality"))
        .orderBy("doc_id")
    }),

    // CJK-aware token accounting: whitespace tokens with the
    // character-bigram fallback for Han/Kana/Hangul runs
    // (TextAnalysis.tokensCjk — the tokenizer the dedup/vocab/drift
    // family needs before a scriptio-continua corpus is measurable).
    // On this Latin-script testdata the CJK and whitespace counts
    // coincide — which is itself the contract (the fallback must not
    // perturb non-CJK text); the bigram semantics are pinned
    // hand-computed in CjkTokensSpec.
    "q_text_tokens_cjk" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val toks = TextAnalysis.tokensCjk(col("text"))
      docs.select(
        col("doc_id"),
        size(toks).as("n_tokens_cjk"),
        size(array_distinct(toks)).as("n_types_cjk"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens_ws"))
        .orderBy("doc_id")
    }),

    // Language ID vs the table's lang label.
    "q_text_langid" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // Language-ID confusion matrix vs the table's labels — the eval
    // every classifier-backed filter ships with; one groupBy on a
    // |langs|²-bounded key. The aggregation forces lang_pred for every
    // row, so the token array + CJK count are materialized ONCE per
    // row behind a plan barrier and the marker scores run over the
    // attribute (the curate pattern — without it every score
    // re-splits the text; langId's when-chain itself is deliberately
    // kept, see langIdOf).
    "q_text_langid_confusion" -> ((s, dir) => {
      val base = org.apache.spark.sql.graftshim.GraftShims.planBarrier(
        Tables(s, dir, "documents").select(col("lang"),
          TextAnalysis.tokens(col("text")).as("__toks"),
          TextAnalysis.cjkCount(col("text")).as("__cjk")))
      base.select(col("lang"),
        TextAnalysis.langIdOf(col("__toks"), col("__cjk")).as("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "lang_pred")
    }),

    // PII redaction over text with synthesized contact info (the
    // corpus itself is clean, so the query plants one of each type).
    "q_text_redact" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or "),
        lit("https://site"), col("doc_id"), lit(".test or "),
        lit("+1 (555) 010-00"), (col("doc_id") % 90 + 10), lit(" end"))
      val redacted = TextAnalysis.redactPii(planted)
      docs.select(
        col("doc_id"),
        TextAnalysis.piiCount(planted, TextAnalysis.UrlRe).as("n_url"),
        TextAnalysis.piiCount(planted, TextAnalysis.EmailRe).as("n_email"),
        substring(redacted, -60, 60).as("tail"))
        .orderBy("doc_id")
    }),

    // Within-document repetition stats (Gopher-style signals, token
    // based): one narrow pass via the native RepetitionCounts struct —
    // the declarative alternative (explode → groupBy(doc, gram) → max)
    // shuffles the exploded corpus twice. The repeated struct-field
    // references collapse to ONE evaluation via codegen subexpression
    // elimination.
    "q_text_repetition" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.select(col("doc_id"),
        TextAnalysis.repetitionCounts(col("text")).as("r"))
        .select(
          col("doc_id"),
          col("r.n_tokens").as("n_tokens"),
          TextAnalysis.dupTokenFrac(col("r")).as("dup_token_frac"),
          TextAnalysis.topGramFrac(col("r.top_bigram"), col("r.n_bigrams"))
            .as("top_bigram_frac"),
          TextAnalysis.topGramFrac(col("r.top_trigram"), col("r.n_trigrams"))
            .as("top_trigram_frac"))
        .orderBy("doc_id")
    }),

    // Gopher-style rule-based quality filter: per-rule flags, composite
    // keep, and the FIRST failing rule as fail_reason (rule order =
    // TextAnalysis.QualityRuleNames). Narrow single pass — at 100 TB
    // this is a scan-speed filter ahead of every downstream stage.
    "q_text_quality_filter" -> ((s, dir) => {
      import TextAnalysis._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("lang"), col("text"),
        repetitionCounts(col("text")).as("r"))
      val flags = Seq(
        col("r.n_tokens").between(MinTokens, MaxTokens),
        meanTokenLen(col("text")).between(MinMeanTokenLen, MaxMeanTokenLen),
        col("lang") =!= "en" || stopwordRatio(col("text")) >= MinStopwordRatio,
        punctRatio(col("text")) <= MaxPunctRatio,
        dupTokenFrac(col("r")) <= MaxDupTokenFrac)
      val reason = flags.zip(QualityRuleNames)
        .foldRight(lit(null).cast("string")) { case ((ok, name), acc) =>
          when(!ok, lit(name)).otherwise(acc)
        }
      base.select(
        col("doc_id"), col("lang"),
        flags(0).as("len_ok"), flags(1).as("word_len_ok"),
        flags(2).as("stopword_ok"), flags(3).as("punct_ok"),
        flags(4).as("repetition_ok"),
        flags.reduce(_ && _).as("keep"), reason.as("fail_reason"))
        .orderBy("doc_id")
    }),

    // Rolling-hash document fingerprint + first-token hash.
    "q_text_fingerprint" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val toks = TextAnalysis.tokens(col("text"))
      docs.select(
        col("doc_id"),
        TextAnalysis.charFingerprint(col("text")).as("fp"),
        TextAnalysis.charPolyHash(try_element_at(toks, lit(1))).as("first_tok_hash"))
        .orderBy("doc_id")
    }),

    // Sliding-window chunking (64-token windows every 48 tokens).
    "q_text_chunk" -> ((s, dir) =>
      TextAnalysis.chunk(Tables(s, dir, "documents"),
        "doc_id", "text", ChunkSize, ChunkStride)
        .orderBy("doc_id", "chunk_id")),

    // Concat-and-chunk sequence packing: per-shard token streams cut
    // into fixed 64-token training sequences, one row per (doc, seq)
    // span — every sequence except a shard's last is exactly full.
    "q_text_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(Tables(s, dir, "documents"),
        "doc_id", "text", PackSeqLen, PackShards)
        .orderBy("shard", "seq", "doc_id")),

    // Per-language token-length distribution: exact interpolated
    // quantiles (percentile ≡ DuckDB quantile_cont) + mean. The
    // corpus-profiling pass that picks every downstream length
    // threshold. Scale: one partial-aggregating groupBy on a
    // 5-valued key; at extreme group cardinality the dial is
    // percentile_approx — this entry pins the exact spec.
    "q_text_length_quantiles" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val qs = LengthQuantiles.map(p =>
        round(percentile(col("n_tokens"), lit(p)), 6)
          .as("p" + math.round(p * 100)))
      docs.filter(col("text").isNotNull)
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          (round(sum(col("n_tokens").cast("long")).cast("double") /
            count(lit(1)), 6).as("mean_tokens") +: qs): _*)
        .orderBy("lang")
    }),

    // Boilerplate detection (the C4 / RefinedWeb cleanup step): token
    // n-grams recurring across >= BoilerplateMinDocs DISTINCT
    // documents of the SAME source — headers, footers, navigation
    // chrome, license blurbs. Shape: TokenShingles' per-document set
    // semantics make count(*) per (source, gram) a distinct-document
    // count with NO count_distinct expand, so the whole audit is one
    // partial-aggregating shuffle of (source, gram) pairs — bytes,
    // never documents. Emitting the grams themselves (not a
    // per-source rollup) is deliberate: the output IS the removal
    // list the cleanup pass subtracts.
    "q_text_boilerplate" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          explode(graft.dedup.Dedup.shingles(col("text"), BoilerplateGramLen))
            .as("gram"))
        .groupBy("source", "gram").agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= BoilerplateMinDocs)
        .orderBy("source", "gram")))

  val ChunkSize = 64
  val ChunkStride = 48
  val PackSeqLen = 64
  val PackShards = 4
  val LengthQuantiles = Seq(0.25, 0.5, 0.75, 0.95)

  /** Boilerplate audit knobs (q_text_boilerplate; shared with its
    * oracle): gram length and the distinct-document floor above which
    * a gram counts as source-level boilerplate. */
  val BoilerplateGramLen = 3
  val BoilerplateMinDocs = 3

  def oracleSql: Map[String, String] = {
    val t = "text"
    Map(
      "q_text_stats" -> s"""
        SELECT doc_id,
          ${TextSql.tokenCount(t)} AS n_tokens,
          len(${TextSql.bpeTokens(t)}) AS n_bpe_tokens,
          ${TextSql.punctRatio(t)} AS punct_ratio,
          ${TextSql.stopwordRatio(t)} AS stopword_ratio,
          ${TextSql.meanTokenLen(t)} AS mean_token_len,
          ${TextSql.qualityScore(t)} AS quality
        FROM documents ORDER BY doc_id""",

      "q_text_tokens_cjk" -> s"""
        SELECT doc_id,
          len(${TextSql.tokensCjk(t)}) AS n_tokens_cjk,
          len(list_distinct(${TextSql.tokensCjk(t)})) AS n_types_cjk,
          ${TextSql.tokenCount(t)} AS n_tokens_ws
        FROM documents ORDER BY doc_id""",

      "q_text_redact" -> s"""
        WITH p AS (
          SELECT doc_id,
            text || ' contact user' || doc_id || '@example.com or ' ||
            'https://site' || doc_id || '.test or ' ||
            '+1 (555) 010-00' || (doc_id % 90 + 10) || ' end' AS planted
          FROM documents),
        r AS (
          SELECT doc_id, planted,
            regexp_replace(regexp_replace(regexp_replace(planted,
              '${TextAnalysis.UrlRe}', '<URL>', 'g'),
              '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
              '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted
          FROM p)
        SELECT doc_id,
          len(regexp_extract_all(planted, '${TextAnalysis.UrlRe}')) AS n_url,
          len(regexp_extract_all(planted, '${TextAnalysis.EmailRe}')) AS n_email,
          right(redacted, 60) AS tail
        FROM r ORDER BY doc_id""",

      "q_text_langid" -> s"""
        SELECT doc_id, lang, ${TextSql.langId(t)} AS lang_pred
        FROM documents ORDER BY doc_id""",

      "q_text_langid_confusion" -> s"""
        WITH p AS (
          SELECT lang, ${TextSql.langId(t)} AS lang_pred FROM documents)
        SELECT lang, lang_pred, count(*) AS n_docs
        FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred""",

      "q_text_repetition" -> s"""
        WITH t AS (SELECT doc_id, ${TextSql.tokens(t)} AS toks FROM documents),
        bg AS (
          SELECT doc_id, max(c) AS top FROM (
            SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id, unnest(${TextSql.nGrams("toks", 2)}) AS g FROM t)
            GROUP BY doc_id, g) GROUP BY doc_id),
        tg AS (
          SELECT doc_id, max(c) AS top FROM (
            SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id, unnest(${TextSql.nGrams("toks", 3)}) AS g FROM t)
            GROUP BY doc_id, g) GROUP BY doc_id)
        SELECT t.doc_id, len(t.toks) AS n_tokens,
          ${TextSql.dupTokenFrac("t.toks")} AS dup_token_frac,
          round(CAST(coalesce(bg.top, 0) AS DOUBLE)
            / greatest(len(t.toks) - 1, 1), 6) AS top_bigram_frac,
          round(CAST(coalesce(tg.top, 0) AS DOUBLE)
            / greatest(len(t.toks) - 2, 1), 6) AS top_trigram_frac
        FROM t LEFT JOIN bg ON t.doc_id = bg.doc_id
               LEFT JOIN tg ON t.doc_id = tg.doc_id
        ORDER BY t.doc_id""",

      "q_text_quality_filter" -> {
        import TextAnalysis._
        val reasons = QualityRuleNames
        s"""
        WITH t AS (
          SELECT doc_id, lang, text, ${TextSql.tokens(t)} AS toks FROM documents),
        f AS (
          SELECT doc_id, lang,
            len(toks) BETWEEN $MinTokens AND $MaxTokens AS len_ok,
            ${TextSql.meanTokenLen(t)} BETWEEN $MinMeanTokenLen AND $MaxMeanTokenLen
              AS word_len_ok,
            (lang <> 'en' OR ${TextSql.stopwordRatio(t)} >= $MinStopwordRatio)
              AS stopword_ok,
            ${TextSql.punctRatio(t)} <= $MaxPunctRatio AS punct_ok,
            ${TextSql.dupTokenFrac("toks")} <= $MaxDupTokenFrac AS repetition_ok
          FROM t)
        SELECT doc_id, lang, len_ok, word_len_ok, stopword_ok, punct_ok,
          repetition_ok,
          (len_ok AND word_len_ok AND stopword_ok AND punct_ok AND repetition_ok)
            AS keep,
          CASE WHEN NOT len_ok THEN '${reasons(0)}'
               WHEN NOT word_len_ok THEN '${reasons(1)}'
               WHEN NOT stopword_ok THEN '${reasons(2)}'
               WHEN NOT punct_ok THEN '${reasons(3)}'
               WHEN NOT repetition_ok THEN '${reasons(4)}' END AS fail_reason
        FROM f ORDER BY doc_id"""
      },

      "q_text_fingerprint" -> s"""
        SELECT doc_id,
          ${TextSql.charPolyHash(t)} AS fp,
          ${TextSql.charPolyHash(s"(${TextSql.tokens(t)})[1]")} AS first_tok_hash
        FROM documents ORDER BY doc_id""",

      "q_text_pack" -> s"""
        WITH t AS (
          SELECT doc_id, doc_id % $PackShards AS shard,
            len(${TextSql.tokens(t)}) AS n_tokens
          FROM documents WHERE text IS NOT NULL),
        p AS (
          SELECT doc_id, shard, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
          FROM t WHERE n_tokens > 0),
        e AS (SELECT *, tok_start + n_tokens AS tok_end FROM p),
        x AS (
          SELECT shard, doc_id, tok_start, tok_end,
            unnest(range(tok_start // $PackSeqLen,
                         (tok_end - 1) // $PackSeqLen + 1)) AS seq
          FROM e)
        SELECT shard, seq, doc_id,
          greatest(tok_start, seq * $PackSeqLen) - seq * $PackSeqLen AS seq_offset,
          least(tok_end, (seq + 1) * $PackSeqLen)
            - greatest(tok_start, seq * $PackSeqLen) AS n_tokens_in_seq
        FROM x ORDER BY shard, seq, doc_id""",

      "q_text_length_quantiles" -> {
        val qcols = LengthQuantiles.map(p =>
          s"round(quantile_cont(n_tokens, $p), 6) AS p${math.round(p * 100)}")
          .mkString(", ")
        s"""
        WITH t AS (
          SELECT lang, len(${TextSql.tokens(t)}) AS n_tokens
          FROM documents WHERE text IS NOT NULL)
        SELECT lang, count(*) AS n_docs,
          round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6) AS mean_tokens,
          $qcols
        FROM t GROUP BY lang ORDER BY lang"""
      },

      "q_text_chunk" -> s"""
        WITH d AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'), __t -> __t <> '') AS toks
          FROM documents WHERE text IS NOT NULL),
        c AS (
          SELECT doc_id, toks,
            unnest(range(0, ((len(toks) - 1) // $ChunkStride) + 1)) AS chunk_id
          FROM d WHERE len(toks) > 0),
        s AS (
          SELECT doc_id, chunk_id,
            list_slice(toks, CAST(chunk_id * $ChunkStride AS INT) + 1,
                       CAST(chunk_id * $ChunkStride AS INT) + $ChunkSize) AS ctoks
          FROM c)
        SELECT doc_id, chunk_id,
          array_to_string(ctoks, ' ') AS chunk_text,
          len(ctoks) AS n_tokens
        FROM s ORDER BY doc_id, chunk_id""",

      "q_text_boilerplate" -> {
        val g = BoilerplateGramLen
        s"""
        WITH toks AS (
          SELECT doc_id, source, ${TextSql.tokens(t)} AS tk FROM documents),
        grams AS (
          SELECT DISTINCT doc_id, source,
            unnest(list_transform(range(1, len(tk) - ${g - 2}),
              i -> array_to_string(tk[CAST(i AS INT):CAST(i AS INT) + ${g - 1}], ' '))) AS gram
          FROM toks WHERE len(tk) >= $g)
        SELECT source, gram, count(*) AS n_docs
        FROM grams GROUP BY 1, 2 HAVING count(*) >= $BoilerplateMinDocs
        ORDER BY source, gram"""
      })
  }
}
