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

    // Language ID vs the table's lang label.
    "q_text_langid" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

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

    // Rolling-hash document fingerprint + first-token hash.
    "q_text_fingerprint" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val toks = TextAnalysis.tokens(col("text"))
      docs.select(
        col("doc_id"),
        TextAnalysis.charFingerprint(col("text")).as("fp"),
        TextAnalysis.charPolyHash(try_element_at(toks, lit(1))).as("first_tok_hash"))
        .orderBy("doc_id")
    }))

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

      "q_text_fingerprint" -> s"""
        SELECT doc_id,
          ${TextSql.charPolyHash(t)} AS fp,
          ${TextSql.charPolyHash(s"(${TextSql.tokens(t)})[1]")} AS first_tok_hash
        FROM documents ORDER BY doc_id""")
  }
}
