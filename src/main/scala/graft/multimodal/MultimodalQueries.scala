package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Driver-contract queries for the multimodal plumbing. Assets are
 * synthesized deterministically from `documents` (payload =
 * unhex(md5(text)), kind = doc_id mod 3), so the DuckDB oracle can
 * mirror the stub decoder's byte arithmetic on md5 hex pairs while the
 * Spark side exercises the REAL binary path (unhex → Array[Byte] →
 * typed Dataset → mapPartitions batch decode).
 */
object MultimodalQueries {

  val Kinds = Seq("image", "audio", "video")
  val ResizeTarget = 32
  val MaxFrames = 4

  /** Synthesize the raw-asset Dataset from the documents table. */
  def rawAssets(s: SparkSession, dir: String): Dataset[Multimodal.RawAsset] = {
    import s.implicits._
    Tables(s, dir, "documents").select(
      col("doc_id").as("asset_id"),
      element_at(array(Kinds.map(lit): _*), (col("doc_id") % 3).cast("int") + 1)
        .as("kind"),
      unhex(md5(col("text"))).as("content"))
      .as[Multimodal.RawAsset]
  }

  private def decoded(s: SparkSession, dir: String): DataFrame =
    Multimodal.decode(rawAssets(s, dir)).toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Batch decode stub through typed mapPartitions.
    "q_mm_decode" -> ((s, dir) =>
      decoded(s, dir).select(
        col("asset_id"), col("kind"), col("width"), col("height"),
        col("n_frames"), col("sample_rate"), round(col("avg_byte"), 6).as("avg_byte"))
        .orderBy("asset_id")),

    // Metadata-only resize (bytes untouched).
    "q_mm_resize" -> ((s, dir) =>
      Multimodal.resizeMeta(decoded(s, dir), ResizeTarget)
        .select(col("asset_id"), col("kind"), col("width"), col("height"),
          col("out_width"), col("out_height"), col("scaled"))
        .orderBy("asset_id")),

    // Feature extraction stub: first 8 payload bytes → [0,1] doubles.
    "q_mm_features" -> ((s, dir) => {
      val f = Multimodal.extractFeatures(rawAssets(s, dir), 8).toDF()
      f.select(
        col("asset_id") +:
          (0 until 8).map(i =>
            round(element_at(col("features"), i + 1), 6).as(s"f$i")): _*)
        .orderBy("asset_id")
    }),

    // Per-kind asset profile — the modality histogram a multimodal
    // intake job reports (counts + mean dimensions via exact integer
    // sums; one 3-valued groupBy).
    "q_mm_kind_stats" -> ((s, dir) =>
      decoded(s, dir)
        .groupBy("kind")
        .agg(count(lit(1)).as("n_assets"),
          round(sum(col("width").cast("long")).cast("double") /
            count(lit(1)), 6).as("mean_width"),
          round(sum(col("height").cast("long")).cast("double") /
            count(lit(1)), 6).as("mean_height"),
          round(sum(col("n_frames").cast("long")).cast("double") /
            count(lit(1)), 6).as("mean_frames"))
        .orderBy("kind")),

    // Even frame sampling for video assets (generator, pre-shuffle).
    // decodeWithContent carries the payload through the decoder's own
    // output instead of the old decode-then-rejoin-by-asset_id shape,
    // which re-shuffled every payload (and re-scanned the corpus) just
    // to re-attach bytes the decoder had already read.
    "q_mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.decodeWithContent(rawAssets(s, dir)).toDF(), MaxFrames)
        .orderBy("asset_id", "frame_no")))

  // ------------------------------------------------------------------
  // DuckDB mirrors — byte i of unhex(md5(text)) via hex-pair arithmetic
  // ------------------------------------------------------------------

  /** Value of the i-th (0-based) byte of the md5 digest of `text`. */
  private def byteAt(i: Int): String = {
    def nib(pos: Int) = s"(strpos('0123456789ABCDEF', (upper(md5(text)))[$pos]) - 1)"
    s"(${nib(2 * i + 1)} * 16 + ${nib(2 * i + 2)})"
  }

  private val kindSql =
    s"(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END)"

  private val avgByteSql = {
    val sum = (0 until 16).map(byteAt).mkString(" + ")
    s"round(CAST($sum AS DOUBLE) / 16, 6)"
  }

  private val decodedCte = s"""
    dec AS (
      SELECT doc_id AS asset_id, $kindSql AS kind,
        CASE $kindSql WHEN 'audio' THEN 0 ELSE 16 + ${byteAt(0)} % 240 END AS width,
        CASE $kindSql WHEN 'audio' THEN 0 ELSE 16 + ${byteAt(1)} % 240 END AS height,
        CASE $kindSql WHEN 'image' THEN 1 WHEN 'audio' THEN 0
             ELSE 1 + ${byteAt(3)} % 120 END AS n_frames,
        CASE $kindSql WHEN 'audio' THEN 8000 + 100 * (${byteAt(2)} % 80) ELSE 0 END AS sample_rate,
        $avgByteSql AS avg_byte,
        upper(md5(text)) AS hexcontent
      FROM documents)"""

  def oracleSql: Map[String, String] = Map(

    "q_mm_decode" -> s"""
      WITH $decodedCte
      SELECT asset_id, kind, width, height, n_frames, sample_rate, avg_byte
      FROM dec ORDER BY asset_id""",

    "q_mm_resize" -> s"""
      WITH $decodedCte
      SELECT asset_id, kind, width, height,
        CASE WHEN kind = 'audio' THEN width
             ELSE greatest(1, (width * $ResizeTarget) // greatest(width, height)) END AS out_width,
        CASE WHEN kind = 'audio' THEN height
             ELSE greatest(1, (height * $ResizeTarget) // greatest(width, height)) END AS out_height,
        CAST(greatest(width, height) > $ResizeTarget AND kind <> 'audio' AS INT) AS scaled
      FROM dec ORDER BY asset_id""",

    "q_mm_features" -> {
      val cols = (0 until 8)
        .map(i => s"round(CAST(${byteAt(i)} AS DOUBLE) / 255, 6) AS f$i")
        .mkString(", ")
      s"SELECT doc_id AS asset_id, $cols FROM documents ORDER BY asset_id"
    },

    "q_mm_kind_stats" -> s"""
      WITH $decodedCte
      SELECT kind, count(*) AS n_assets,
        round(CAST(sum(width) AS DOUBLE) / count(*), 6) AS mean_width,
        round(CAST(sum(height) AS DOUBLE) / count(*), 6) AS mean_height,
        round(CAST(sum(n_frames) AS DOUBLE) / count(*), 6) AS mean_frames
      FROM dec GROUP BY kind ORDER BY kind""",

    "q_mm_frames" -> s"""
      WITH $decodedCte,
      f AS (
        SELECT asset_id, hexcontent,
          unnest(list_distinct(list_transform(range(0, $MaxFrames),
            j -> CAST((j * n_frames) // $MaxFrames AS INT)))) AS frame_no
        FROM dec WHERE kind = 'video')
      SELECT asset_id, frame_no,
        md5(hexcontent || ':' || CAST(frame_no AS VARCHAR)) AS frame_key
      FROM f ORDER BY asset_id, frame_no""")
}
