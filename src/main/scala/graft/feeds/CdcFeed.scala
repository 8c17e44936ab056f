package graft.feeds

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.Cdc

/**
 * Deterministic CDC event feed synthesized from the driver's `events`
 * parquet table (FIXTURES.md §7): every record gets IIDR-style headers
 * (TableName / A_ENTTYP / A_TIMSTAMP), a JSON key, and a JSON value,
 * with a deterministic sprinkling of nulls / unknown codes / case-and-
 * whitespace noise so the validation, mapping, and dead-letter paths
 * all get exercised.
 *
 * The derivation rules are mirrored 1:1 by `CdcFeed.feedSql` (DuckDB
 * ANSI SQL) so every operator query has an exact oracle. Keep the two
 * in sync — they are the same spec written twice.
 *
 * Rules (offs = event_id):
 *  - topic        = 'iidr.CDC.SRC' || offs % 3
 *  - table_name   = NULL when offs % 97 = 13 else 'TEST_' || upper(event_type)
 *  - entry_type   = NULL when offs % 89 = 7 else code[offs % 10] with
 *                   case/whitespace noise; index 9 = 'ZZ' (unknown code)
 *  - k            = (offs * 7) % 3000   (orders keys are 0..1499·sf — half
 *                   of the keyspace is "new inserts")
 *  - ats          = second-truncated ts + '.' + 12 fractional digits
 *  - key_json     = NULL when offs % 13 = 0 else {"ID": k}
 *  - value_json   = NULL for deletes (codes 7,8) and when offs % 17 = 0
 *                   else {"ID": k, "AMOUNT": value as decimal(12,2)}
 */
object CdcFeed {

  /** Entry-type codes with deliberate case/space noise (P1 trims + uppercases). */
  val entCodes: Seq[String] =
    Seq("PT", "rr ", " Px", "UP", "fi", "FP", "ur", "DL", "dr ", "ZZ")

  /** Flat feed: one row per CDC record with pre-extracted columns. */
  def base(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    val offs = col("event_id")
    val k = (offs * 7) % 3000
    val amountStr = col("value").cast("decimal(12,2)").cast("string")
    ev.select(
      offs.as("offs"),
      (offs % 8).cast("int").as("kpart"),
      concat(lit("iidr.CDC.SRC"), (offs % 3).cast("string")).as("topic"),
      when(offs % 97 === 13, lit(null))
        .otherwise(concat(lit("TEST_"), upper(col("event_type")))).as("table_name"),
      when(offs % 89 === 7, lit(null))
        .otherwise(element_at(
          array(entCodes.map(lit): _*), (offs % 10).cast("int") + 1)).as("entry_type"),
      k.as("k"),
      col("user_id"),
      col("value"),
      concat(
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), lit("."),
        lpad((offs % 1000000).cast("string"), 6, "0"), lit("123456")).as("ats"),
      when(offs % 13 === 0, lit(null))
        .otherwise(concat(lit("{\"ID\":"), k.cast("string"), lit("}"))).as("key_json"),
      when((offs % 10).isin(7, 8) || offs % 17 === 0, lit(null))
        .otherwise(concat(
          lit("{\"ID\":"), k.cast("string"),
          lit(",\"AMOUNT\":"), amountStr, lit("}"))).as("value_json"))
  }

  /**
   * Kafka-wire form (Cdc.kafkaWireSchema shape): key/value as binary,
   * headers as array<struct<key,value:binary>> with absent headers
   * filtered out — exactly what `spark.readStream.format("kafka")`
   * with includeHeaders=true yields. This is the input the real
   * operator chain (CdcOps) runs on.
   */
  def wire(spark: SparkSession, sfDir: String): DataFrame = {
    def hdr(name: String, v: Column) =
      struct(lit(name).as("key"), encode(v, "UTF-8").as("value"))
    base(spark, sfDir).select(
      encode(col("key_json"), "UTF-8").as("key"),
      encode(col("value_json"), "UTF-8").as("value"),
      filter(
        array(
          hdr(Cdc.Headers.TableName, col("table_name")),
          hdr(Cdc.Headers.EntryType, col("entry_type")),
          hdr(Cdc.Headers.Timestamp, col("ats"))),
        h => h.getField("value").isNotNull).as("headers"),
      col("topic"),
      col("kpart").as("partition"),
      col("offs").as("offset"))
  }

  /**
   * DuckDB mirror of [[base]] — the oracle-side spec. Uses only ANSI
   * constructs whose semantics are bit-identical between Spark and
   * DuckDB (integer modulo, string concat with NULL propagation,
   * decimal(12,2) cast for the amount text).
   */
  val feedSql: String = """
    SELECT
      event_id AS offs,
      CAST(event_id % 8 AS INT) AS kpart,
      'iidr.CDC.SRC' || CAST(event_id % 3 AS VARCHAR) AS topic,
      CASE WHEN event_id % 97 = 13 THEN NULL
           ELSE 'TEST_' || UPPER(event_type) END AS table_name,
      CASE WHEN event_id % 89 = 7 THEN NULL ELSE
        CASE CAST(event_id % 10 AS INT)
          WHEN 0 THEN 'PT' WHEN 1 THEN 'rr ' WHEN 2 THEN ' Px'
          WHEN 3 THEN 'UP' WHEN 4 THEN 'fi' WHEN 5 THEN 'FP'
          WHEN 6 THEN 'ur' WHEN 7 THEN 'DL' WHEN 8 THEN 'dr '
          ELSE 'ZZ' END END AS entry_type,
      (event_id * 7) % 3000 AS k,
      user_id,
      value,
      strftime(ts, '%Y-%m-%d %H:%M:%S') || '.' ||
        lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0') || '123456' AS ats,
      CASE WHEN event_id % 13 = 0 THEN NULL
           ELSE '{"ID":' || CAST((event_id * 7) % 3000 AS VARCHAR) || '}'
      END AS key_json,
      CASE WHEN CAST(event_id % 10 AS INT) IN (7, 8) OR event_id % 17 = 0 THEN NULL
           ELSE '{"ID":' || CAST((event_id * 7) % 3000 AS VARCHAR) ||
                ',"AMOUNT":' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) || '}'
      END AS value_json
    FROM events"""

  /**
   * DuckDB mirror of the normalize chain (CdcOps H1/H2/P1/P2/P3/T3):
   * adds op, target_table (format `sync_${TableName}`, lower-cased),
   * and corrupt_reason in the reference's check order.
   */
  val normalizedSql: String = s"""
    WITH feed AS ($feedSql)
    SELECT feed.*,
      CASE WHEN UPPER(TRIM(entry_type)) IN ('PT','RR','PX','UP','FI','FP','UR') THEN 'UPSERT'
           WHEN UPPER(TRIM(entry_type)) IN ('DL','DR') THEN 'DELETE' END AS op,
      LOWER('sync_' || table_name) AS target_table,
      CASE
        WHEN table_name IS NULL THEN 'Missing required header: TableName'
        WHEN entry_type IS NULL THEN 'Missing required header: A_ENTTYP'
        WHEN UPPER(TRIM(entry_type)) NOT IN
             ('PT','RR','PX','UP','FI','FP','UR','DL','DR')
          THEN 'Unknown entry type: ' || UPPER(TRIM(entry_type))
        WHEN UPPER(TRIM(entry_type)) IN ('DL','DR') AND key_json IS NULL
          THEN 'DELETE record has no key'
        WHEN UPPER(TRIM(entry_type)) IN ('DL','DR') AND NOT json_valid(key_json)
          THEN 'DELETE record key is not valid JSON'
        WHEN UPPER(TRIM(entry_type)) NOT IN ('DL','DR') AND value_json IS NULL
          THEN 'Record has no value'
        WHEN UPPER(TRIM(entry_type)) NOT IN ('DL','DR') AND NOT json_valid(value_json)
          THEN 'Record value is not valid JSON'
      END AS corrupt_reason
    FROM feed"""
}
