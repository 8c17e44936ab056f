package graft.model

import org.apache.spark.sql.types._

/**
 * Data model for the CDC engine (SURVEY.md §1).
 *
 * The unit of data is a Kafka-wire record — key/value bytes plus CDC
 * metadata headers (reference: sink README.md:40-52,
 * HeaderExtractor.java:19-21). We normalize every record into a flat
 * event with extracted header columns, a mapped operation, a resolved
 * target table, and an optional `corrupt_reason` (the dead-letter
 * side-channel, CorruptEventWriter.java:37-114).
 */
object Cdc {

  /** Operation codes, reference CdcOperation.java:6-11. */
  object Op {
    val Insert = "INSERT"
    val Update = "UPDATE"
    val Delete = "DELETE"
    val Upsert = "UPSERT"
  }

  /** IIDR entry-type codes → operation (EntryTypeMapper.java:20-50). */
  val UpsertEntryTypes: Seq[String] = Seq("PT", "RR", "PX", "UP", "FI", "FP", "UR")
  val DeleteEntryTypes: Seq[String] = Seq("DL", "DR")

  /** Well-known header names (HeaderExtractor.java:19-21). */
  object Headers {
    val TableName = "TableName"
    val EntryType = "A_ENTTYP"
    val Timestamp = "A_TIMSTAMP"
  }

  /**
   * Kafka-wire schema as produced by Spark's Kafka source with
   * includeHeaders=true. Batch tests build DataFrames with this exact
   * shape; the streaming path gets it for free from
   * `spark.readStream.format("kafka")`.
   */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType))))),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** Normalized event columns added by the operator chain. */
  object Cols {
    val TableName = "table_name"
    val EntryType = "entry_type"
    val SourceTs = "source_ts"
    /** A_TIMSTAMP localized to `CdcConfig.timestampZone` (reference
      * normalize step 5, IidrCdcSinkTask.java:197-201). */
    val SourceTsIso = "source_ts_iso"
    val Op = "op"
    val TargetTable = "target_table"
    val CorruptReason = "corrupt_reason"
    val KeyJson = "key_json"
    val ValueJson = "value_json"
  }

  /** DLQ row shape (streaming_corrupt_events, CorruptEventWriter.java:42-58). */
  val corruptEventSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("kafka_partition", IntegerType, nullable = false),
    StructField("kafka_offset", LongType, nullable = false),
    StructField("record_key", StringType),
    StructField("record_value", StringType),
    StructField("headers", StringType),
    StructField("error_reason", StringType, nullable = false),
    StructField("table_name", StringType),
    StructField("entry_type", StringType)))
}

/**
 * Typed engine configuration — the Scala analogue of
 * IidrCdcSinkConfig.java:85-120 (ConfigDef → case class).
 */
final case class CdcConfig(
    /** `table.header` / `entry.type.header`: which record headers carry
      * the table name and entry-type code (IidrToJdbcSinkTransform
      * .java:52-55, defaults TableName / A_ENTTYP). */
    tableHeader: String = Cdc.Headers.TableName,
    entryTypeHeader: String = Cdc.Headers.EntryType,
    /** `table.name.format`, `${TableName}`/`${topic}` substituted (IidrCdcSinkTask.java:222-227). */
    tableNameFormat: String = "${TableName}",
    /** Optional literal/regex table filters (IidrCdcSinkTask.java:292-309; IidrToJdbcSinkTransform.java:156-159). */
    tableNameFilter: Option[String] = None,
    topicRegexFilter: Option[String] = None,
    /** Identifier case: "lower" | "upper" | "none" (IidrToJdbcSinkTransform.java:212-220). */
    identifierCase: String = "none",
    /** Primary-key column names per target table. */
    primaryKeys: Map[String, Seq[String]] = Map.empty,
    /** `iidr.errors.tolerance`: none | log | all (IidrCdcSinkConfig.java:41-44). */
    errorsTolerance: String = "none",
    /** A_TIMSTAMP localization zone, named or ±HH:MM (TimestampConverter.java:37-62). */
    timestampZone: String = "UTC",
    /** JDBC batch size (IidrCdcSinkConfig.java:72-74). */
    batchSize: Int = 3000,
    /** Auto DDL (JdbcWriter.java:326-372). */
    autoCreate: Boolean = false,
    autoEvolve: Boolean = false)
