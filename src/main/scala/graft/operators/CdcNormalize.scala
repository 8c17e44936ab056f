package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{Cdc, CdcConfig}

/**
 * The normalize chain (SURVEY.md §3.1 steps 2-8): Kafka-wire records →
 * flat normalized CDC events with extracted headers, mapped operation,
 * resolved target table, and `corrupt_reason` side-channel. Entirely
 * narrow (no shuffle) and whole-stage-codegen'd — at 100 TB this is a
 * single pipelined pass over the source partitions.
 *
 * Input shape: Cdc.kafkaWireSchema (key/value binary, headers array,
 * topic, partition, offset).
 */
object CdcNormalize {

  def apply(wire: DataFrame, cfg: CdcConfig = CdcConfig()): DataFrame = {
    import Cdc.Cols
    val withHeaders = wire
      .withColumn(Cols.TableName,
        CdcOps.headerString(col("headers"), cfg.tableHeader))
      .withColumn(Cols.EntryType,
        CdcOps.headerString(col("headers"), cfg.entryTypeHeader))
      .withColumn(Cols.SourceTs,
        CdcOps.headerString(col("headers"), Cdc.Headers.Timestamp))
      // Step 5 of the reference task (IidrCdcSinkTask.java:197-201):
      // localize A_TIMSTAMP with the configured zone; null stays null.
      // (Reads the source_ts column built above — one header
      // extraction, definitionally in sync.)
      .withColumn(Cols.SourceTsIso,
        graft.functions.Timestamps.iidrTimestampToIsoZoned(
          col(Cols.SourceTs), cfg.timestampZone))
      .withColumn(Cols.KeyJson, decode(col("key"), "UTF-8"))
      .withColumn(Cols.ValueJson, decode(col("value"), "UTF-8"))

    val routed = withHeaders
      .withColumn(Cols.Op, CdcOps.mapEntryType(col(Cols.EntryType)))
      .withColumn(Cols.TargetTable,
        CdcOps.applyIdentifierCase(
          CdcOps.resolveTargetTable(cfg.tableNameFormat,
            col(Cols.TableName), col("topic")),
          cfg.identifierCase))

    // Corrupt checks in the reference's order (IidrCdcSinkTask.java:161-217):
    // required headers → entry-type mapping → operation shape.
    routed.withColumn(Cols.CorruptReason, coalesce(
      CdcOps.missingHeaderReason(col(Cols.TableName), col(Cols.EntryType),
        cfg.tableHeader, cfg.entryTypeHeader),
      CdcOps.unknownEntryTypeReason(col(Cols.EntryType), col(Cols.Op)),
      CdcOps.shapeReason(col(Cols.Op), col(Cols.KeyJson), col(Cols.ValueJson))))
  }
}
