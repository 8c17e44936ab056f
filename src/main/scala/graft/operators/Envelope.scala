package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.GraftFunctions

/**
 * Debezium-envelope operators (SURVEY.md §1.1, §2.1 S6, §2.4 T5):
 * the `{before, after, op: c|u|d|r, ts_ms}` event shape consumed
 * either unwrapped (ExtractNewRecordState) or walked directly by the
 * charset SMT (LegacyCharsetTransform.java:145-172).
 */
object Envelope {

  /** Envelope schema for a given row schema (docs/ARCHITECTURE.md:54-61). */
  def schemaFor(row: StructType): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("before", row),
    org.apache.spark.sql.types.StructField("after", row),
    org.apache.spark.sql.types.StructField("op", StringType),
    org.apache.spark.sql.types.StructField("ts_ms",
      org.apache.spark.sql.types.LongType)))

  /** Parse a JSON envelope column (S6: schema'd converter path). */
  def parse(value: Column, rowSchema: StructType): Column =
    from_json(value, schemaFor(rowSchema))

  /**
   * Parse the full Debezium-JSON wire form `{"schema": {...},
   * "payload": {before, after, op, ts_ms}}` produced by JsonConverter
   * with schemas.enable=true (docker/README.md:184 payload access) —
   * the inline schema is ignored (we pin per-table StructTypes,
   * SURVEY.md §7.4), only payload is extracted.
   */
  def parseWrapped(value: Column, rowSchema: StructType): Column =
    from_json(value, StructType(Seq(
      org.apache.spark.sql.types.StructField("payload", schemaFor(rowSchema)))))
      .getField("payload")

  /**
   * Decimal handling mode (`decimal.handling.mode`, README.md:191-195;
   * docs/debezium-datatype-comparison-results.md:89-96): rewrite the
   * declared row schema so DECIMAL fields parse as exact decimals
   * ("precise"), doubles ("double"), or strings ("string").
   */
  def rowSchemaForDecimalMode(base: StructType, mode: String): StructType = {
    val target: org.apache.spark.sql.types.DataType => org.apache.spark.sql.types.DataType =
      mode match {
        case "precise" => identity
        case "double"  => { case _: org.apache.spark.sql.types.DecimalType =>
            org.apache.spark.sql.types.DoubleType
          case dt => dt }
        case "string"  => { case _: org.apache.spark.sql.types.DecimalType =>
            StringType
          case dt => dt }
        case other => throw new IllegalArgumentException(
          s"decimal.handling.mode must be precise|double|string, got $other")
      }
    StructType(base.fields.map(f => f.copy(dataType = target(f.dataType))))
  }

  /**
   * Debezium op → engine operation: c/u/r (create/update/snapshot
   * read) → UPSERT, d → DELETE (mariadb-source.json:24-28 rewrite
   * semantics + EntryTypeMapper upsert-everywhere strategy).
   */
  def mapDebeziumOp(op: Column): Column =
    when(op.isin("c", "u", "r"), graft.model.Cdc.Op.Upsert)
      .when(op === "d", graft.model.Cdc.Op.Delete)

  /**
   * Unwrap (ExtractNewRecordState, oracle-free-demo.json:20-22): row
   * image = after for upserts, before for deletes (key source).
   */
  def unwrap(env: Column): Column =
    when(env.getField("op") === "d", env.getField("before"))
      .otherwise(env.getField("after"))

  /**
   * MongoDB source unwrap (S4; mongodb-source.json:10,17-19 —
   * `capture.mode=change_streams_update_full` + the
   * ExtractNewDocumentState SMT with `delete.handling.mode=drop`,
   * `drop.tombstones=true`): the Mongo envelope carries the FULL new
   * document as a JSON-encoded STRING in `after` (BSON → extended
   * JSON), so the unwrap is a two-level decode — parse the envelope,
   * emit the decoded `after` document for c/u/r, and DROP deletes
   * (null), exactly what the configured SMT forwards to the sink
   * topic. Extended-JSON wrappers (`{"$oid": …}`, `{"$numberLong":
   * …}`) stay verbatim in the document text; [[graft.sinks.MongoApply]]
   * routes by the `_id` subtree as an opaque key, so a full BSON type
   * mapper is not needed for the sink path. A MALFORMED envelope also
   * yields null (from_json fails → op null) — downstream it is
   * indistinguishable from a dropped delete, mirroring the configured
   * pipeline where converter failures never reach the sink either.
   */
  def extractNewDocumentState(env: Column): Column = {
    val parsed = from_json(env, StructType(Seq(
      org.apache.spark.sql.types.StructField("after", StringType),
      org.apache.spark.sql.types.StructField("op", StringType),
      org.apache.spark.sql.types.StructField("ts_ms",
        org.apache.spark.sql.types.LongType))))
    when(parsed.getField("op").isin("c", "u", "r"), parsed.getField("after"))
  }

  /**
   * T5 + P7: envelope-aware charset rewrite — decode the listed string
   * columns (empty list ⇒ ALL string columns, LegacyCharsetTransform
   * .java:196-207) inside both `before` and `after` sub-structs,
   * preserving every other field. Pure struct rebuild: stays narrow
   * and codegen'd.
   */
  def charsetRewrite(env: Column, rowSchema: StructType,
      columns: Seq[String], charset: String): Column = {
    val targets =
      if (columns.nonEmpty) columns.toSet
      else rowSchema.fields.filter(_.dataType == StringType).map(_.name).toSet
    def rebuilt(side: Column): Column = {
      val fields = rowSchema.fields.map { f =>
        val c = side.getField(f.name)
        val v = if (f.dataType == StringType && targets.contains(f.name))
          GraftFunctions.legacyCharsetDecode(c, charset)
        else c
        v.as(f.name)
      }
      when(side.isNotNull, struct(fields.toSeq: _*))
    }
    struct(
      rebuilt(env.getField("before")).as("before"),
      rebuilt(env.getField("after")).as("after"),
      env.getField("op").as("op"),
      env.getField("ts_ms").as("ts_ms"))
  }
}
