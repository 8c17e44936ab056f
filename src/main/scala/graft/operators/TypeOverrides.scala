package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, StringType, TimestampType}

/**
 * `field.type.overrides` (SURVEY.md §2.4; IidrToJdbcSinkTransform
 * .java:61-62,121-148,258-294): per-field forcing of STRING payload
 * values to `timestamp`, `date`, or `time`, with the reference's
 * pattern lists tried in order (UTC, strict).
 *
 * A non-blank value that matches no pattern is a DATA error, not a
 * silent null: [[failureReason]] yields the reason string the corrupt
 * channel records (the reference throws DataException → Connect DLQ;
 * here the reason routes the row to the corrupt branch, SURVEY.md
 * §2.7 W11).
 *
 * All coercions are compositions of codegen'd builtins
 * (`try_to_timestamp` + `coalesce`) — one whole-stage pass, no UDFs.
 * Divergence (documented): `SimpleDateFormat` ignores trailing
 * characters past its pattern (so `2026-01-01garbage` parses as a
 * date); Spark's formatter is strict and rejects it — strictly fewer
 * malformed values pass.
 */
object TypeOverrides {

  /** Legal override type names (IidrToJdbcSinkTransform.java:139-143). */
  val SupportedTypes: Set[String] = Set("timestamp", "date", "time")

  /** Patterns in the reference's order (most specific first,
    * IidrToJdbcSinkTransform.java:68-76). */
  private val TimestampPatterns = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss")
  private val DatePatterns = Seq("yyyy-MM-dd")
  private val TimePatterns = Seq("HH:mm:ss.SSS", "HH:mm:ss")

  /**
   * Parse `field:type,field:type` config (IidrToJdbcSinkTransform
   * .java:121-148): same validation, same failure modes — a malformed
   * pair or unsupported type fails CONFIGURATION, never a record.
   */
  def parseConfig(config: String): Map[String, String] = {
    val c = Option(config).map(_.trim).getOrElse("")
    if (c.isEmpty) Map.empty
    else c.split(",").map(_.trim).filter(_.nonEmpty).map { pair =>
      pair.split(":", 2) match {
        case Array(f, t) =>
          val (field, tpe) = (f.trim, t.trim.toLowerCase)
          require(SupportedTypes.contains(tpe),
            s"Unsupported type '$tpe' for field '$field'. " +
              s"Supported types: timestamp, date, time")
          field -> tpe
        case _ => throw new IllegalArgumentException(
          s"Invalid field.type.overrides entry: '$pair'. " +
            "Expected format: field_name:type")
      }
    }.toMap
  }

  /** Spark-side type an override materializes as. `time` stays a
    * canonical `HH:mm:ss.SSS` STRING — Spark has no TimeType
    * (SURVEY.md §7.3); the JDBC bind casts at the edge (W7). */
  def sparkType(typeName: String): DataType = typeName match {
    case "timestamp" => TimestampType
    case "date" => DateType
    case "time" => StringType
    case t => throw new IllegalArgumentException(s"Unsupported type override: $t")
  }

  /** Coerced value: null for null/blank input (IidrToJdbcSinkTransform
    * .java:272-274), null for unparseable (pair with [[failureReason]]
    * to distinguish), else the typed value. */
  def coerce(raw: Column, typeName: String): Column = {
    val s = nullif(trim(raw), lit(""))
    typeName match {
      case "timestamp" =>
        coalesce(TimestampPatterns.map(p => try_to_timestamp(s, lit(p))): _*)
      case "date" =>
        coalesce(DatePatterns.map(p => try_to_timestamp(s, lit(p))): _*).cast("date")
      case "time" =>
        date_format(
          coalesce(TimePatterns.map(p => try_to_timestamp(s, lit(p))): _*),
          "HH:mm:ss.SSS")
      case t => throw new IllegalArgumentException(s"Unsupported type override: $t")
    }
  }

  /** Reason string when a NON-blank value matches no pattern (mirrors
    * the reference's DataException text, IidrToJdbcSinkTransform
    * .java:292-294); null when the value is blank or coercible. */
  def failureReason(raw: Column, typeName: String): Column = {
    val s = nullif(trim(raw), lit(""))
    when(s.isNotNull && coerce(raw, typeName).isNull,
      concat(lit("Cannot parse '"), s, lit(s"' as $typeName")))
  }
}
