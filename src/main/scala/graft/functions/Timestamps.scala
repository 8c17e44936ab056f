package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Temporal coercion operators (SURVEY.md §2.4 T1/T2).
 *
 * All of these are compositions of codegen'd builtins
 * (`try_to_timestamp` + `coalesce`), mirroring the reference's
 * try-patterns-in-order loops declaratively so Catalyst can constant-
 * fold and the whole chain stays in one codegen stage.
 */
object Timestamps {

  /**
   * A_TIMSTAMP → ISO-8601 (TimestampConverter.java:70-120).
   *
   * Input format `yyyy-MM-dd HH:mm:ss.SSSSSSSSSSSS` — up to 12
   * fractional digits. The reference pads/truncates the fraction to 9
   * (nanos); Spark timestamps are microseconds, so this engine
   * truncates to 6 and always emits a 6-digit fraction — documented
   * divergence (SURVEY.md §7.4). The timestamp is interpreted as wall
   * time in the configured zone and emitted with that zone's offset
   * suffix (e.g. `+08:00`), matching the reference's
   * `OffsetDateTime.toString` semantics for fixed-offset zones.
   */
  def iidrTimestampToIso(raw: Column, zoneOffset: String): Column = {
    val s = trim(raw)
    val datePart = substring(s, 1, 19)
    val frac6 = rpad(
      when(length(s) >= 21, substring(s, 21, 6)).otherwise(lit("")), 6, "0")
    val parsed = try_to_timestamp(
      concat(datePart, lit("."), frac6),
      lit("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    when(parsed.isNotNull,
      concat(date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit(zoneOffset)))
  }

  /** Patterns tried in order by the reference SMT (IidrToJdbcSinkTransform.java:68-75). */
  private val timestampPatterns = Seq(
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd")

  /**
   * Multi-pattern string → timestamp (IidrToJdbcSinkTransform.java:271-294):
   * try each pattern, first hit wins; empty/blank → null.
   */
  def coerceTimestamp(raw: Column): Column = {
    val s = nullif(trim(raw), lit(""))
    coalesce(timestampPatterns.map(p => try_to_timestamp(s, lit(p))): _*)
  }

  /** String → date: reference truncates to the first 10 chars (JdbcWriter.java:242-268). */
  def coerceDate(raw: Column): Column =
    try_to_timestamp(substring(nullif(trim(raw), lit("")), 1, 10), lit("yyyy-MM-dd"))
      .cast("date")

  /**
   * String → TIME: Spark has no TimeType (SURVEY.md §7.3) — normalize
   * to a canonical `HH:mm:ss` string, cast to target type at the JDBC
   * bind (mirrors W7's type-aware binding).
   */
  def coerceTime(raw: Column): Column = {
    val s = nullif(trim(raw), lit(""))
    date_format(try_to_timestamp(concat(lit("1970-01-01 "), substring(s, 1, 8)),
      lit("yyyy-MM-dd HH:mm:ss")), "HH:mm:ss")
  }
}
