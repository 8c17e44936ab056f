package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StructType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver test data (TESTDATA.md). */
object Tables {

  /**
   * The driver's parquet timestamps have shifted shape across
   * regenerations: TIMESTAMP(NANOS) (which Spark 4 refuses unless the
   * legacy nanos-as-long read path is on) and plain `timestamp[us]`
   * with no zone (which Spark reads as TIMESTAMP_NTZ — a type
   * `unix_micros` and friends reject). Normalize both to session-TZ
   * TimestampType here so every downstream operator sees one timestamp
   * type regardless of which writer produced the file. The NTZ→LTZ
   * cast is value-preserving on the epoch reading ONLY under a UTC
   * session zone (and that is also how DuckDB treats the same naive
   * column in the oracle), so the zone is pinned HERE — next to the
   * cast that depends on it — rather than relying on every entry
   * point's builder convention.
   *
   * The normalization folds over TOP-LEVEL fields only: the driver
   * tables are flat (TESTDATA.md), and no nested struct/array carries
   * a timestamp. Guarded by an assertion rather than a recursive
   * rewrite so a future regeneration that nests one fails loudly here
   * instead of downstream in a unix_micros-style consumer.
   */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case t =>
          require(!hasNestedNtz(t),
            s"Tables: nested TIMESTAMP_NTZ in $name.$f — flat-schema " +
              "normalization assumption violated; extend the rewrite")
          acc
      }
    }
  }

  /** True when a non-top-level type tree contains TIMESTAMP_NTZ. */
  private def hasNestedNtz(t: DataType): Boolean = t match {
    case TimestampNTZType => true
    case s: StructType => s.fields.exists(f => hasNestedNtz(f.dataType))
    case a: ArrayType => hasNestedNtz(a.elementType)
    case m: MapType => hasNestedNtz(m.keyType) || hasNestedNtz(m.valueType)
    case _ => false
  }
}
