package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver test data (TESTDATA.md). */
object Tables {

  /**
   * The driver's parquet timestamps have shifted shape across
   * regenerations: TIMESTAMP(NANOS) (which Spark 4 refuses unless the
   * legacy nanos-as-long read path is on) and plain `timestamp[us]`
   * with no zone (which Spark reads as TIMESTAMP_NTZ — a type
   * `unix_micros` and friends reject). Normalize both to session-TZ
   * TimestampType here so every downstream operator sees one timestamp
   * type regardless of which writer produced the file. All graft entry
   * points pin `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast
   * is value-preserving on the epoch reading and matches how DuckDB
   * treats the same naive column in the oracle.
   */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => acc
      }
    }
  }
}
