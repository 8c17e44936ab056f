package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver test data (TESTDATA.md). */
object Tables {

  /**
   * `events.parquet` carries TIMESTAMP(NANOS), which Spark 4 refuses
   * unless the legacy nanos-as-long read path is on. We read nanos as
   * Long and rebuild a (micros) TimestampType column — truncation from
   * nanos matches DuckDB's cast-to-micros behavior for the oracle.
   */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }
}
