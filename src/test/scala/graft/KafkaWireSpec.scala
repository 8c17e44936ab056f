package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.model.{Cdc, CdcConfig}
import graft.operators.CdcNormalize

/**
 * The Kafka wire contract (VERDICT r16 #1): every offline proof in
 * this repo — the checkpoint kill/restart cases, the CDC e2e specs,
 * the DuckDB-oracled `q_cdc_*` family — drives the production writer
 * chain through frames shaped as [[Cdc.kafkaWireSchema]], standing in
 * for `spark.readStream.format("kafka").option("includeHeaders",
 * true).load()` (reference intake: IidrCdcSinkTask.java:94-155). If
 * that stand-in ever drifted from the real source's projection, every
 * offline proof would silently prove the wrong wire. This spec pins
 * the seam from three directions:
 *
 *  1. the real source projection, as a version-pinned literal — the
 *     schema is STATIC (Spark's KafkaRecordToRowConverter declares it;
 *     `external/kafka-0-10-sql/.../KafkaRecordToRowConverter.scala`,
 *     `kafkaSchemaWithHeaders`), so no broker is needed to check it;
 *  2. `Cdc.kafkaWireSchema` as a name-and-type PROJECTION of that
 *     literal (the chain binds columns by name, so order is free and
 *     the passthrough-only `timestampType` may be absent);
 *  3. the normalize chain itself run over BOTH shapes on identical
 *     records, asserting identical events — the executable form of
 *     "the stand-in and the wire are interchangeable".
 *
 * The connector jar does not ship in this sandbox (zero egress;
 * `/opt/spark/jars` carries no spark-sql-kafka), so the literal is
 * the anchor here — but the spec upgrades itself: when the jar IS on
 * the classpath, `load().schema` is asserted against the literal, so
 * a Spark upgrade that drifts the projection fails this spec before
 * any offline proof goes stale.
 */
class KafkaWireSpec extends SparkSpec {

  /** Spark's Kafka source projection with includeHeaders=true —
    * KafkaRecordToRowConverter.kafkaSchemaWithHeaders verbatim. */
  private val kafkaSourceSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  test("Cdc.kafkaWireSchema is a name-and-type projection of the Kafka source schema") {
    val byName = kafkaSourceSchema.fields.map(f => f.name -> f.dataType).toMap
    Cdc.kafkaWireSchema.fields.foreach { f =>
      assert(byName.get(f.name).contains(f.dataType),
        s"wire column ${f.name}: ${f.dataType} is missing from or " +
          s"mismatches the Kafka source projection (${byName.get(f.name)})")
    }
    // the projection may only DROP passthrough columns the chain never
    // binds — today exactly timestampType; a new Spark column showing
    // up here is a prompt to decide passthrough-vs-bind, not an error
    // the chain would hit
    val dropped = kafkaSourceSchema.fieldNames.toSet --
      Cdc.kafkaWireSchema.fieldNames.toSet
    assert(dropped == Set("timestampType"),
      s"unexpected projection gap vs the Kafka source: $dropped")
  }

  test("live kafka source schema equals the pinned literal when the connector jar is present") {
    val providerPresent =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    if (providerPresent) {
      // static schema: load() builds the relation without contacting
      // any broker, so a dead bootstrap address is fine
      val real = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("subscribe", "t")
        .option("includeHeaders", "true")
        .load().schema
      assert(real == kafkaSourceSchema,
        s"Kafka source projection drifted from the pinned literal: $real")
    } else {
      // zero-egress sandbox: the jar cannot be fetched, so the literal
      // above is the contract of record (documented in the class doc);
      // this branch exists so the assertion auto-arms on any classpath
      // that does carry the connector
      info("spark-sql-kafka not on the classpath; literal pin is the anchor")
    }
  }

  test("normalize chain is shape-agnostic: real-wire frames and kafkaWireSchema frames yield identical events") {
    // one record rendered in BOTH shapes (values keyed by column name,
    // order supplied by each schema)
    val vals: Map[String, Any] = Map(
      "key" -> """{"ID":1}""".getBytes("UTF-8"),
      "value" -> """{"ID":1,"NAME":"a"}""".getBytes("UTF-8"),
      "headers" -> Seq(
        Row("TableName", "CUSTOMER".getBytes("UTF-8")),
        Row("A_ENTTYP", "PT".getBytes("UTF-8")),
        Row("A_TIMSTAMP",
          "2024-01-02-03.04.05.123456000000".getBytes("UTF-8"))),
      "topic" -> "iidr.src.customer",
      "partition" -> 0,
      "offset" -> 7L,
      "timestamp" -> java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
      "timestampType" -> 0)
    def eventsOver(shape: StructType): Seq[Row] = {
      val row = Row(shape.fieldNames.map(n => vals(n)).toIndexedSeq: _*)
      val df = CdcNormalize(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row)), shape), CdcConfig())
      // compare the produced EVENT columns plus the coordinates the
      // apply binds; key/value binaries stay out (array equality) —
      // their decoded twins key_json/value_json stand in
      df.select(
        (Seq("topic", "partition", "offset") ++ Seq(
          Cdc.Cols.TableName, Cdc.Cols.EntryType, Cdc.Cols.SourceTs,
          Cdc.Cols.SourceTsIso, Cdc.Cols.KeyJson, Cdc.Cols.ValueJson,
          Cdc.Cols.Op, Cdc.Cols.TargetTable, Cdc.Cols.CorruptReason))
          .map(col): _*)
        .collect().toSeq
    }
    val viaWire = eventsOver(Cdc.kafkaWireSchema)
    val viaSource = eventsOver(kafkaSourceSchema)
    assert(viaWire == viaSource,
      s"normalize chain diverges across wire shapes:\n$viaWire\n$viaSource")
    assert(viaWire.head.getAs[String](Cdc.Cols.TargetTable) == "CUSTOMER" &&
      viaWire.head.getAs[String](Cdc.Cols.Op) == Cdc.Op.Upsert,
      s"fixture must normalize to a routable upsert: ${viaWire.head}")
  }
}
