package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Envelope

/** T5 envelope-aware charset rewrite + S6 envelope parse/unwrap. */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType.fromDDL("ID BIGINT, NAME STRING, NOTE STRING")

  test("envelope parse + unwrap: after for upserts, before for deletes") {
    val df = Seq(
      """{"before":null,"after":{"ID":1,"NAME":"a","NOTE":"x"},"op":"c","ts_ms":10}""",
      """{"before":{"ID":2,"NAME":"b","NOTE":"y"},"after":null,"op":"d","ts_ms":20}""")
      .toDF("v")
      .select(Envelope.parse(col("v"), rowSchema).as("env"))
      .select(
        Envelope.mapDebeziumOp(col("env.op")).as("op"),
        Envelope.unwrap(col("env")).getField("ID").as("id"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("UPSERT", 1L), ("DELETE", 2L)))
  }

  test("charset rewrite decodes only listed columns in both sub-structs (T5+P7)") {
    val mangled = CharsetFixture.mangled.head._2 // Big5-mangled 測試
    val expected = CharsetFixture.expected.head._2
    val df = Seq(
      s"""{"before":{"ID":1,"NAME":"$mangled","NOTE":"$mangled"},"after":{"ID":1,"NAME":"$mangled","NOTE":"keep"},"op":"u","ts_ms":1}""")
      .toDF("v")
      .select(Envelope.parse(col("v"), rowSchema).as("env"))
      .select(Envelope.charsetRewrite(col("env"), rowSchema, Seq("NAME"), "Big5").as("env"))
    val r = df.select(
      col("env.before.NAME"), col("env.before.NOTE"),
      col("env.after.NAME"), col("env.after.NOTE"), col("env.op")).head()
    assert(r.getString(0) == expected) // before.NAME decoded
    assert(r.getString(1) == mangled)  // before.NOTE untouched (column filter)
    assert(r.getString(2) == expected) // after.NAME decoded
    assert(r.getString(3) == "keep")
    assert(r.getString(4) == "u")      // op preserved
  }

  test("payload wrapper parse ignores the inline schema (schemas.enable=true form)") {
    val df = Seq(
      """{"schema":{"type":"struct","fields":[{"field":"ID","type":"int64"}]},
         |"payload":{"before":null,"after":{"ID":5,"NAME":"n","NOTE":null},"op":"c","ts_ms":99}}"""
        .stripMargin.replaceAll("\n", "")).toDF("v")
      .select(Envelope.parseWrapped(col("v"), rowSchema).as("env"))
    val r = df.select(col("env.after.ID"), col("env.op"), col("env.ts_ms")).head()
    assert(r.getLong(0) == 5L && r.getString(1) == "c" && r.getLong(2) == 99L)
  }

  test("decimal handling modes: precise | double | string") {
    import org.apache.spark.sql.types._
    val base = StructType.fromDDL("ID BIGINT, AMT DECIMAL(12,2)")
    val json = Seq("""{"before":null,"after":{"ID":1,"AMT":123.45},"op":"c","ts_ms":1}""").toDF("v")
    def parsedType(mode: String): (DataType, Any) = {
      val schema = Envelope.rowSchemaForDecimalMode(base, mode)
      val r = json.select(Envelope.parse(col("v"), schema).getField("after")
        .getField("AMT").as("amt")).head()
      (json.select(Envelope.parse(col("v"), schema).getField("after")
        .getField("AMT")).schema.head.dataType, r.get(0))
    }
    assert(parsedType("precise") ==
      (DecimalType(12, 2), new java.math.BigDecimal("123.45")))
    assert(parsedType("double") == (DoubleType, 123.45))
    assert(parsedType("string") == (StringType, "123.45"))
    intercept[IllegalArgumentException](Envelope.rowSchemaForDecimalMode(base, "bogus"))
  }

  test("ExtractNewDocumentState decodes the after-string doc and drops deletes") {
    val envs = Seq(
      // two-level decode: the embedded doc itself contains an escaped quote
      """{"after":"{\"_id\":{\"$oid\":\"abc\"},\"v\":\"q\\\"uote\"}","op":"c","ts_ms":1}""",
      """{"after":"{\"_id\":{\"$oid\":\"def\"},\"v\":1}","op":"u","ts_ms":2}""",
      """{"after":null,"op":"d","ts_ms":3}""", // delete.handling.mode=drop
      """{"after":"{\"_id\":1}","op":"x","ts_ms":4}""") // unknown op → dropped
    val got = envs.toDF("env")
      .select(Envelope.extractNewDocumentState(col("env")).as("doc"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("""{"_id":{"$oid":"abc"},"v":"q\"uote"}"""))
    assert(got(1).contains("""{"_id":{"$oid":"def"},"v":1}"""))
    assert(got(2).isEmpty)
    assert(got(3).isEmpty)
  }

  test("charset rewrite with empty column list decodes all string columns") {
    val mangled = CharsetFixture.mangled.head._2
    val expected = CharsetFixture.expected.head._2
    val df = Seq(
      s"""{"before":null,"after":{"ID":7,"NAME":"$mangled","NOTE":"$mangled"},"op":"c","ts_ms":1}""")
      .toDF("v")
      .select(Envelope.parse(col("v"), rowSchema).as("env"))
      .select(Envelope.charsetRewrite(col("env"), rowSchema, Seq.empty, "Big5").as("env"))
    val r = df.select(col("env.before"), col("env.after.NAME"), col("env.after.NOTE")).head()
    assert(r.isNullAt(0))              // null side stays null
    assert(r.getString(1) == expected)
    assert(r.getString(2) == expected)
  }
}
