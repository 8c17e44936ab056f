package graft

import java.sql.DriverManager

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.model.{Cdc, CdcConfig}
import graft.operators.CdcNormalize
import graft.sinks._

/**
 * M5 datatype matrix: dialect SQL generation matches the reference's
 * forms (MySqlDialect.java:16-31, PostgreSqlDialect.java:17-39,
 * GenericDialect.java:199-221) and a full-type row survives the JDBC
 * apply round-trip on Derby (typed binding, W7).
 */
class DialectSpec extends SparkSpec {

  test("MySQL upsert SQL matches ON DUPLICATE KEY UPDATE form") {
    MySqlDialect.upsertSql("t", Seq("id", "a", "b"), Seq("id")) match {
      case NativeUpsert(sql, _) =>
        assert(sql == "INSERT INTO `t` (`id`, `a`, `b`) VALUES (?, ?, ?) " +
          "ON DUPLICATE KEY UPDATE `a` = VALUES(`a`), `b` = VALUES(`b`)")
      case other => fail(s"unexpected $other")
    }
  }

  test("PostgreSQL upsert SQL matches ON CONFLICT form; all-PK degrades to DO NOTHING") {
    PostgreSqlDialect.upsertSql("t", Seq("id", "a"), Seq("id")) match {
      case NativeUpsert(sql, _) =>
        assert(sql == """INSERT INTO "t" ("id", "a") VALUES (?, ?) """ +
          """ON CONFLICT ("id") DO UPDATE SET "a" = EXCLUDED."a"""")
      case other => fail(s"unexpected $other")
    }
    PostgreSqlDialect.upsertSql("t", Seq("id"), Seq("id")) match {
      case NativeUpsert(sql, _) => assert(sql.endsWith("DO NOTHING"))
      case other => fail(s"unexpected $other")
    }
  }

  test("dialect selection by product name (DialectFactory semantics)") {
    assert(Dialects.forProductName("MySQL") == MySqlDialect)
    assert(Dialects.forProductName("MariaDB") == MySqlDialect)
    assert(Dialects.forProductName("PostgreSQL") == PostgreSqlDialect)
    assert(Dialects.forProductName("Apache Derby") == GenericDialect)
    assert(Dialects.forProductName(null) == GenericDialect)
  }

  test("type mapping covers the Connect-type surface (GenericDialect.java:199-221)") {
    val d = GenericDialect
    assert(d.typeFor(LongType) == "BIGINT")
    assert(d.typeFor(IntegerType) == "INTEGER")
    assert(d.typeFor(DoubleType) == "DOUBLE")
    assert(d.typeFor(BooleanType) == "BOOLEAN")
    assert(d.typeFor(DecimalType(12, 2)) == "DECIMAL(12,2)")
    assert(d.typeFor(TimestampType) == "TIMESTAMP")
    assert(d.typeFor(DateType) == "DATE")
    assert(d.typeFor(BinaryType) == "BLOB")
    assert(MySqlDialect.typeFor(StringType) == "TEXT")
    assert(PostgreSqlDialect.typeFor(DoubleType) == "DOUBLE PRECISION")
  }

  test("identifier quoting escapes embedded quote characters (DDL injection guard)") {
    assert(GenericDialect.quote("""a" INT); DROP TABLE x; --""") ==
      "\"a\"\" INT); DROP TABLE x; --\"")
    assert(MySqlDialect.quote("a` INT); DROP TABLE x; --") ==
      "`a`` INT); DROP TABLE x; --`")
    assert(GenericDialect.quote("plain") == "\"plain\"")
  }

  test("MySQL string/binary PRIMARY KEY columns get indexable types, not TEXT") {
    val schema = StructType.fromDDL("ID STRING, PAYLOAD STRING")
    val ddl = MySqlDialect.createTableSql("t", schema, Seq("ID"))
    assert(ddl.contains("`ID` VARCHAR(255) NOT NULL"),
      s"string PK must be VARCHAR, got: $ddl")
    assert(ddl.contains("`PAYLOAD` TEXT"), s"non-PK string stays TEXT: $ddl")
    assert(MySqlDialect.pkTypeFor(BinaryType) == "VARBINARY(255)")
    assert(MySqlDialect.pkTypeFor(LongType) == "BIGINT")
  }

  test("full-type row round-trips through the Derby apply (typed binding)") {
    val url = "jdbc:derby:memory:typesdb;create=true"
    val schema = StructType.fromDDL(
      "ID BIGINT, S STRING, I INT, D DOUBLE, B BOOLEAN, " +
        "DEC DECIMAL(12,2), TS TIMESTAMP, DT DATE, TM STRING, " +
        "YM STRING, DS STRING, BIN STRING")
    // YM/DS arrive in the Debezium ISO-8601 forms, BIN as base64 —
    // the interval_ym/interval_ds/binary overrides re-type them
    // (oracle-datatype-test.sql:33-34; BYTES path GenericDialect
    // .java:199-221)
    val value =
      """{"ID":1,"S":"text","I":42,"D":2.5,"B":true,"DEC":123.45,
         |"TS":"2026-01-15T10:00:00","DT":"2026-01-15","TM":"10:30:00",
         |"YM":"P1Y2M0DT0H0M0S","DS":"P0Y0M1DT2H3M4.5S","BIN":"aGVsbG8="}"""
        .stripMargin.replaceAll("\n", "")
    val wire = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        """{"ID":1}""".getBytes("UTF-8"), value.getBytes("UTF-8"),
        Seq(Row("TableName", "TYPED".getBytes("UTF-8")),
          Row("A_ENTTYP", "PT".getBytes("UTF-8"))),
        "t", 0, 0L, java.sql.Timestamp.valueOf("2026-01-15 10:00:00")))),
      Cdc.kafkaWireSchema)
    val cfg = JdbcApply.Config(
      url = url,
      tableSchemas = Map("TYPED" -> schema),
      keySchemas = Map("TYPED" -> StructType.fromDDL("ID BIGINT")),
      primaryKeys = Map("TYPED" -> Seq("ID")),
      fieldTypeOverrides = Map(
        "YM" -> "interval_ym", "DS" -> "interval_ds", "BIN" -> "binary"))
    JdbcApply.applyBatch(CdcNormalize(wire, CdcConfig()), cfg)

    val conn = DriverManager.getConnection("jdbc:derby:memory:typesdb")
    try {
      // interval columns land as VARCHAR on Derby (no INTERVAL type)
      val meta = conn.createStatement().executeQuery(
        """SELECT COLUMNDATATYPE FROM SYS.SYSCOLUMNS c
          |JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
          |WHERE t.TABLENAME = 'TYPED' AND c.COLUMNNAME = 'YM'""".stripMargin)
      assert(meta.next() && meta.getString(1).startsWith("VARCHAR"))
      val rs = conn.createStatement().executeQuery(
        """SELECT "ID", "S", "I", "D", "B", "DEC", "TS", "DT", "TM",
          |"YM", "DS", "BIN" FROM "TYPED"""".stripMargin)
      assert(rs.next())
      assert(rs.getLong(1) == 1L)
      assert(rs.getString(2) == "text")
      assert(rs.getInt(3) == 42)
      assert(rs.getDouble(4) == 2.5)
      assert(rs.getBoolean(5))
      assert(rs.getBigDecimal(6).doubleValue() == 123.45)
      assert(rs.getTimestamp(7).toString == "2026-01-15 10:00:00.0")
      assert(rs.getDate(8).toString == "2026-01-15")
      assert(rs.getString(9) == "10:30:00") // TIME carried as string (no Spark TimeType)
      assert(rs.getString(10) == "1-2")               // ANSI y-m literal
      assert(rs.getString(11) == "1 02:03:04.500000") // ANSI d h:m:s literal
      assert(new String(rs.getBytes(12), "UTF-8") == "hello") // BLOB bind
      assert(!rs.next())
    } finally conn.close()
  }

  test("interval coercion parses Oracle literals and ISO durations; rejects garbage") {
    import graft.operators.TypeOverrides
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq("1-2", "-1-2", "+0-11", "P1Y2M", "P1Y2M0DT0H0M0S",
      "1-2-3", "P1Y2M3DT0H0M0S", "nonsense", "",
      "200000000-0", "1-45")
      .toDF("s")
      .select(TypeOverrides.coerce(col("s"), "interval_ym").cast("string").as("ym"))
    val ym = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(ym.toSeq == Seq(
      Some("INTERVAL '1-2' YEAR TO MONTH"), Some("INTERVAL '-1-2' YEAR TO MONTH"),
      Some("INTERVAL '0-11' YEAR TO MONTH"), Some("INTERVAL '1-2' YEAR TO MONTH"),
      Some("INTERVAL '1-2' YEAR TO MONTH"),
      None,  // malformed literal
      None,  // nonzero day part cannot be an YM interval
      None, None,
      None,  // out-of-range years would overflow make_ym_interval (ANSI throw)
      None)) // months 45 is an impossible literal — reject, don't normalize
    val ds = Seq("1 2:3:4.5", "-0 0:0:1", "P0Y0M1DT2H3M4.5S", "PT26H",
      "P1Y0M1DT0H0M0S", "junk", "",
      "0 99:00:00", "99999999999 00:00:00")
      .toDF("s")
      .select(TypeOverrides.coerce(col("s"), "interval_ds").cast("string").as("ds"))
      .collect().map(r => Option(r.get(0)).map(_.toString))
    assert(ds.toSeq == Seq(
      Some("INTERVAL '1 02:03:04.5' DAY TO SECOND"),
      Some("INTERVAL '-0 00:00:01' DAY TO SECOND"),
      Some("INTERVAL '1 02:03:04.5' DAY TO SECOND"),
      Some("INTERVAL '1 02:00:00' DAY TO SECOND"),
      None,  // nonzero year part cannot be a DS interval
      None, None,
      None,  // hours 99 is an impossible literal — reject, don't normalize
      None)) // out-of-range days would overflow int64 micros (ANSI throw)
  }
}
