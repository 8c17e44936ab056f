package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcOps
import graft.functions.Timestamps
import graft.{GraftFunctions, CharsetFixture}

/** Unit coverage for the scalar operators (the layer the reference
  * never unit-tested — SURVEY.md §5 implication (a)). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("entry-type mapping: trim, case, unknown codes (EntryTypeMapper semantics)") {
    val df = Seq("PT", "rr ", " Px", "UP", "fi", "FP", "ur", "DL", "dr ", "ZZ", "")
      .toDF("e")
      .select(col("e"), CdcOps.mapEntryType(col("e")).as("op"))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("PT").contains("UPSERT")); assert(got("rr ").contains("UPSERT"))
    assert(got(" Px").contains("UPSERT")); assert(got("ur").contains("UPSERT"))
    assert(got("DL").contains("DELETE")); assert(got("dr ").contains("DELETE"))
    assert(got("ZZ").isEmpty); assert(got("").isEmpty)
  }

  test("header extraction: LAST header with the name wins (lastWithName)") {
    val df = spark.sql(
      """SELECT array(
           named_struct('key', 'TableName', 'value', encode('first', 'UTF-8')),
           named_struct('key', 'TableName', 'value', encode('second', 'UTF-8'))
         ) AS headers""")
    val v = df.select(CdcOps.headerString(col("headers"), "TableName")).head().getString(0)
    assert(v == "second")
  }

  test("table routing template substitutes TableName and topic") {
    val df = Seq(("T1", "top.a")).toDF("tn", "topic")
    def route(fmt: String): String =
      df.select(CdcOps.resolveTargetTable(fmt, col("tn"), col("topic"))).head().getString(0)
    assert(route("sync_${TableName}") == "sync_T1")
    assert(route("${topic}_x") == "top.a_x")
    assert(route("plain") == "plain")
    assert(route("${TableName}_${topic}") == "T1_top.a")
  }

  test("legacy charset decode recovers the Big5 fixture (and is identity on ASCII)") {
    val df = CharsetFixture.mangled.toDF("id", "m")
      .select(col("id"), GraftFunctions.legacyCharsetDecode(col("m"), "Big5").as("d"))
    val got = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    CharsetFixture.expected.foreach { case (i, exp) => assert(got(i) == exp, s"case $i") }
  }

  test("legacy charset decode handles null input") {
    val df = Seq[(Int, Option[String])]((1, None)).toDF("id", "m")
      .select(GraftFunctions.legacyCharsetDecode(col("m"), "Big5").as("d"))
    assert(df.head().isNullAt(0))
  }

  test("multi-pattern temporal coercion (SMT pattern order)") {
    val df = Seq(
      "2026-01-15 10:00:00.123", "2026-01-15T10:00:00.123",
      "2026-01-15 10:00:00", "2026-01-15T10:00:00", "2026-01-15", "", "garbage")
      .toDF("s").select(col("s"), Timestamps.coerceTimestamp(col("s")).as("ts"))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    assert(got("2026-01-15 10:00:00.123").get.toString == "2026-01-15 10:00:00.123")
    assert(got("2026-01-15T10:00:00.123").get.toString == "2026-01-15 10:00:00.123")
    assert(got("2026-01-15 10:00:00").get.toString == "2026-01-15 10:00:00.0")
    // Reference parity: a bare date is NOT a timestamp (coerceValue has no
    // date-only pattern under a timestamp target; coerceDate is the date path).
    assert(got("2026-01-15").isEmpty)
    assert(got("").isEmpty); assert(got("garbage").isEmpty)
  }

  test("A_TIMSTAMP 12-digit fraction converts to ISO with zone offset") {
    val df = Seq("2026-01-15 10:00:00.123456789012").toDF("s")
      .select(Timestamps.iidrTimestampToIso(col("s"), "+08:00").as("iso"))
    assert(df.head().getString(0) == "2026-01-15T10:00:00.123456+08:00")
  }

  test("named-zone ISO conversion is DST-correct per instant (java.time truth)") {
    val inputs = Seq(
      "2025-06-15 12:30:45.123456789012", // NY summer (EDT, -04:00)
      "2025-01-15 12:30:45.000000000000", // NY winter (EST, -05:00)
      "2025-03-09 01:59:59.999999999999", // last instant before spring-forward
      "2025-11-02 01:30:00.000000000000") // fall-back overlap (earlier offset)
    def expected(s: String, zn: String): String = {
      import java.time._
      val wall = LocalDateTime.parse(s.substring(0, 26),
        format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
      // java.time resolution, exactly the reference's atZone call
      val off = wall.atZone(ZoneId.of(zn)).getOffset
      val tot = off.getTotalSeconds
      f"${s.substring(0, 10)}T${s.substring(11, 26)}" +
        f"${if (tot < 0) "-" else "+"}${math.abs(tot) / 3600}%02d:${math.abs(tot) / 60 % 60}%02d"
    }
    for (zone <- Seq("America/New_York", "Asia/Taipei", "UTC")) {
      val got = inputs.toDF("s")
        .select(Timestamps.iidrTimestampToIsoZoned(col("s"), zone).as("iso"))
        .collect().map(_.getString(0))
      assert(got.toSeq == inputs.map(expected(_, zone)), s"zone=$zone")
    }
  }

  test("schema inference clamps to the SMT value-type ladder") {
    import graft.operators.SchemaInfer
    import org.apache.spark.sql.types._
    val df = Seq(
      """{"i":1,"f":1.5,"b":true,"s":"x","n":null,"o":{"a":1},"arr":[1,2]}""",
      """{"i":2,"f":2.5,"b":false,"s":"y","n":null,"o":{"a":2},"arr":[3]}""")
      .toDF("j")
    val m = SchemaInfer.infer(spark, df, "j")
      .fields.map(f => f.name -> f.dataType).toMap
    assert(m("i") == LongType)
    assert(m("f") == DoubleType)
    assert(m("b") == BooleanType)
    assert(m("s") == StringType)
    assert(m("n") == StringType)   // null-only → string fallback
    assert(m("o") == StringType)   // nested → string fallback
    assert(m("arr") == StringType) // array → string fallback
    assert(SchemaInfer.infer(spark, Seq.empty[String].toDF("j"), "j").isEmpty)
  }

  test("schema inference is deterministic across row order when the sample cut matters") {
    // infer()'s scaladoc claims the bounded sample is DETERMINISTIC (a
    // bare limit takes whichever partitions answer first, so a field
    // with mixed JSON types could pin different DDL between restarts);
    // this fires the claim: MORE rows than the sample, a field whose
    // type differs on the two sides of the sorted cut, and shuffled /
    // re-partitioned inputs must all infer the SAME schema. With
    // payload ordering, the 10-row sample is exactly the "a..." rows
    // (long x); the "b..." rows (string x) sit past the cut.
    import graft.operators.SchemaInfer
    import org.apache.spark.sql.types._
    val rows =
      (0 until 10).map(i => s"""{"a":"a$i","x":$i}""") ++
        (0 until 40).map(i => s"""{"a":"b$i","x":"s$i"}""")
    val expected = StructType(Seq(
      StructField("a", StringType), StructField("x", LongType)))
    val rnd = new scala.util.Random(7L)
    (1 to 4).foreach { trial =>
      val df = rnd.shuffle(rows).toDF("j")
        .repartition(1 + rnd.nextInt(5))
      val got = SchemaInfer.infer(spark, df, "j", sampleSize = 10)
      assert(got == expected,
        s"trial $trial: order/partitioning leaked into the inferred DDL: $got")
    }
    // and WITH an offset column the cut keys on the stream position:
    // the first 10 offsets are the string-x rows, so x pins to string
    val withOff = rnd.shuffle(rows.reverse.zipWithIndex)
      .map { case (j, i) => (i.toLong, j) }.toDF("offset", "j")
      .repartition(3)
    val got = SchemaInfer.infer(spark, withOff, "j", sampleSize = 10)
    assert(got("x").dataType == StringType,
      s"offset-ordered sample must window the EARLIEST stream rows: $got")
  }

  test("schema drift flags added/removed/type-changed through real inference") {
    import graft.operators.SchemaInfer
    import graft.operators.SchemaInfer.Drift
    import org.apache.spark.sql.types._
    val pinned = StructType(Seq(
      StructField("ID", LongType), StructField("AMOUNT", DoubleType),
      StructField("LEGACY", StringType)))
    // the wire evolved: AMOUNT now arrives quoted (type flip), LEGACY
    // is gone, NOTE is new
    val feed = Seq(
      """{"ID":1,"AMOUNT":"1.50","NOTE":"a"}""",
      """{"ID":2,"AMOUNT":"2.75","NOTE":"b"}""").toDF("j")
    val observed = SchemaInfer.infer(spark, feed, "j")
    val got = SchemaInfer.drift(pinned, observed)
    assert(got == Seq(
      Drift("AMOUNT", "type_changed", Some("double"), Some("string")),
      Drift("LEGACY", "removed", Some("string"), None),
      Drift("NOTE", "added", None, Some("string"))))
    // no drift between identical schemas
    assert(SchemaInfer.drift(observed, observed).isEmpty)
  }

  test("zone resolution mirrors the reference: blank/unknown → UTC, offsets accepted") {
    assert(Timestamps.resolveZone("") == "UTC")
    assert(Timestamps.resolveZone(null) == "UTC")
    assert(Timestamps.resolveZone(" Asia/Taipei ") == "Asia/Taipei")
    assert(Timestamps.resolveZone("Not/AZone") == "UTC")
    assert(Timestamps.resolveZone("+08:00") == "+08:00")
    val df = Seq("2025-06-15 12:30:45.000000000000").toDF("s")
      .select(Timestamps.iidrTimestampToIsoZoned(col("s"), "Not/AZone").as("iso"))
    assert(df.head().getString(0) == "2025-06-15T12:30:45.000000+00:00")
  }

  test("SCD2 history: upserts open versions, next event closes, delete closes only") {
    // key 1: U@1, U@3, D@5, U@7 (re-insert)  → 3 versions, last open
    // key 2: U@2                              → 1 open version
    // key 3: D@4                              → no versions
    val feed = Seq(
      ("T", 1L, 1L, "UPSERT", 10.0), ("T", 1L, 3L, "UPSERT", 11.0),
      ("T", 1L, 5L, "DELETE", 0.0), ("T", 1L, 7L, "UPSERT", 12.0),
      ("T", 2L, 2L, "UPSERT", 20.0),
      ("T", 3L, 4L, "DELETE", 0.0)
    ).toDF("table_name", "k", "offset", "op", "amount")
    val hist = CdcOps.scd2History(feed, "table_name", Seq("k"), "offset", "op")
      .select("k", "version", "valid_from_offs", "valid_to_offs",
        "is_current", "closed_by_delete", "amount")
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getDouble(6)))
    assert(hist.toSeq == Seq(
      (1L, 1L, 1L, 3L, false, false, 10.0),
      (1L, 2L, 3L, 5L, false, true, 11.0),
      (1L, 3L, 7L, -1L, true, false, 12.0),
      (2L, 1L, 2L, -1L, true, false, 20.0)))
  }

  test("SCD2 history plans a single exchange (shared window partitioning)") {
    val feed = Seq(("T", 1L, 1L, "UPSERT", 10.0))
      .toDF("table_name", "k", "offset", "op", "amount")
    val hist = CdcOps.scd2History(feed, "table_name", Seq("k"), "offset", "op")
    val plan = hist.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("snapshot diff emits I/U/D, drops identical rows, keeps nulled updates") {
    import graft.operators.SnapshotDiff
    val oldSnap = Seq(
      (1L, Some("a"), Some(1.0)),  // unchanged → no event
      (2L, Some("b"), Some(2.0)),  // price changes → U
      (3L, Some("c"), Some(3.0)),  // deleted → D with OLD values
      (4L, Some("d"), Some(4.0)),  // value nulled in new → U with NULL
      (6L, None, None)             // null → value → U
    ).toDF("k", "status", "price")
    val newSnap = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (4L, Some("d"), None),
      (5L, Some("e"), Some(5.0)),  // inserted → I
      (6L, Some("f"), Some(6.0))
    ).toDF("k", "status", "price")
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("status", "price"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      (2L, "U", Some("b"), Some(2.5)),
      (3L, "D", Some("c"), Some(3.0)),
      (4L, "U", Some("d"), None),     // NULL survives — not masked by old
      (5L, "I", Some("e"), Some(5.0)),
      (6L, "U", Some("f"), Some(6.0))))
  }

  test("snapshot diff property: old + diff = new on 30 random snapshot pairs") {
    import graft.operators.SnapshotDiff
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 30) {
      // random keyed tables with overlapping key ranges, nullable
      // values, and value collisions — every I/U/D/unchanged mix
      def snap(): Seq[(Long, Option[String], Option[Double])] =
        (0L until 40L).filter(_ => rnd.nextBoolean()).map { k =>
          (k,
            if (rnd.nextInt(5) == 0) None else Some(s"v${rnd.nextInt(3)}"),
            if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(3).toDouble))
        }
      val oldRows = snap()
      val newRows = snap()
      val oldDf = oldRows.toDF("k", "status", "price")
      val newDf = newRows.toDF("k", "status", "price")
      val d = SnapshotDiff.diff(oldDf, newDf, Seq("k"), Seq("status", "price"))
      val changes = d.withColumn("op",
        when(col("op") === "D", "DELETE").otherwise("UPSERT"))
      val applied = CdcOps.applyChanges(oldDf, changes, Seq("k"))
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSet
      assert(applied == newRows.toSet, s"trial $trial: diff+apply != new")
      // and the diff of identical snapshots is empty
      assert(SnapshotDiff.diff(newDf, newDf, Seq("k"),
        Seq("status", "price")).count() == 0, s"trial $trial: self-diff")
    }
  }

  test("snapshot diff round-trips through applyChanges: old + diff = new") {
    import graft.operators.SnapshotDiff
    val oldSnap = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "status", "price")
    val newSnap = Seq((1L, "a", 1.0), (2L, "B", 2.0), (4L, "d", 4.0))
      .toDF("k", "status", "price")
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("status", "price"))
    val changes = d.withColumn("op",
      when(col("op") === "D", "DELETE").otherwise("UPSERT"))
    val applied = CdcOps.applyChanges(oldSnap, changes, Seq("k"))
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(applied == Seq((1L, "a", 1.0), (2L, "B", 2.0), (4L, "d", 4.0)))
  }
}
