package graft

import org.apache.spark.sql.functions._

import graft.functions.Timestamps

/** Seeded adversarial sweep of the temporal operators (T1/T2) against
  * a pure-java.time restatement of the engine's documented contract
  * (`Timestamps.iidrTimestampToIsoZoned` scaladoc): wall time as
  * written, offset = the zone's offset for that wall per
  * `LocalDateTime.atZone` — pre-transition offset inside a DST
  * overlap; inside a DST gap the same INSTANT java.time resolves to,
  * expressed with the wall kept as written. The existing unit test
  * pins four curated instants; this sweep samples wall times around
  * every ACTUAL TZDB transition in range (gaps, overlaps, 30-minute
  * DST shifts, half- and quarter-hour base offsets), where a
  * hand-rolled offset computation goes wrong silently. Reference
  * semantics: TimestampConverter.java:32-120 under /root/reference. */
class TimestampPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Zones = Seq(
    "UTC",
    "America/New_York",      // -05:00 / -04:00, canonical DST
    "Europe/London",         // +00:00 / +01:00, transition at midnight UTC
    "America/Santiago",      // southern hemisphere: DST over new year
    "Australia/Lord_Howe",   // +10:30 / +11:00 — THIRTY-minute DST shift
    "Asia/Kathmandu",        // +05:45 quarter-hour base, no DST
    "Asia/Kolkata",          // +05:30 half-hour base, no DST
    "Pacific/Chatham",       // +12:45 / +13:45 quarter-hour WITH DST
    "America/St_Johns",      // -03:30 / -02:30 half-hour with DST
    "Asia/Taipei")           // +08:00 fixed (the reference's own zone)

  private val Fmt6 =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** The contract's expected ISO string for a 6-digit-fraction wall
    * string in `zone` — wall verbatim, offset from the atZone instant
    * (uniform across normal/overlap/gap wall times, see class doc). */
  private def expected(wall6: String, zn: String): String = {
    import java.time.{LocalDateTime, ZoneId, ZoneOffset}
    val wall = LocalDateTime.parse(wall6, Fmt6)
    val wallAsUtc = wall.toEpochSecond(ZoneOffset.UTC)
    val instant = wall.atZone(ZoneId.of(zn)).toEpochSecond
    val offSec = wallAsUtc - instant
    val mins = math.abs(offSec) / 60
    f"${wall6.substring(0, 10)}T${wall6.substring(11)}" +
      f"${if (offSec < 0) "-" else "+"}${mins / 60}%02d:${mins % 60}%02d"
  }

  test("zoned ISO conversion matches the java.time contract around every real TZDB transition") {
    val rnd = new scala.util.Random(20260816L)
    val lo = java.time.LocalDateTime.of(1975, 1, 1, 0, 0)
    val hi = java.time.LocalDateTime.of(2035, 1, 1, 0, 0)
    Zones.foreach { zn =>
      val rules = java.time.ZoneId.of(zn).getRules
      // every transition instant in range, as WALL times around both
      // the pre- and post-transition local clocks (lands inside the
      // gap/overlap windows and at their exact edges)
      val transitionWalls = Iterator
        .iterate(rules.nextTransition(
          lo.toInstant(java.time.ZoneOffset.UTC)))(t =>
          if (t == null) null
          else rules.nextTransition(t.getInstant.plusSeconds(1)))
        .takeWhile(t => t != null &&
          t.getInstant.isBefore(hi.toInstant(java.time.ZoneOffset.UTC)))
        .flatMap { t =>
          Seq(t.getDateTimeBefore, t.getDateTimeAfter).flatMap { w =>
            Seq(-3601L, -1800L, -1L, 0L, 1L, 1799L, 3599L).map(
              w.plusSeconds(_))
          }
        }.toSeq
      // plus uniform random walls (the non-adversarial bulk)
      val randomWalls = Seq.fill(60)(
        lo.plusSeconds(rnd.nextLong(
          java.time.Duration.between(lo, hi).getSeconds)))
      val walls = (transitionWalls ++ randomWalls).map { w =>
        // random fraction, 0-12 digits as the wire writes them
        val digits = rnd.nextInt(13)
        val frac =
          if (digits == 0) ""
          else "." + Seq.fill(digits)(rnd.nextInt(10)).mkString
        w.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss")) + frac
      }
      val want = walls.map { s =>
        val frac6 = s.drop(20).padTo(6, '0').take(6).mkString
        expected(s"${s.take(19)}.$frac6", zn)
      }
      val got = walls.toDF("s")
        .select(Timestamps.iidrTimestampToIsoZoned(col("s"), zn).as("iso"))
        .collect().map(_.getString(0)).toSeq
      val bad = walls.lazyZip(got).lazyZip(want).collect {
        case (w, g, e) if g != e => s"$w -> $g (want $e)"
      }
      assert(bad.isEmpty,
        s"zone=$zn, ${bad.size}/${walls.size} mismatches: ${bad.take(5)}")
      // the adversarial half must actually fire where TZDB has
      // transitions in range (a DST zone with zero sampled transitions
      // means the walk above silently broke)
      val dstZones = Set("America/New_York", "Europe/London",
        "America/Santiago", "Australia/Lord_Howe", "Pacific/Chatham",
        "America/St_Johns")
      assert(!dstZones.contains(zn) || transitionWalls.size > 500,
        s"degenerate transition walk for $zn: ${transitionWalls.size}")
    }
  }

  test("multi-pattern coercion: every supported pattern round-trips; near-miss shapes stay null") {
    val rnd = new scala.util.Random(42L)
    val lo = java.time.LocalDateTime.of(1975, 1, 1, 0, 0)
    val span = 60L * 365 * 24 * 3600
    val instants = Seq.fill(200)(lo.plusSeconds(rnd.nextLong(span))
      .withNano(rnd.nextInt(1000) * 1000000))
    val cases = instants.map { t =>
      val p = Timestamps.TimestampPatterns(
        rnd.nextInt(Timestamps.TimestampPatterns.length))
      val s = t.format(java.time.format.DateTimeFormatter.ofPattern(p))
      // truth re-parsed from the formatted string (patterns without a
      // fraction drop the nanos on the floor, by design); compared as
      // a WALL string rendered in the UTC session zone, so the check
      // never depends on the test JVM's default timezone
      val truth = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      (s, truth.format(Fmt6))
    }
    val got = cases.map(_._1).toDF("s")
      .select(date_format(
        Timestamps.coerceTimestamp(col("s")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2),
      s"first mismatch: ${cases.lazyZip(got).collectFirst {
        case ((s, w), g) if g != w => s"$s -> $g (want $w)" }}")
    // near-misses the reference's pattern loop also rejects: bare
    // dates (coerceDate's job), slashed dates, epoch numbers
    val nulls = Seq("2025-01-15", "2025/01/15 10:00:00", "1736935200",
      "15-01-2025 10:00:00", "garbage", " ").toDF("s")
      .select(Timestamps.coerceTimestamp(col("s")).as("ts"))
      .collect().map(r => r.isNullAt(0))
    assert(nulls.forall(identity), "near-miss shapes must coerce to null")
  }
}
