package graft

import scala.util.Random

import org.apache.spark.sql.functions.col

import graft.operators.TypeOverrides

/**
 * Property-style test for the interval_ym / interval_ds coercions:
 * randomized (seeded, reproducible) component values rendered into
 * every accepted wire form — Oracle literals with optional sign, ISO
 * periods with and without zero tails — must coerce to EXACTLY the
 * expected total months / microseconds, across the full bounded
 * component ranges, plus pinned edge cases at the exact
 * YearMonthIntervalType / DayTimeIntervalType domain boundaries
 * (Int.MinValue..MaxValue months, Long.MinValue..MaxValue micros):
 * the boundary value itself round-trips through JdbcApply.jdbcValue's
 * ANSI-literal serialization, one unit past it coerces to null
 * instead of throwing under ANSI mode.
 */
class IntervalPropertySpec extends SparkSpec {
  import spark.implicits._

  test("interval_ym: 300 random (y, m) in every wire form coerce to exact total months") {
    val rnd = new Random(20260812L)
    val samples = (0 until 300).map { _ =>
      val y = rnd.nextInt(178956970)          // 0..178956969: any month fits Int
      val m = rnd.nextInt(12)                 // literal months 0-11
      val neg = rnd.nextBoolean()
      val sign = if (neg) "-" else ""
      val raw = rnd.nextInt(4) match {
        case 0 => s"$sign$y-$m"
        case 1 => s"${if (neg) "-" else "+"}$y-$m"
        case 2 => s"${sign}P${y}Y${m}M"
        case 3 => s"${sign}P${y}Y${m}M0DT0H0M0S"
      }
      val expected = (if (neg) -1L else 1L) * (y.toLong * 12 + m)
      (raw, expected)
    }
    val got = samples.map(_._1).toDF("s")
      .select(TypeOverrides.coerce(col("s"), "interval_ym").as("iv"))
      .collect().map(_.getAs[java.time.Period](0))
    samples.zip(got).foreach { case ((raw, want), p) =>
      assert(p != null, s"'$raw' failed to parse")
      assert(p.toTotalMonths == want, s"'$raw': got ${p.toTotalMonths}, want $want")
    }
  }

  test("interval_ds: 300 random components in every wire form coerce to exact micros") {
    val rnd = new Random(20260813L)
    val samples = (0 until 300).map { _ =>
      val neg = rnd.nextBoolean()
      val sign = if (neg) "-" else ""
      val (raw, micros): (String, BigInt) = rnd.nextInt(4) match {
        case 0 => // Oracle literal, bounded clock components
          val (d, h, mi, s) = (rnd.nextInt(106751991), rnd.nextInt(24),
            rnd.nextInt(60), rnd.nextInt(60))
          val fracDigits = rnd.nextInt(7) // 0 = no fraction
          val frac = if (fracDigits == 0) "" else
            "." + (0 until fracDigits).map(_ => rnd.nextInt(10)).mkString
          val fracMicros = if (frac.isEmpty) BigInt(0)
            else BigInt(frac.drop(1).padTo(6, '0'))
          (s"$sign$d $h:$mi:$s$frac",
            (BigInt(d) * 86400 + h * 3600L + mi * 60L + s) * 1000000 + fracMicros)
        case 1 => // ISO, all parts (hours/minutes may exceed clock range)
          val (d, h, mi, s) = (rnd.nextInt(1000000), rnd.nextInt(1000000),
            rnd.nextInt(1000000), rnd.nextInt(1000000))
          (s"${sign}P${d}DT${h}H${mi}M${s}S",
            (BigInt(d) * 86400 + BigInt(h) * 3600 + BigInt(mi) * 60 + s) * 1000000)
        case 2 => // ISO, hours only
          val h = rnd.nextInt(1000000)
          (s"${sign}PT${h}H", BigInt(h) * 3600 * 1000000)
        case 3 => // ISO with tolerated zero Y/M prefix + fractional seconds
          val (d, s) = (rnd.nextInt(1000000), rnd.nextInt(60))
          (s"${sign}P0Y0M${d}DT0H0M${s}.5S",
            (BigInt(d) * 86400 + s) * 1000000 + 500000)
      }
      (raw, (if (neg) -micros else micros))
    }
    val got = samples.map(_._1).toDF("s")
      .select(TypeOverrides.coerce(col("s"), "interval_ds").as("iv"))
      .collect().map(_.getAs[java.time.Duration](0))
    samples.zip(got).foreach { case ((raw, want), d) =>
      assert(d != null, s"'$raw' failed to parse")
      val gotMicros = BigInt(d.getSeconds) * 1000000 + d.getNano / 1000
      assert(gotMicros == want, s"'$raw': got $gotMicros, want $want")
    }
  }

  private def coerceYm(raws: Seq[String]): Seq[java.time.Period] =
    raws.toDF("s").select(TypeOverrides.coerce(col("s"), "interval_ym").as("iv"))
      .collect().toIndexedSeq.map(_.getAs[java.time.Period](0))

  private def coerceDs(raws: Seq[String]): Seq[java.time.Duration] =
    raws.toDF("s").select(TypeOverrides.coerce(col("s"), "interval_ds").as("iv"))
      .collect().toIndexedSeq.map(_.getAs[java.time.Duration](0))

  test("interval_ym: jdbcValue round-trips the exact Int-months domain extremes; one month past rejects") {
    // Spark's YearMonthIntervalType domain = Int.MinValue..MaxValue months
    val maxP = java.time.Period.ofMonths(Int.MaxValue).normalized() //  178956970-7
    val minP = java.time.Period.ofMonths(Int.MinValue).normalized() // -178956970-8
    val Seq(maxBack, minBack) = coerceYm(Seq(
      graft.sinks.JdbcApply.jdbcValue(maxP).asInstanceOf[String],
      graft.sinks.JdbcApply.jdbcValue(minP).asInstanceOf[String]))
    assert(maxBack != null && maxBack.toTotalMonths == Int.MaxValue.toLong)
    assert(minBack != null && minBack.toTotalMonths == Int.MinValue.toLong)
    // one month beyond either end: reject to null (no ANSI throw)
    assert(coerceYm(Seq("178956970-8", "-178956970-9", "P178956971Y0M"))
      .forall(_ == null))
  }

  test("interval_ds: jdbcValue round-trips the exact Long-micros domain extremes; one micro past rejects") {
    // Spark's DayTimeIntervalType domain = Long.MinValue..MaxValue micros
    val maxD = java.time.Duration.ofSeconds(Long.MaxValue / 1000000,
      (Long.MaxValue % 1000000) * 1000)          //  106751991d 04:00:54.775807
    val minD = java.time.Duration.ofSeconds(Long.MinValue / 1000000,
      (Long.MinValue % 1000000) * 1000)          // -106751991d 04:00:54.775808
    assert(BigInt(minD.getSeconds) * 1000000 + minD.getNano / 1000 ==
      BigInt(Long.MinValue))
    val Seq(maxBack, minBack) = coerceDs(Seq(
      graft.sinks.JdbcApply.jdbcValue(maxD).asInstanceOf[String],
      graft.sinks.JdbcApply.jdbcValue(minD).asInstanceOf[String]))
    def micros(d: java.time.Duration) = BigInt(d.getSeconds) * 1000000 + d.getNano / 1000
    assert(maxBack != null && micros(maxBack) == BigInt(Long.MaxValue))
    assert(minBack != null && micros(minBack) == BigInt(Long.MinValue))
    // one microsecond beyond either end: reject to null (no ANSI throw)
    assert(coerceDs(Seq("106751991 04:00:54.775808", "-106751991 04:00:54.775809"))
      .forall(_ == null))
  }
}
