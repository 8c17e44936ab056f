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
 * component ranges (incl. the 7-digit year and 6-digit day maxima the
 * overflow gates allow).
 */
class IntervalPropertySpec extends SparkSpec {
  import spark.implicits._

  test("interval_ym: 300 random (y, m) in every wire form coerce to exact total months") {
    val rnd = new Random(20260812L)
    val samples = (0 until 300).map { _ =>
      val y = rnd.nextInt(10000000)           // 0..9999999 (7-digit bound)
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
          val (d, h, mi, s) = (rnd.nextInt(1000000), rnd.nextInt(24),
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
}
