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
}
