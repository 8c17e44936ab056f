package graft.functions

import java.nio.charset.Charset

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Legacy-charset recovery (SURVEY.md §2.4 T4; reference algorithm:
 * LegacyCharsetTransform.java:220-250 and its README "How It Works").
 *
 * Oracle's JDBC driver, reading Big5/GBK bytes stored in a US7ASCII
 * database, mangles every byte ≥ 0x80 into the Unicode halfwidth page:
 * byte b → U+FF00+b. Recovery inverts that per char:
 *
 *   - codepoint in [0xFF00, 0xFFFF] → single byte (cp - 0xFF00)
 *   - codepoint  < 0x80             → ASCII byte as-is
 *   - anything else                 → low byte (cp & 0xFF)
 *
 * then decodes the byte string with the original charset (Big5, GBK, …).
 *
 * Implemented as a native Catalyst `UnaryExpression` with codegen (a
 * static call, so it stays inside whole-stage codegen) rather than a
 * Scala UDF: no Row boxing, null handling for free, and the expression
 * participates in constant folding / predicate pushdown around it.
 */
object LegacyCharsets {

  /** Fast scan: anything to recover? Pure-ASCII strings short-circuit. */
  private def needsRecovery(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return true
      i += 1
    }
    false
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def recover(input: UTF8String, charsetName: String): UTF8String = {
    val s = input.toString
    if (!needsRecovery(s)) return input
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.charAt(i).toInt
      bytes(i) =
        if (cp >= 0xFF00 && cp <= 0xFFFF) (cp - 0xFF00).toByte
        else if (cp < 0x80) cp.toByte
        else (cp & 0xFF).toByte
      i += 1
    }
    UTF8String.fromString(new String(bytes, Charset.forName(charsetName)))
  }
}

/**
 * `legacy_charset_decode(col)` — recover `col` assuming `charsetName`
 * (a config constant, e.g. "Big5", "GBK").
 */
case class LegacyCharsetDecode(child: Expression, charsetName: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "legacy_charset_decode"

  // Validate the charset once at plan time, not per row.
  Charset.forName(charsetName)

  override def nullSafeEval(input: Any): Any =
    LegacyCharsets.recover(input.asInstanceOf[UTF8String], charsetName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = charsetName.replace("\\", "\\\\").replace("\"", "\\\"")
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.LegacyCharsets.recover($c, "$cs")""")
  }

  override protected def withNewChildInternal(newChild: Expression): LegacyCharsetDecode =
    copy(child = newChild)
}
