package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.LegacyCharsetDecode

/**
 * Session extensions registering graft's native Catalyst functions
 * (public `SparkSessionExtensions.injectFunction` API, SURVEY.md §4).
 *
 * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
 * `--conf spark.sql.extensions=graft.GraftExtensions`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("legacy_charset_decode"),
      new ExpressionInfo(classOf[LegacyCharsetDecode].getName, "legacy_charset_decode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "legacy_charset_decode(col, 'charset') takes exactly 2 arguments")
        val cs = exprs(1) match {
          case Literal(v: UTF8String, _) => v.toString
          case other => throw new IllegalArgumentException(
            s"charset must be a string literal, got $other")
        }
        LegacyCharsetDecode(exprs.head, cs)
      }))
  }
}

object GraftFunctions {
  /**
   * Column-API wrapper for the T4 charset recovery. Builds the Column
   * directly from the Catalyst expression so it works on ANY session —
   * no extension registration required (SQL users can still register
   * `legacy_charset_decode` via [[GraftExtensions]]).
   */
  def legacyCharsetDecode(c: Column, charset: String): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      LegacyCharsetDecode(
        org.apache.spark.sql.graftshim.GraftShims.expression(c), charset))
}
