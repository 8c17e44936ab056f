package graft

import org.apache.spark.sql.Row
import org.apache.spark.util.SizeEstimator
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcApply

/**
 * The W17 retry-replay buffer's two load-bearing contracts, pinned:
 *
 *  1. `approxRowBytes` is a real HEAP bound, not a payload-only
 *     undercount. The documented factor vs `SizeEstimator.estimate`
 *     (Spark's own reflective walker, the ground truth executors are
 *     sized by) on wide-row shapes: real heap never exceeds 2× the
 *     estimate, and the estimate never exceeds 4× real heap — so a
 *     `retryBufferBytes` budget of B holds at most 2B of real heap
 *     per task slot, and stands down no earlier than B/4 of real
 *     payload.
 *
 *  2. `bufferHead`'s boundary behavior: at most `maxRows` rows ever
 *     buffer; a partition exactly AT the row bound keeps its retry
 *     (`it.hasNext` is the overflow signal, and memory already paid);
 *     the byte bound is checked BEFORE each admit so the buffer stops
 *     within one row's width past `maxBytes`, never more.
 */
class JdbcRetryBufferSpec extends AnyFunSuite {

  private val shapes: Seq[(String, Row)] = Seq(
    "latin1-10k-string" -> Row("x" * 10000, 7L, "NEW"),
    "utf16-10k-string" -> Row("中文" * 5000, 7L),
    "binary-64k" -> Row(Array.fill[Byte](65536)(1), "key-1"),
    "decimal-heavy" -> Row(
      new java.math.BigDecimal("123456789.123456789"),
      new java.math.BigDecimal("-98765432109876543210.5"), 5L),
    "float-embedding-1024" -> Row(Array.tabulate(1024)(_.toFloat), 3L),
    "long-array-4k" -> Row(Array.tabulate(4096)(_.toLong), "id"),
    "string-seq-500" -> Row(Seq.tabulate(500)(i => s"source-${i + 1000}"), 1L),
    "dlq-header-shape" -> Row("topic-a", 3, 12345L,
      Array.tabulate(8)(i => Row(s"header-key-$i",
        Array.fill[Byte](512)(i.toByte))): Any),
    "nested-nulls-interval" -> Row(null, Row("inner" * 200, 1L),
      java.time.Duration.ofHours(5), java.time.Period.of(1, 2, 0), null),
    "many-small-fields" -> Row((1 to 40).map(i => (i + 1000).toLong): _*))

  test("approxRowBytes bounds real heap within the documented factor (wide rows)") {
    shapes.foreach { case (name, row) =>
      val actual = SizeEstimator.estimate(row)
      val approx = JdbcApply.approxRowBytes(row)
      info(f"$name%-24s actual=$actual%7d approx=$approx%7d " +
        f"ratio=${approx.toDouble / actual}%.2f")
      assert(actual <= approx * 2,
        s"$name: real heap $actual exceeds 2x the estimate $approx — " +
          "retryBufferBytes would no longer bound the heap")
      assert(approx <= actual * 4,
        s"$name: estimate $approx exceeds 4x real heap $actual — " +
          "retry would stand down far too early")
    }
  }

  test("bufferHead: row-bound boundary — exact fit keeps retry, +1 overflows") {
    def rows(n: Int): Iterator[Row] = Iterator.tabulate(n)(i => Row(i.toLong))
    // exactly at the bound: all buffered, nothing left => retry stays on
    val itFit = rows(5)
    val fit = JdbcApply.bufferHead(itFit, maxRows = 5, maxBytes = Long.MaxValue)
    assert(fit.length == 5 && !itFit.hasNext,
      "a partition exactly at maxRows must fit entirely (retry kept)")
    // one past the bound: the buffer NEVER exceeds maxRows, and the
    // remainder stays on the source iterator (the overflow signal)
    val itOver = rows(6)
    val over = JdbcApply.bufferHead(itOver, maxRows = 5, maxBytes = Long.MaxValue)
    assert(over.length == 5, s"buffer must hold at most maxRows, got ${over.length}")
    assert(itOver.hasNext, "the un-buffered tail is the overflow signal")
    assert(itOver.next() == Row(5L), "the tail must start at the first un-buffered row")
    // degenerate bound: maxRows=0 buffers nothing and always overflows
    val itZero = rows(1)
    assert(JdbcApply.bufferHead(itZero, 0, Long.MaxValue).isEmpty && itZero.hasNext)
  }

  test("bufferHead: byte bound stops within one row's width past maxBytes") {
    val row = Row("y" * 1000) // approx = 32 + 8 + 48 + 2000
    val perRow = JdbcApply.approxRowBytes(row)
    // budget of exactly 3 rows: rows admit while bytes < budget, so
    // the 3rd admit lands bytes == budget and the 4th never buffers
    val it3 = Iterator.continually(row).take(10)
    val got3 = JdbcApply.bufferHead(it3, Int.MaxValue, 3 * perRow)
    assert(got3.length == 3, s"3-row byte budget must buffer 3, got ${got3.length}")
    // budget of 2.5 rows: the 3rd row is admitted while bytes (2 rows)
    // is still under budget and overshoots by at most its own width
    val it25 = Iterator.continually(row).take(10)
    val got25 = JdbcApply.bufferHead(it25, Int.MaxValue, 2 * perRow + perRow / 2)
    assert(got25.length == 3,
      s"the final admit may overshoot by one row's width, got ${got25.length}")
    assert(got25.length * perRow <= (2 * perRow + perRow / 2) + perRow,
      "total estimated bytes stay within maxBytes + one row")
    // a single row wider than the whole budget still buffers (a
    // nonempty partition always gets one admit) and signals overflow
    val itWide = Iterator.continually(row).take(2)
    val gotWide = JdbcApply.bufferHead(itWide, Int.MaxValue, 1L)
    assert(gotWide.length == 1 && itWide.hasNext,
      "byte bound is checked before each admit, never before the first")
  }
}
