package graft

/** SQL-surface access to the native functions on a PLAIN session via
  * GraftFunctions.registerAll (the driver's session shape). */
class SqlFunctionsSpec extends SparkSpec {

  test("registerAll exposes every native function to spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT
        legacy_charset_decode('ﾴ￺ﾸￕ', 'Big5') AS decoded,
        vector_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot,
        jaccard_sim(array('a','b','c'), array('b','c','d')) AS jac,
        token_shingles('one two three four', 3) AS sh,
        minhash_sig('one two three four five', 3, 8) AS sig,
        simhash16('one two three four five') AS sh16
    """).head()
    assert(r.getString(0) == "測試")
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 0.5)
    assert(r.getSeq[String](3) == Seq("one two three", "two three four"))
    assert(r.getSeq[String](4).length == 8)
    assert(r.getLong(5) >= 0L && r.getLong(5) < (1L << 16))
  }

  test("SQL functions validate their literal arguments") {
    GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT legacy_charset_decode('x', upper('big5'))").head()
    }
    assert(e.getMessage.contains("string literal"))
  }
}
