package graft.text

/**
 * DuckDB SQL mirrors of [[TextAnalysis]], generated from the same
 * constants so the two sides cannot drift. Each helper takes a SQL
 * expression string and returns a SQL expression string.
 *
 * Portability rules (Spark ↔ DuckDB bit-identical):
 *  - folds: Spark `aggregate(xs, 0, f)` ≡ DuckDB
 *    `list_reduce(list_concat([0], xs), f)` (same left-fold order);
 *  - all hash arithmetic stays in exact int64 (mod [[TextAnalysis.HashPrime]]);
 *  - regexes avoid lookarounds (RE2) and `\p{...}` (POSIX classes
 *    instead); DuckDB regexp_replace needs the explicit 'g' flag;
 *  - char access via 1-based subscript, not split-on-empty.
 */
object TextSql {

  import TextAnalysis.{HashPrime, LangMarkers, Stopwords}

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  def tokens(text: String): String =
    s"list_filter(regexp_split_to_array(lower($text), '\\s+'), t -> t <> '')"

  def bpeTokens(text: String): String =
    s"regexp_extract_all(lower($text), '[a-z0-9]+|[^a-z0-9\\s]')"

  /** The CJK codepoint class of [[TextAnalysis.tokensCjk]]'s bigram
    * fallback — Hiragana+Katakana, CJK Ext-A, CJK Unified, Hangul
    * syllables; MUST stay in sync with TextNative.isCjkCp (the Spark
    * side segments on the same bounds natively). */
  val CjkClassSql: String =
    "\\x{3040}-\\x{30ff}\\x{3400}-\\x{4dbf}\\x{4e00}-\\x{9fff}\\x{ac00}-\\x{d7af}"

  /** RE2 mirror of [[TextAnalysis.tokensCjk]]: segment into CJK runs
    * vs non-CJK non-space runs, then expand each CJK run of length n
    * into its n−1 adjacent character bigrams (lone char → itself).
    * `substring` and `length` are codepoint-based in both engines for
    * these BMP ranges, so the bigram boundaries agree exactly. */
  def tokensCjk(text: String): String = {
    val c = CjkClassSql
    val segs = s"regexp_extract_all(lower($text), '[$c]+|[^$c\\s]+')"
    s"flatten(list_transform($segs, __ct -> " +
      s"CASE WHEN regexp_matches(__ct[1], '[$c]') THEN " +
      s"(CASE WHEN length(__ct) = 1 THEN [__ct] " +
      s"ELSE list_transform(range(1, length(__ct)), " +
      s"__ci -> substring(__ct, CAST(__ci AS INT), 2)) END) " +
      s"ELSE [__ct] END))"
  }

  def tokenCount(text: String): String = s"len(${tokens(text)})"

  def punctRatio(text: String): String =
    s"round(CAST(length($text) - length(regexp_replace($text, '[[:punct:]]', '', 'g')) AS DOUBLE)" +
      s" / greatest(length($text), 1), 6)"

  def stopwordRatio(text: String): String = {
    val toks = tokens(text)
    s"round(CAST(len(list_filter($toks, t -> t IN ${inList(Stopwords)})) AS DOUBLE)" +
      s" / greatest(len($toks), 1), 6)"
  }

  def meanTokenLen(text: String): String = {
    val toks = tokens(text)
    s"round(CAST(list_reduce(list_concat([CAST(0 AS BIGINT)], " +
      s"list_transform($toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)" +
      s" / greatest(len($toks), 1), 6)"
  }

  def qualityScore(text: String): String =
    s"round((CASE WHEN length($text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END)" +
      s" + (CASE WHEN ${stopwordRatio(text)} BETWEEN 0.05 AND 0.5 THEN 0.3 ELSE 0.0 END)" +
      s" + (CASE WHEN ${punctRatio(text)} <= 0.2 THEN 0.3 ELSE 0.0 END), 6)"

  def cjkCount(text: String): String =
    s"(length($text) - length(regexp_replace($text, '[\\x{4e00}-\\x{9fff}]', '', 'g')))"

  def langId(text: String): String = {
    val toks = tokens(text)
    val scores = LangMarkers.map {
      case ("zh", _) => "zh" -> cjkCount(text)
      case (lang, marks) =>
        lang -> s"len(list_filter($toks, t -> t IN ${inList(marks)}))"
    }
    val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    val whens = scores.map { case (lang, s) =>
      s"WHEN ($s) = ($best) AND ($best) > 0 THEN '$lang'"
    }.mkString(" ")
    s"(CASE $whens ELSE 'und' END)"
  }

  /** Duplicate-token fraction over a token-list SQL expression —
    * mirror of TextAnalysis.dupTokenFrac over the native counts. */
  def dupTokenFrac(toksSql: String): String =
    s"round(CAST(len($toksSql) - len(list_distinct($toksSql)) AS DOUBLE)" +
      s" / greatest(len($toksSql), 1), 6)"

  /** n-gram list (space-joined runs of n consecutive tokens) over a
    * token-list expression — mirror of TextNative.repetitionCounts'
    * gram construction. DuckDB range(a, b) is exclusive of b and empty
    * when a >= b, so short docs yield an empty gram list. */
  def nGrams(toksSql: String, n: Int): String = {
    val joined = (0 until n).map(o =>
      if (o == 0) s"($toksSql)[CAST(i AS INT)]"
      else s"($toksSql)[CAST(i + $o AS INT)]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($toksSql) - ${n - 2}), i -> $joined)"
  }
  def charPolyHash(s: String): String =
    s"(CASE WHEN length($s) > 0 THEN list_reduce(" +
      s"list_concat([CAST(0 AS BIGINT)], " +
      s"list_transform(range(1, length($s) + 1), i -> CAST(unicode(($s)[CAST(i AS INT)]) AS BIGINT))), " +
      s"(acc, c) -> (acc * 31 + c) % $HashPrime) ELSE 0 END)"

  def tokenHashes(toksSql: String): String =
    s"list_transform($toksSql, __t -> ${charPolyHash("__t")})"
}
