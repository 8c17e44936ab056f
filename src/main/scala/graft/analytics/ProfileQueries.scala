package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.DqGate

/**
 * Ingest-QA operators: the audit a production pipeline runs on a batch
 * BEFORE letting it into the corpus (the quality twin of the drift
 * audits, which compare a batch against standing history).
 *
 *  - [[q_profile_events]]: one-scan per-column profile — row count,
 *    null count, distinct count, numeric min/max — unpivoted to one
 *    row per column. All aggregates partial-merge, so the exchange
 *    carries one partial row per (partition), never data. The exact
 *    distinct counts plan one Expand (×columns) for oracle parity; at
 *    full scale the same query swaps count_distinct for
 *    approx_count_distinct (SketchQueries' calibrated path) and the
 *    Expand disappears.
 *  - [[q_dq_orders]]: declarative constraint gate — each rule becomes
 *    a counting aggregate over ONE scan (null/unique/range/domain
 *    checks), emitting (constraint, violations, pass). The gate's
 *    output is row-per-rule so a scheduler can fail the batch on any
 *    pass=false without parsing logs.
 *
 * Numeric min/max go through epoch micros for timestamps and plain
 * doubles otherwise — both exactly representable and engine-portable
 * (string-typed min/max would hit double/timestamp FORMATTING
 * differences between engines).
 */
object ProfileQueries {

  /** Valid o_orderdate span enforced by the dq gate (the synthetic
    * generator's actual span — seed-42 orders run 1995..2001, not the
    * TPC-H spec's 1992..1998; shared with the oracle). */
  val OrderDateLo = "1995-01-01"
  val OrderDateHi = "2001-12-31"

  /** Valid o_orderstatus domain (shared with the oracle). */
  val OrderStatusDomain: Seq[String] = Seq("F", "O", "P")

  private case class ColProfile(name: String, numeric: Column)

  /** Hash-bucket boundary splitting the standing corpus from the
    * incoming batch in q_profile_incremental (same convention as the
    * dedup incremental family; shared with the oracle). */
  val ProfileSplitBoundary = 80

  /** Numeric columns covered by the mergeable profile
    * (q_profile_incremental; shared with the oracle). */
  val MergeProfileCols: Seq[String] = Seq("event_id", "user_id", "value")

  /** One part's mergeable profile: per column, the exactly-mergeable
    * statistics — row count, null count, min, max, and a
    * DECIMAL(38,6) sum of per-row values rounded to 6 dp (the
    * order-independent summation discipline; a raw double sum would
    * flip the last ulp with partitioning and the merge could no
    * longer promise bit-equality with the from-scratch profile).
    * Unpivoted exactly like q_profile_events: one aggregate row,
    * exploded. */
  private def partProfile(df: DataFrame): DataFrame = {
    val aggs = MergeProfileCols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"),
        sum(round(col(c).cast("double"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .as(s"${c}__sum"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(MergeProfileCols.map { c =>
        struct(
          lit(c).as("col_name"),
          col(s"${c}__n").as("n_rows"),
          col(s"${c}__nulls").as("n_null"),
          col(s"${c}__min").as("min_num"),
          col(s"${c}__max").as("max_num"),
          col(s"${c}__sum").as("sum_dec"))
      }: _*)).as("r"))
      .select("r.*")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Incremental profile maintenance: the standing corpus profile
    // merged with an arriving batch's profile, via the profile
    // algebra (counts add, mins min, maxes max, decimal sums add) —
    // proven equal to the from-scratch profile over corpus ∪ batch,
    // which is exactly what the oracle computes. This is how corpus
    // statistics stay current at 100 TB: history is NEVER rescanned;
    // each batch contributes one profile row per column and the merge
    // is |columns|-sized driver work. n_distinct is deliberately
    // absent — it is the one profile field with no exact merge; the
    // mergeable-sketch path (q_events_sketch_rollup) is its dial.
    "q_profile_incremental" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val corpus = ev.filter(
        pmod(col("event_id"), lit(100)) < ProfileSplitBoundary)
      val batch = ev.filter(
        pmod(col("event_id"), lit(100)) >= ProfileSplitBoundary)
      partProfile(corpus).unionByName(partProfile(batch))
        .groupBy("col_name").agg(
          sum("n_rows").as("n_rows"),
          sum("n_null").as("n_null"),
          min("min_num").as("mn"),
          max("max_num").as("mx"),
          sum("sum_dec").as("sd"))
        .select(col("col_name"), col("n_rows"), col("n_null"),
          round(col("mn"), 6).as("min_num"),
          round(col("mx"), 6).as("max_num"),
          round(col("sd").cast("double"), 6).as("sum_num"),
          round(col("sd").cast("double") / col("n_rows"), 6).as("mean_num"))
        .orderBy("col_name")
    }),

    "q_profile_events" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val profiled = Seq(
        ColProfile("event_id", col("event_id").cast("double")),
        ColProfile("event_type", lit(null).cast("double")),
        ColProfile("props", lit(null).cast("double")),
        ColProfile("ts", unix_micros(col("ts")).cast("double")),
        ColProfile("user_id", col("user_id").cast("double")),
        ColProfile("value", col("value").cast("double")))
      val aggs = profiled.flatMap { p =>
        Seq(
          count(lit(1)).as(s"${p.name}__n"),
          sum(when(col(p.name).isNull, 1L).otherwise(0L)).as(s"${p.name}__nulls"),
          count_distinct(col(p.name)).as(s"${p.name}__distinct"),
          min(p.numeric).as(s"${p.name}__min"),
          max(p.numeric).as(s"${p.name}__max"))
      }
      // Unpivot by exploding a struct array over the ONE aggregate
      // row — a union of per-column selects would re-plan (and
      // re-scan) the aggregation once per referenced column.
      val wide = ev.agg(aggs.head, aggs.tail: _*)
      wide.select(explode(array(profiled.map { p =>
          struct(
            lit(p.name).as("col_name"),
            col(s"${p.name}__n").as("n_rows"),
            col(s"${p.name}__nulls").as("n_null"),
            col(s"${p.name}__distinct").as("n_distinct"),
            round(col(s"${p.name}__min"), 6).as("min_num"),
            round(col(s"${p.name}__max"), 6).as("max_num"))
        }: _*)).as("r"))
        .select("r.*")
        .orderBy("col_name")
    }),

    "q_dq_orders" -> ((s, dir) =>
      DqGate.verdicts(Tables(s, dir, "orders"), OrderRules,
        uniqueKey = Some(("orderkey_unique", "o_orderkey")))),

    // The text-corpus face of the gate: same machinery, rules over
    // document identity, content, derived-column consistency, and the
    // language domain — what an ingest runs on a batch of documents
    // before the drift/dedup probes bother with it.
    "q_dq_documents" -> ((s, dir) =>
      DqGate.verdicts(Tables(s, dir, "documents"), DocumentRules,
        uniqueKey = Some(("doc_id_unique", "doc_id")))))

  /** Language domain the generator emits (shared with the oracle). */
  val LangDomain: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Document constraint set (q_dq_documents; shared with the oracle). */
  def DocumentRules: Seq[DqGate.Rule] = Seq(
    DqGate.Rule("doc_id_not_null", col("doc_id").isNull),
    DqGate.Rule("text_nonempty",
      DqGate.notSatisfied(length(trim(col("text"))) > 0)),
    DqGate.Rule("n_chars_consistent",
      DqGate.notSatisfied(col("n_chars") === length(col("text")))),
    DqGate.Rule("lang_in_domain",
      DqGate.notSatisfied(col("lang").isin(LangDomain: _*))))

  /** The orders constraint set — shared by the batch query and the
    * streaming gate spec so both faces enforce the same contract. */
  def OrderRules: Seq[DqGate.Rule] = Seq(
    DqGate.Rule("orderkey_not_null", col("o_orderkey").isNull),
    DqGate.Rule("totalprice_positive",
      DqGate.notSatisfied(col("o_totalprice") > 0)),
    DqGate.Rule("orderdate_in_span",
      DqGate.notSatisfied(col("o_orderdate").cast("date")
        .between(lit(OrderDateLo), lit(OrderDateHi)))),
    DqGate.Rule("orderstatus_in_domain",
      DqGate.notSatisfied(col("o_orderstatus").isin(OrderStatusDomain: _*))))

  def oracleSql: Map[String, String] = Map(

    // The from-scratch profile over the FULL table — the merge on the
    // Spark side must equal this exactly, or the incremental algebra
    // is broken.
    "q_profile_incremental" -> {
      MergeProfileCols.map { c =>
        val sumDec =
          s"sum(CAST(round(CAST($c AS DOUBLE), 6) AS DECIMAL(38, 6)))"
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null,
          round(min(CAST($c AS DOUBLE)), 6) AS min_num,
          round(max(CAST($c AS DOUBLE)), 6) AS max_num,
          round(CAST($sumDec AS DOUBLE), 6) AS sum_num,
          round(CAST($sumDec AS DOUBLE) / count(*), 6) AS mean_num
        FROM events"""
      }.mkString("", " UNION ALL ", " ORDER BY col_name")
    },

    "q_profile_events" -> {
      val cols = Seq(
        ("event_id", "CAST(event_id AS DOUBLE)"),
        ("event_type", "CAST(NULL AS DOUBLE)"),
        ("props", "CAST(NULL AS DOUBLE)"),
        ("ts", "CAST(epoch_us(ts) AS DOUBLE)"),
        ("user_id", "CAST(user_id AS DOUBLE)"),
        ("value", "value"))
      cols.map { case (name, num) =>
        // ts distinct must count at MICROsecond precision: DuckDB reads
        // the raw TIMESTAMP_NS column while the Spark side truncates
        // nanos to micros at load (Tables), so a raw DISTINCT ts could
        // exceed Spark's if two events share a micro but not the nanos
        val distinctExpr = if (name == "ts") "epoch_us(ts)" else name
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
          CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          count(DISTINCT $distinctExpr) AS n_distinct,
          round(min($num), 6) AS min_num, round(max($num), 6) AS max_num
        FROM events"""
      }.mkString("", " UNION ALL ", " ORDER BY col_name")
    },

    "q_dq_documents" -> {
      val langList = LangDomain.map(v => s"'$v'").mkString(", ")
      s"""WITH g AS (
        SELECT
          CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS v_id_null,
          count(doc_id) - count(DISTINCT doc_id) AS v_id_dup,
          CAST(sum(CASE WHEN length(trim(text)) > 0 THEN 0 ELSE 1 END)
            AS BIGINT) AS v_text_empty,
          CAST(sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END)
            AS BIGINT) AS v_nchars,
          CAST(sum(CASE WHEN lang IN ($langList) THEN 0 ELSE 1 END)
            AS BIGINT) AS v_lang
        FROM documents)
      SELECT * FROM (
        SELECT 'doc_id_not_null' AS "constraint", v_id_null AS violations,
          v_id_null = 0 AS pass FROM g
        UNION ALL SELECT 'doc_id_unique', v_id_dup, v_id_dup = 0 FROM g
        UNION ALL SELECT 'lang_in_domain', v_lang, v_lang = 0 FROM g
        UNION ALL SELECT 'n_chars_consistent', v_nchars, v_nchars = 0 FROM g
        UNION ALL SELECT 'text_nonempty', v_text_empty,
          v_text_empty = 0 FROM g)
      ORDER BY "constraint""""
    },

    "q_dq_orders" -> {
      val domainList = OrderStatusDomain.map(v => s"'$v'").mkString(", ")
      s"""WITH g AS (
        SELECT
          CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS v_key_null,
          count(o_orderkey) - count(DISTINCT o_orderkey) AS v_key_dup,
          CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
            AS v_price_nonpos,
          CAST(sum(CASE WHEN CAST(o_orderdate AS DATE)
              BETWEEN DATE '$OrderDateLo' AND DATE '$OrderDateHi'
            THEN 0 ELSE 1 END) AS BIGINT) AS v_date_range,
          CAST(sum(CASE WHEN o_orderstatus IN ($domainList) THEN 0 ELSE 1 END)
            AS BIGINT) AS v_status_domain
        FROM orders)
      SELECT * FROM (
        SELECT 'orderkey_not_null' AS "constraint", v_key_null AS violations,
          v_key_null = 0 AS pass FROM g
        UNION ALL SELECT 'orderkey_unique', v_key_dup, v_key_dup = 0 FROM g
        UNION ALL SELECT 'totalprice_positive', v_price_nonpos,
          v_price_nonpos = 0 FROM g
        UNION ALL SELECT 'orderdate_in_span', v_date_range,
          v_date_range = 0 FROM g
        UNION ALL SELECT 'orderstatus_in_domain', v_status_domain,
          v_status_domain = 0 FROM g)
      ORDER BY "constraint""""
    })
}
