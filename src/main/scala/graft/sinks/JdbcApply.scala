package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Cdc
import graft.operators.CdcOps

/**
 * Batch CDC → JDBC apply: the Spark rebuild of the reference's
 * JdbcWriter + IidrCdcSinkTask write path (JdbcWriter.java:38-174,
 * IidrCdcSinkTask.java:94-155), designed to be called from
 * `foreachBatch` (streaming) or directly (batch backfill).
 *
 * Scale shape per micro-batch:
 *  1. corrupt branch first, then optional fail (tolerance=none), like
 *     IidrCdcSinkTask.java:236-264;
 *  2. per target table: last-write-wins collapse on the PK (the
 *     order-insensitive equivalent of offset-order apply, SURVEY.md
 *     §2.6) — ONE shuffle on (key);
 *  3. `repartition(pk)` so no two connections ever race on one key;
 *  4. per partition: one JDBC transaction, PreparedStatement reuse,
 *     `addBatch`/`executeBatch` every `batchSize` rows
 *     (JdbcWriter.java:102-108), rollback + rethrow on failure
 *     (IidrCdcSinkTask.java:143-154). Exactly-once EFFECT comes from
 *     idempotent upsert replay, not 2PC (sink README.md:8).
 *
 * DDL (auto-create / auto-evolve, JdbcWriter.java:326-372) runs on the
 * DRIVER before any executor work — the reference is single-task and
 * can DDL inline; we must serialize DDL against parallel writers
 * (SURVEY.md §7.4).
 */
object JdbcApply {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Cap on per-record corrupt WARN lines per batch (tolerance=log): a
    * poison batch must not flood the driver with log I/O. */
  val MaxLoggedCorrupt = 100

  /** What a batch apply skipped: corrupt rows written to the DLQ, how
    * many of them were WARN-logged (>0 only under tolerance=log — the
    * observable difference from `all`, IidrCdcSinkTask.java:236-264),
    * and valid rows whose PK could not be resolved (warn + skip, like
    * JdbcWriter.java:208-221 — never a silent drop). */
  final case class ApplyStats(corruptSkipped: Long, warningsLogged: Long,
      unroutableSkipped: Long = 0L)

  final case class Config(
      url: String,
      /** Value schema per target table (drives typed parse + DDL). */
      tableSchemas: Map[String, StructType],
      /** Key schema per target table (DELETE routing). */
      keySchemas: Map[String, StructType],
      primaryKeys: Map[String, Seq[String]],
      batchSize: Int = 3000,
      autoCreate: Boolean = true,
      autoEvolve: Boolean = true,
      /** none = throw after writing DLQ; log/all = continue (IidrCdcSinkConfig.java:41-44). */
      errorsTolerance: String = "none",
      corruptTable: String = "streaming_corrupt_events",
      /** field → timestamp|date|time forcing for STRING payload fields
        * (IidrToJdbcSinkTransform.java:61-62; parse a config string
        * with [[graft.operators.TypeOverrides.parseConfig]]). */
      fieldTypeOverrides: Map[String, String] = Map.empty,
      /** `field.name.case`: lower | upper | none — COLUMN-name casing
        * at the JDBC edge (DDL + statements), while payload parsing
        * keeps the wire field names (IidrToJdbcSinkTransform
        * .java:57-59,221-229; PostgreSQL folds unquoted identifiers). */
      fieldNameCase: String = "none",
      /** `connection.user` / `connection.password` (IidrCdcSinkConfig
        * .java:22-27); None ⇒ credentials ride the URL. */
      user: Option[String] = None,
      password: Option[String] = None,
      /** `max.retries` / `retry.backoff.ms` (IidrCdcSinkConfig.java:77-83,
        * defaults 10 / 3000). The reference DECLARES both and never reads
        * them (JdbcWriter.java) — here they are WIRED: a partition write
        * or DLQ write that fails with a TRANSIENT error (connection loss,
        * deadlock/serialization rollback — [[isTransient]]) is retried up
        * to `maxRetries` times with `retryBackoffMs` between attempts,
        * each attempt a fresh connection + transaction (the failed one
        * was rolled back, so replay re-binds every row — safe, the whole
        * apply is idempotent upsert/delete/coordinate-keyed DLQ).
        * Non-transient errors rethrow immediately; the DLQ/tolerance
        * semantics are untouched (tolerance decides what happens AFTER
        * retries are exhausted, exactly as it decides a first failure).
        * 0 disables retry (and the row buffering that replay needs). */
      maxRetries: Int = 10,
      retryBackoffMs: Long = 3000,
      /** Per-partition retry-replay buffer bounds (rows / estimated
        * heap bytes, [[approxRowBytes]]). SIZE THESE PER TASK SLOT:
        * every concurrently-running write task holds its own buffer,
        * so worst-case executor heap ≈ cores × retryBufferBytes (an
        * 8-core executor at the 64 MB default ≈ 512 MB). A partition
        * that exceeds either bound streams without retry (WARN;
        * restart-level replay only), so shrinking these trades retry
        * coverage for heap, never correctness. */
      retryBufferRows: Int = RetryBufferRows,
      retryBufferBytes: Long = RetryBufferBytes)

  /** Apply one normalized micro-batch (CdcNormalize output shape).
    * Returns the batch's skip statistics (corrupt rows never silently
    * vanish: they are DLQ'd, counted, and — under tolerance=log —
    * WARN-logged like the reference task). */
  def applyBatch(normalized: DataFrame, cfg: Config): ApplyStats = {
    require(Set("none", "log", "all").contains(cfg.errorsTolerance),
      s"errors.tolerance must be none|log|all, got '${cfg.errorsTolerance}'")
    require(Set("none", "lower", "upper").contains(cfg.fieldNameCase),
      s"field.name.case must be none|lower|upper, got '${cfg.fieldNameCase}'")
    // field.type.overrides failures are DATA errors: mark them as
    // corrupt BEFORE the split, so they ride the same DLQ + tolerance
    // path as malformed envelopes (the reference throws DataException
    // from the SMT for exactly these, IidrToJdbcSinkTransform.java:292).
    // Marking is scoped exactly like the coercion in applyTable: only
    // rows routed to a table whose PINNED schema declares the field as
    // STRING — a same-named numeric field on another table must parse
    // under ITS type, not the override (the reference SMT coerces only
    // string values). Inferred-schema tables are never marked: their
    // string fields coerce best-effort without the corrupt route.
    val marked =
      if (cfg.fieldTypeOverrides.isEmpty) normalized
      else {
        val reasons = for {
          (table, schema) <- cfg.tableSchemas.toSeq.sortBy(_._1)
          (f, t) <- cfg.fieldTypeOverrides.toSeq.sortBy(_._1)
          if schema.fields.exists(sf => sf.name == f && sf.dataType == StringType)
        } yield when(col(Cdc.Cols.TargetTable) === table,
          graft.operators.TypeOverrides.failureReason(
            get_json_object(col(Cdc.Cols.ValueJson), s"$$.$f"), t))
        if (reasons.isEmpty) normalized
        else normalized.withColumn(Cdc.Cols.CorruptReason,
          coalesce(col(Cdc.Cols.CorruptReason) +: reasons: _*))
      }
    val batch = marked.persist()
    try {
      val corrupt = CdcOps.toCorruptEvents(batch,
        col("topic"), col("partition"), col("offset"),
        col(Cdc.Cols.KeyJson), col(Cdc.Cols.ValueJson),
        to_json(struct(col(Cdc.Cols.TableName), col(Cdc.Cols.EntryType),
          col(Cdc.Cols.SourceTs))),
        col(Cdc.Cols.CorruptReason), col(Cdc.Cols.TableName), col(Cdc.Cols.EntryType))
      val nCorrupt = writeCorrupt(corrupt, cfg)
      val warned: Long =
        if (nCorrupt == 0) 0L
        else cfg.errorsTolerance match {
          case "none" =>
            throw new IllegalStateException(
              s"$nCorrupt corrupt record(s) in batch and errors.tolerance=none")
          case "log" =>
            // Per-record WARN + skip (IidrCdcSinkTask.java:254-259),
            // capped at MaxLoggedCorrupt with a rollup line so the
            // count is always visible.
            val sample = corrupt
              .select(col("error_reason"), col("topic"),
                col("kafka_partition"), col("kafka_offset"))
              .limit(MaxLoggedCorrupt).collect()
            sample.foreach(r => log.warn(
              s"Corrupt record skipped: ${r.get(0)} (topic=${r.get(1)}, " +
                s"partition=${r.get(2)}, offset=${r.get(3)})"))
            if (nCorrupt > sample.length)
              log.warn(s"... and ${nCorrupt - sample.length} more corrupt " +
                "record(s) skipped (see DLQ table)")
            sample.length.toLong
          case _ => 0L // "all": silently skip
        }

      // A table with a PK but no pinned schema is still applied — its
      // value schema is INFERRED from the batch's own payloads (C1
      // fallback, IidrToJdbcSinkTransform.java:299-320).
      val configured = cfg.tableSchemas.keySet ++ cfg.primaryKeys.keySet
      // One cheap distinct over the PERSISTED batch: tables with no
      // rows this batch skip their per-table DDL round trip and Spark
      // job entirely, and rows routed to an UNCONFIGURED table are
      // surfaced (a config typo would otherwise advance the checkpoint
      // past the data with no signal).
      //
      // DEFERRED AUTO-CREATE is a consequence operators should expect:
      // a configured table's DDL runs on the first batch that CARRIES
      // rows for it, not when the sink starts — after a data-free (or
      // deletes-only-against-nothing) first batch the table does not
      // exist yet. Intentional: creating from config alone would need a
      // schema before the C1 inference fallback has seen any payload.
      val present = batch
        .filter(col(Cdc.Cols.CorruptReason).isNull &&
          col(Cdc.Cols.TargetTable).isNotNull)
        .select(Cdc.Cols.TargetTable).distinct()
        .collect().map(_.getString(0)).toSet
      val unconfigured = present -- configured
      if (unconfigured.nonEmpty)
        log.warn(s"Batch contains rows for unconfigured table(s) " +
          s"${unconfigured.toSeq.sorted.mkString(", ")} — no schema or " +
          "primary key is configured, so these rows are NOT applied")
      val unroutable = configured.toSeq.sorted
        .filter(present.contains)
        .map(t => applyTable(batch, t, cfg)).sum
      ApplyStats(nCorrupt, warned, unroutable)
    } finally batch.unpersist()
  }

  /** Apply one table's slice of the batch; returns the number of
    * valid rows skipped because no PK value could be resolved. */
  private def applyTable(batch: DataFrame, table: String, cfg: Config): Long = {
    val schema = cfg.tableSchemas.getOrElse(table,
      graft.operators.SchemaInfer.infer(
        batch.sparkSession,
        batch.filter(col(Cdc.Cols.TargetTable) === table &&
          col(Cdc.Cols.CorruptReason).isNull),
        Cdc.Cols.ValueJson))
    // Nothing inferable (no payloads for the table in this batch — e.g.
    // deletes only against a table that was never created): no-op.
    if (schema.isEmpty) return 0L
    // Overrides hit STRING-declared fields only (the reference coerces
    // only string values, IidrToJdbcSinkTransform.java:246-252); the
    // EFFECTIVE schema — with overridden fields re-typed — drives DDL
    // and binding, so an order_date:date override creates a DATE column.
    val overrides = cfg.fieldTypeOverrides.filter { case (f, _) =>
      schema.fields.exists(sf => sf.name == f && sf.dataType == StringType) }
    val effSchema = StructType(schema.fields.map(f =>
      overrides.get(f.name)
        .map(t => f.copy(dataType = graft.operators.TypeOverrides.sparkType(t)))
        .getOrElse(f)))
    val keySchema = cfg.keySchemas.getOrElse(table,
      StructType(Seq.empty[StructField]))
    val pks = cfg.primaryKeys.getOrElse(table, Seq.empty)
    require(pks.nonEmpty, s"no primary key configured for $table")

    val parsed = batch
      .filter(col(Cdc.Cols.TargetTable) === table &&
        col(Cdc.Cols.CorruptReason).isNull)
      .withColumn("__v", from_json(col(Cdc.Cols.ValueJson), schema))
      .withColumn("__k", from_json(col(Cdc.Cols.KeyJson), keySchema))
    val rows = overrides.foldLeft(parsed) { case (df, (f, t)) =>
      df.withColumn("__v", col("__v").withField(f,
        graft.operators.TypeOverrides.coerce(col("__v").getField(f), t)))
    }

    // PK columns: key struct for deletes, value struct otherwise
    // (IidrCdcSinkTask.java:186-195 / JdbcWriter.java:208-221). Either
    // struct may LACK the field (pinned value schema without the PK,
    // or no key schema configured) — referencing a missing struct
    // field would fail analysis, so both sides are schema-guarded.
    def valueField(pk: String) =
      if (schema.fieldNames.contains(pk)) Some(col(s"__v.$pk")) else None
    val keyed = pks.foldLeft(rows) { (df, pk) =>
      val fromKey = keyField(keySchema, pk)
      val fromValue = valueField(pk)
      df.withColumn(s"__pk_$pk",
        when(col(Cdc.Cols.Op) === Cdc.Op.Delete,
          fromKey.orElse(fromValue).getOrElse(lit(null)))
          .otherwise(coalesce(
            (fromValue.toSeq ++ fromKey.toSeq :+ lit(null)): _*)))
    }

    // Valid JSON that lacks the PK fields cannot be routed: warn +
    // skip + count, like the reference's "no PK fields => warn + skip"
    // (JdbcWriter.java:208-221) — never a silent drop. The count scans
    // the PERSISTED batch, so it costs one cached pass.
    val routableCond = pks.map(p => col(s"__pk_$p").isNotNull).reduce(_ && _)
    val nUnroutable = keyed.filter(!routableCond).count()
    if (nUnroutable > 0)
      log.warn(s"$nUnroutable record(s) for table $table skipped: no " +
        s"primary-key value resolvable from key or value payload")
    val routable = keyed.filter(routableCond)

    val lww = CdcOps.lastWriteWins(routable, Cdc.Cols.TargetTable,
      pks.map(p => s"__pk_$p"), "offset")

    val out = lww.select(
      (col(Cdc.Cols.Op).as("__op") +:
        pks.map(p => col(s"__pk_$p")) :+
        col("__v").as("__v")): _*)

    // field.name.case applies at the JDBC EDGE only: parsing above
    // used the wire field names; DDL and statements use the cased
    // names (binding is positional, so only the names change).
    // Locale.ROOT: identifier casing must not vary with the JVM's
    // default locale (Turkish-I would otherwise corrupt "ID").
    val cased: String => String = cfg.fieldNameCase match {
      case "lower" => _.toLowerCase(java.util.Locale.ROOT)
      case "upper" => _.toUpperCase(java.util.Locale.ROOT)
      case _ => identity
    }
    // A PK carried only by the KEY schema (value payloads never repeat
    // it — the compacted-topic shape) still needs a column: append it
    // so DDL declares it and the writer binds it from __pk_* below.
    val ddlSchema = StructType(effSchema.fields ++
      pks.filterNot(effSchema.fieldNames.contains)
        .flatMap(p => keySchema.fields.find(_.name == p)))
    // A configured PK found in NEITHER schema must fail HERE with the
    // config problem named — otherwise ddlSchema silently omits the
    // column while createTableSql still declares PRIMARY KEY over it,
    // surfacing as an opaque dialect-level SQL error at DDL time.
    val missingPks = pks.filterNot(ddlSchema.fieldNames.contains)
    if (missingPks.nonEmpty)
      throw new IllegalArgumentException(
        s"configured primary key(s) ${missingPks.mkString(", ")} for table " +
          s"$table resolve to no column in either the value schema or the " +
          "key schema — fix the pk list or the schemas")
    val jdbcSchema = StructType(ddlSchema.fields.map(f => f.copy(name = cased(f.name))))
    // Two wire fields collapsing to one cased name ("ID" and "id"
    // under lower) would otherwise surface as a confusing dialect
    // error at DDL/INSERT time — fail here, naming the collision.
    if (jdbcSchema.fieldNames.distinct.length != jdbcSchema.fieldNames.length) {
      val dups = jdbcSchema.fieldNames.groupBy(identity)
        .collect { case (n, ns) if ns.length > 1 => n }
      throw new IllegalArgumentException(
        s"field.name.case=${cfg.fieldNameCase} collapses distinct wire fields " +
          s"into duplicate column name(s) ${dups.mkString(", ")} for table $table")
    }
    val jdbcPks = pks.map(cased)

    // DDL on the driver, before executors touch the table.
    withConnection(cfg) { conn =>
      val dialect = Dialects.forConnection(conn)
      ensureTable(conn, dialect, table, jdbcSchema, jdbcPks, cfg)
    }

    val (url, batchSize, user, password) =
      (cfg.url, cfg.batchSize, cfg.user, cfg.password)
    val (maxRetries, retryBackoffMs) = (cfg.maxRetries, cfg.retryBackoffMs)
    val (bufRows, bufBytes) = (cfg.retryBufferRows, cfg.retryBufferBytes)
    val valueCols = jdbcSchema.fieldNames.toSeq
    out.repartition(pks.map(p => col(s"__pk_$p")): _*)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext)
          writePartition(it, url, user, password, table, valueCols, jdbcPks,
            batchSize, maxRetries, retryBackoffMs, bufRows, bufBytes)
      }
    nUnroutable
  }

  private def keyField(keySchema: StructType, name: String) =
    if (keySchema.fieldNames.contains(name)) Some(col(s"__k.$name")) else None

  /** Retry-replay buffer bounds, rows AND (estimated) bytes per
    * partition: a retry must re-bind the partition's rows after the
    * failed attempt's rollback, which means holding them on the
    * executor heap — fine for the micro-batch-sized partitions the
    * streaming apply produces (the target database buffers the same
    * rows as one open transaction), NOT fine for a multi-million-row
    * backfill partition that used to stream from the shuffle with
    * O(batchSize) residency, and a ROW bound alone is no bound at all
    * for wide rows (1M × 5 KB DLQ payloads ≈ 5 GB). The byte budget
    * accumulates per row from a cheap width approximation
    * ([[approxRowBytes]] — string/binary payloads dominate a wide
    * row, and the same values get fully bound to JDBC later, so an
    * O(width) pass per row costs a fraction of work already owed;
    * a one-shot calibration over the first rows would be defeated by
    * a partition whose early rows are unrepresentatively narrow).
    * Past either bound the partition streams exactly as before and
    * W17 retry stands down for it (one WARN says so): the outer
    * Structured Streaming restart remains the retry of record, as it
    * was before retry was wired. Both bounds are per TASK, and tasks
    * run concurrently — see [[Config.retryBufferBytes]] for the
    * per-executor multiplication; these are only the defaults. */
  private[graft] val RetryBufferRows = 1 << 20
  private[graft] val RetryBufferBytes = 64L << 20

  /** Heap-weight approximation of one buffered row, counting what the
    * JVM actually holds: the GenericRow + its backing Object[] (32 B
    * of headers + one 8 B reference per field) and per-field payload
    * INCLUDING object headers — a boxed primitive is a 24 B object,
    * not its primitive width; a String is header + coder/hash fields
    * + a byte[] of up to 2 B/char (UTF-16 worst case; compact latin-1
    * strings cost half, so the estimate leans high there, never low);
    * boxed-element arrays/seqs pay a 24 B box plus the 8 B slot per
    * element. [[JdbcRetryBufferSpec]] pins this against
    * `SizeEstimator.estimate` within a documented factor on wide rows
    * (binary / decimal / long string / array shapes). Cheap enough to
    * run per row; exact enough that retryBufferBytes is a real heap
    * bound, not a payload-only undercount. */
  private[graft] def approxRowBytes(r: Row): Long = {
    var s = 32L; var i = 0
    while (i < r.length) {
      s += 8L + approxValueBytes(r.get(i))
      i += 1
    }
    s
  }

  /** Ref-element arrays/seqs recurse per element (their payload — a
    * DLQ row's header array of string/binary pairs — is exactly what
    * a count-only estimate would miss); the work is O(what the row
    * actually holds) and only paid when such fields exist. */
  private def approxValueBytes(v: Any): Long = v match {
    case null              => 0L
    case x: String         => 48L + 2L * x.length
    case x: Array[Byte]    => 24L + x.length
    case x: Array[Long]    => 24L + 8L * x.length
    case x: Array[Double]  => 24L + 8L * x.length
    case x: Array[Int]     => 24L + 4L * x.length
    case x: Array[Float]   => 24L + 4L * x.length
    case x: Array[_]       =>
      24L + x.foldLeft(0L)((a, e) => a + 8L + approxValueBytes(e))
    case x: scala.collection.Seq[_] =>
      24L + x.foldLeft(0L)((a, e) => a + 16L + approxValueBytes(e))
    case x: java.math.BigDecimal => 96L
    case x: Row            => approxRowBytes(x)
    case _                 => 24L
  }

  /** Drain the head by hand: `Iterator.take`'s contract says to
    * DISCARD the source afterwards (an override may consume or return
    * the receiver), so `take(n).toVector` followed by `++ it` risks
    * silently dropping the tail on exactly the oversized partitions
    * the cap exists for. A manual next() loop leaves `it` positioned
    * at the first un-buffered row by definition — so after this
    * returns, `it.hasNext` IS the overflow signal (a partition that
    * fits entirely, even at exactly the row bound, keeps its retry:
    * the memory is already paid for). The buffer never holds more
    * than `maxRows` rows; the byte bound is checked BEFORE each
    * admit, so the final row may overshoot `maxBytes` by its own
    * width (a row's size is unknowable before reading it) and the
    * buffer's estimated total stays < maxBytes + one row. */
  private[graft] def bufferHead(it: Iterator[Row], maxRows: Int,
      maxBytes: Long): IndexedSeq[Row] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    var bytes = 0L
    while (buf.length < maxRows && bytes < maxBytes && it.hasNext) {
      val r = it.next()
      buf += r
      bytes += approxRowBytes(r)
    }
    buf.toIndexedSeq
  }

  /** W17 retry scaffold shared by the partition and DLQ writers:
    * buffer the head for replay; if the partition overflows either
    * retry-buffer bound, stream it exactly as before retry was wired
    * (one WARN; restart-level replay only); otherwise run the attempt
    * under transient retry. */
  private def retryOrStream(it: Iterator[Row], what: String,
      maxRetries: Int, backoffMs: Long, maxRows: Int,
      maxBytes: Long)(attempt: Iterator[Row] => Unit): Unit =
    if (maxRetries <= 0) attempt(it)
    else {
      val head = bufferHead(it, maxRows, maxBytes)
      if (it.hasNext) {
        log.warn(s"$what exceeds the retry-replay buffer " +
          s"(${head.length} rows buffered); W17 retry stands down for " +
          "this partition (streaming write, restart-level replay only)")
        attempt(head.iterator ++ it)
      } else
        withTransientRetry(what, maxRetries, backoffMs) {
          attempt(head.iterator)
        }
    }

  /** Executor-side partition writer with W17 transient retry. When
    * retries are enabled the partition's rows materialize ONCE (up to
    * [[RetryBufferRows]]/[[RetryBufferBytes]]) so a retry can re-bind
    * them after the failed attempt's rollback; an oversized partition
    * falls back to the streaming no-retry write rather than risk the
    * heap. */
  private def writePartition(it: Iterator[Row], url: String,
      user: Option[String], password: Option[String], table: String,
      valueCols: Seq[String], pks: Seq[String], batchSize: Int,
      maxRetries: Int, retryBackoffMs: Long, bufRows: Int,
      bufBytes: Long): Unit =
    retryOrStream(it, s"partition write to $table", maxRetries,
      retryBackoffMs, bufRows, bufBytes) { rows =>
      writePartitionAttempt(rows, url, user, password, table, valueCols,
        pks, batchSize)
    }

  /** One attempt: one connection, one txn, PS reuse, batched ops. */
  private def writePartitionAttempt(it: Iterator[Row], url: String,
      user: Option[String], password: Option[String], table: String,
      valueCols: Seq[String], pks: Seq[String], batchSize: Int): Unit = {
    val conn = connect(url, user, password)
    val dialect = Dialects.forConnection(conn)
    conn.setAutoCommit(false)
    try {
      val t = dialect.normalizeIdent(table)
      val cols = valueCols
      val delete = conn.prepareStatement(dialect.deleteSql(t, pks))
      var nDel = 0
      val plan = dialect.upsertSql(t, cols, pks)
      val (upsertPs, insertPs) = plan match {
        case NativeUpsert(sql, _) => (conn.prepareStatement(sql), null)
        case UpdateInsert(up, ins, _) =>
          (if (up.nonEmpty) conn.prepareStatement(up) else null,
            conn.prepareStatement(ins))
      }
      var nUp = 0
      // UpdateInsert (generic dialect): buffer up to batchSize rows,
      // batch all UPDATEs, read executeBatch's update counts, then
      // batch-INSERT only the zero-count rows — ~2 round trips per
      // batch instead of up to 2 per ROW (JdbcWriter.java:102-108).
      val pending = scala.collection.mutable.ArrayBuffer
        .empty[(IndexedSeq[Any], IndexedSeq[Any])] // (colVals, pkVals)
      def flushUpdateInsert(bind: (java.sql.PreparedStatement, Seq[Any], Seq[Any]) => Unit,
          hasUpdate: Boolean): Unit = {
        if (pending.isEmpty) return
        val needInsert =
          if (!hasUpdate) pending.toIndexedSeq
          else {
            pending.foreach { case (colVals, pkVals) =>
              val nonPkVals = valueCols.zip(colVals)
                .filterNot { case (c, _) => pks.contains(c) }.map(_._2)
              bind(upsertPs, nonPkVals, pkVals)
              upsertPs.addBatch()
            }
            val counts = upsertPs.executeBatch()
            // SUCCESS_NO_INFO (-2) drivers don't report row counts:
            // re-check those rows individually so new keys are never
            // silently dropped.
            val noInfo = pending.indices
              .filter(counts(_) == java.sql.Statement.SUCCESS_NO_INFO)
            val recheck = noInfo.filter { i =>
              val (colVals, pkVals) = pending(i)
              val nonPkVals = valueCols.zip(colVals)
                .filterNot { case (c, _) => pks.contains(c) }.map(_._2)
              bind(upsertPs, nonPkVals, pkVals)
              upsertPs.executeUpdate() == 0
            }
            (pending.indices.filter(counts(_) == 0) ++ recheck).map(pending(_))
          }
        needInsert.foreach { case (colVals, _) =>
          colVals.zipWithIndex.foreach { case (cv, i) =>
            insertPs.setObject(i + 1, cv)
          }
          if (hasUpdate) insertPs.addBatch()
          else {
            // All-PK tables have no UPDATE statement, so "insert if
            // absent" must tolerate duplicate keys for the idempotent-
            // replay contract (mirrors INSERT IGNORE / DO NOTHING).
            try insertPs.executeUpdate()
            catch { case e: java.sql.SQLException if isDuplicateKey(e) => }
          }
        }
        if (hasUpdate && needInsert.nonEmpty) insertPs.executeBatch()
        pending.clear()
      }
      it.foreach { row =>
        val op = row.getString(0)
        val pkVals = pks.indices.map(i => jdbcValue(row.get(1 + i)))
        if (op == Cdc.Op.Delete) {
          pkVals.zipWithIndex.foreach { case (v, i) => delete.setObject(i + 1, v) }
          delete.addBatch(); nDel += 1
          if (nDel % batchSize == 0) delete.executeBatch()
        } else {
          val v = row.getStruct(1 + pks.length)
          // PK columns bind from the ROUTING values (__pk_*, already
          // key/value-coalesced): a PK riding only the record key
          // would otherwise insert as NULL from the value struct —
          // and key-only PK columns have no value-struct slot at all.
          val colVals = valueCols.indices.map { i =>
            val pkIdx = pks.indexOf(valueCols(i))
            if (pkIdx >= 0) pkVals(pkIdx)
            else if (v == null) null else jdbcValue(v.get(i))
          }
          plan match {
            case NativeUpsert(_, bind) =>
              bind(upsertPs, colVals)
              upsertPs.addBatch(); nUp += 1
              if (nUp % batchSize == 0) upsertPs.executeBatch()
            case UpdateInsert(_, _, bind) =>
              pending += ((colVals, pkVals))
              if (pending.length >= batchSize)
                flushUpdateInsert(bind, upsertPs != null)
          }
        }
      }
      if (nDel % batchSize != 0) delete.executeBatch()
      plan match {
        case _: NativeUpsert =>
          if (nUp % batchSize != 0) upsertPs.executeBatch()
        case UpdateInsert(_, _, bind) =>
          flushUpdateInsert(bind, upsertPs != null)
      }
      conn.commit()
    } catch {
      case e: Throwable => rollbackQuietly(conn); throw e
    } finally closeQuietly(conn)
  }

  /** Failed-attempt cleanup must never REPLACE the original
    * exception: rollback()/close() on a dead connection routinely
    * throw (connection loss is exactly the case retry exists for),
    * and if the replacement isn't 08/40-classified, [[isTransient]]
    * would skip the retry the W17 wiring promises. Log and move on —
    * an un-rolled-back transaction dies with its connection, and the
    * retry's fresh connection re-binds every row anyway. */
  private def rollbackQuietly(conn: Connection): Unit =
    try conn.rollback() catch {
      case e: Exception => log.warn(s"rollback after failed attempt: $e")
    }

  private def closeQuietly(conn: Connection): Unit =
    try conn.close() catch {
      case e: Exception => log.warn(s"close after attempt: $e")
    }

  /** Auto-create / auto-evolve (JdbcWriter.java:326-372). */
  private def ensureTable(conn: Connection, dialect: Dialect, table: String,
      schema: StructType, pks: Seq[String], cfg: Config): Unit = {
    val t = dialect.normalizeIdent(table)
    if (!tableExists(conn, t)) {
      if (!cfg.autoCreate)
        throw new IllegalStateException(s"table $t missing and autoCreate=false")
      exec(conn, dialect.createTableSql(t, schema, pks))
    } else if (cfg.autoEvolve) {
      // Locale.ROOT like every identifier fold in this file — the
      // default-locale toLowerCase would mis-compare "ID" under tr-TR
      // and spuriously ADD a duplicate column.
      val existing = columnsOf(conn, t).map(_.toLowerCase(java.util.Locale.ROOT))
      schema.fields.filterNot(f =>
          existing.contains(f.name.toLowerCase(java.util.Locale.ROOT)))
        .foreach(f => exec(conn, dialect.addColumnSql(t, f)))
    }
  }

  private def writeCorrupt(corrupt: DataFrame, cfg: Config): Long = {
    val n = corrupt.count()
    if (n == 0) return 0
    withConnection(cfg) { conn =>
      val dialect = Dialects.forConnection(conn)
      val t = dialect.normalizeIdent(cfg.corruptTable)
      if (!tableExists(conn, t))
        exec(conn, dialect.createTableSql(t, Cdc.corruptEventSchema, Seq.empty))
    }
    val (url, table, batchSize, user, password) =
      (cfg.url, cfg.corruptTable, cfg.batchSize, cfg.user, cfg.password)
    val (maxRetries, retryBackoffMs) = (cfg.maxRetries, cfg.retryBackoffMs)
    val (bufRows, bufBytes) = (cfg.retryBufferRows, cfg.retryBufferBytes)
    val fields = Cdc.corruptEventSchema.fieldNames.toSeq
    corrupt.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        // W17 retry, same shape as writePartition: materialize once
        // (up to the RetryBufferRows/RetryBufferBytes bounds) for
        // replay, fresh connection + txn per attempt;
        // delete-then-insert by Kafka coordinates makes the replayed
        // attempt idempotent.
        def attemptOnce(rows: Iterator[Row]): Unit = {
        val conn = connect(url, user, password)
        try {
          val dialect = Dialects.forConnection(conn)
          val t = dialect.normalizeIdent(table)
          val sql = s"INSERT INTO ${dialect.quote(t)} " +
            s"(${fields.map(dialect.quote).mkString(", ")}) " +
            s"VALUES (${fields.map(_ => "?").mkString(", ")})"
          // REPLAY-IDEMPOTENT: a corrupt row's Kafka coordinates
          // (topic, partition, offset) identify it globally, so a
          // redelivered foreachBatch (at-least-once) must REPLACE its
          // own DLQ rows, not append duplicates — the one spot where
          // the reference's own at-least-once path duplicates
          // (CorruptEventWriter.java:37-114 blind-inserts). Delete-
          // then-insert by coordinates, chunked so memory stays at
          // batchSize rows, inside one transaction per partition so a
          // crash between the two phases can't lose rows.
          val delSql = s"DELETE FROM ${dialect.quote(t)} WHERE " +
            Seq("topic", "kafka_partition", "kafka_offset")
              .map(c => s"${dialect.quote(c)} = ?").mkString(" AND ")
          conn.setAutoCommit(false)
          try {
            val ins = conn.prepareStatement(sql)
            val del = conn.prepareStatement(delSql)
            rows.grouped(batchSize).foreach { chunk =>
              chunk.foreach { row =>
                (0 until 3).foreach(i => del.setObject(i + 1, jdbcValue(row.get(i))))
                del.addBatch()
              }
              del.executeBatch()
              chunk.foreach { row =>
                fields.indices.foreach(i =>
                  ins.setObject(i + 1, jdbcValue(row.get(i))))
                ins.addBatch()
              }
              ins.executeBatch()
            }
            conn.commit()
          } catch { case e: Throwable => rollbackQuietly(conn); throw e }
        } finally closeQuietly(conn)
        }
        // same retryOrStream scaffold as writePartition: "DLQ
        // partitions are small by construction" does not survive a
        // poisoned feed under errors.tolerance=log, where millions of
        // wide corrupt rows can land in one partition
        retryOrStream(it, s"DLQ write to $table", maxRetries,
          retryBackoffMs, bufRows, bufBytes)(attemptOnce)
      }
    }
    n
  }

  // ------------------------------------------------------------- helpers
  /**
   * JDBC-bindable value for a Spark Row value (W7 typed binding).
   * Interval externals (java.time.Period/Duration) have no portable
   * setObject mapping, so they bind as their ANSI interval literal —
   * `y-m` / `d hh:mm:ss.ffffff`, sign-prefixed — which is both what
   * an INTERVAL-typed target parses and what a VARCHAR fallback
   * (Derby/MySQL) stores losslessly; TypeOverrides.coerce parses the
   * same forms back, closing the round trip for EVERY representable
   * Period/Duration — its 9-digit year/day gates plus exact
   * total-value guards span Spark's full YearMonthIntervalType
   * (±178956970-8) and DayTimeIntervalType (±106751991d 04:00:54.8)
   * domains (IntervalPropertySpec pins the extremes). Everything else
   * (incl. Array[Byte] → BLOB) passes through to setObject.
   */
  private[graft] def jdbcValue(v: Any): Any = v match {
    case p: java.time.Period =>
      val tm = p.toTotalMonths
      val m = math.abs(tm)
      s"${if (tm < 0) "-" else ""}${m / 12}-${m % 12}"
    case d: java.time.Duration =>
      val a = d.abs()
      val micros = a.getNano / 1000
      f"${if (d.isNegative) "-" else ""}${a.toDays} " +
        f"${a.toHoursPart}%02d:${a.toMinutesPart}%02d:${a.toSecondsPart}%02d.$micros%06d"
    case other => other
  }

  /** Duplicate-key detection that survives non-JDBC4 drivers.
    * DUPLICATE-specific only: SQLState 23505 (unique violation —
    * ANSI-distinct, used by Derby/PG/H2), or a duplicate-key VENDOR
    * code (MySQL 1062, Oracle ORA-00001, SQL Server 2601/2627). The
    * generic states 23000/23001 alone do NOT qualify: Oracle and
    * SQL Server report FK (ORA-02291, error 547) and NOT NULL
    * (MySQL 1048) failures under 23000 too, so accepting the bare
    * state would silently drop genuinely corrupt rows on the all-PK
    * insert path — as would the whole class-23 family or the typed
    * subclass (FK 23503, NOT NULL 23502, CHECK 23514). Anything else
    * rethrows. */
  /** TRANSIENT-error classification for W17 retry: the JDBC4 marker
    * types (`SQLTransientException` — incl. deadlock-victim
    * `SQLTransactionRollbackException` and timeouts —
    * `SQLRecoverableException`), or SQLState class 08 (connection
    * exception) or the retryable rollback states 40001 (deadlock /
    * serialization failure) and 40P01 (PostgreSQL's deadlock spelling)
    * for pre-JDBC4 drivers, walked through `getNextException` chains
    * (BatchUpdateException buries the real state there) and causes.
    * NOT the whole class 40: 40002 is a rollback caused by an
    * integrity-constraint violation, which re-fails identically on
    * replay — retrying it would both delay the loud failure the
    * tolerance contract promises and bypass the dedicated
    * [[isDuplicateKey]] handling. Integrity violations (class 23) and
    * syntax/DDL errors are NOT transient for the same reason. */
  private[graft] def isTransient(e: Throwable, depth: Int = 0): Boolean =
    depth < 10 && (e match {
      case s: java.sql.SQLException =>
        s.isInstanceOf[java.sql.SQLTransientException] ||
          s.isInstanceOf[java.sql.SQLRecoverableException] ||
          Option(s.getSQLState).exists(st =>
            st.startsWith("08") || st == "40001" || st == "40P01") ||
          (s.getNextException != null && (s.getNextException ne s) &&
            isTransient(s.getNextException, depth + 1)) ||
          (s.getCause != null && (s.getCause ne s) &&
            isTransient(s.getCause, depth + 1))
      case _ =>
        e.getCause != null && (e.getCause ne e) &&
          isTransient(e.getCause, depth + 1)
    })

  /** Run `body`, retrying up to `maxRetries` times on [[isTransient]]
    * failures with `backoffMs` sleep between attempts (the reference's
    * declared-but-unwired max.retries/retry.backoff.ms semantics,
    * IidrCdcSinkConfig.java:77-83). Every retry is observable: one
    * WARN per attempt, so an operator sees a flapping database before
    * it becomes an exhausted-retries failure. Non-transient errors —
    * and the attempt after the last retry — propagate unchanged, so
    * the caller's tolerance/rollback contract is untouched. */
  private def withTransientRetry[A](what: String, maxRetries: Int,
      backoffMs: Long)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if attempt < maxRetries && isTransient(e) =>
          attempt += 1
          log.warn(s"transient JDBC failure on $what (retry $attempt of " +
            s"$maxRetries, backing off ${backoffMs}ms): ${e.getMessage}")
          if (backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private[graft] def isDuplicateKey(e: java.sql.SQLException): Boolean =
    Option(e.getSQLState).contains("23505") ||
      Set(1062, 1, 2601, 2627)(e.getErrorCode) &&
        Option(e.getSQLState).exists(_.startsWith("23"))

  /** Credentialed connect (serializable inputs only — executors call
    * this with plain strings captured in the task closure). Properties
    * form so a password WITHOUT a user (username riding the URL) is
    * still forwarded instead of silently dropped. */
  private def connect(url: String, user: Option[String],
      password: Option[String]): Connection =
    if (user.isEmpty && password.isEmpty) DriverManager.getConnection(url)
    else {
      val p = new java.util.Properties()
      user.foreach(p.setProperty("user", _))
      password.foreach(p.setProperty("password", _))
      DriverManager.getConnection(url, p)
    }

  /** Driver-side connection scope with the same W17 transient retry
    * as the partition writers: the connect itself is the failure mode
    * a flapping database shows FIRST (SQLState 08xxx before any write
    * runs), and without retry here an epoch dies in `ensureTable`
    * while its partition writes would have retried. Both current
    * bodies are idempotent from scratch (existence-guarded
    * CREATE/ALTER) — a future caller must keep that property, because
    * a transient failure re-runs `f` on a fresh connection. A close()
    * failure AFTER `f` completed never re-runs the body: the work is
    * done, so it logs and returns (the leak is one flapping-database
    * connection, not a duplicated DDL execution). */
  private def withConnection[A](cfg: Config)(f: Connection => A): A =
    withTransientRetry(s"driver connection/DDL to ${cfg.url}",
      cfg.maxRetries, cfg.retryBackoffMs) {
      val conn = connect(cfg.url, cfg.user, cfg.password)
      val out = try f(conn) catch {
        case e: Throwable =>
          try conn.close() catch { case s: Exception =>
            log.warn(s"connection close failed after error: ${s.getMessage}") }
          throw e
      }
      try conn.close() catch { case s: Exception =>
        log.warn(s"connection close failed after success (not retried): " +
          s.getMessage) }
      out
    }

  /** Escape JDBC metadata search-pattern wildcards ('_' and '%') so
    * table names like streaming_corrupt_events match literally. */
  private def escapePattern(conn: Connection, name: String): String = {
    val esc = conn.getMetaData.getSearchStringEscape
    name.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
  }

  private def tableExists(conn: Connection, table: String): Boolean = {
    val rs = conn.getMetaData.getTables(
      null, null, escapePattern(conn, table), Array("TABLE"))
    try rs.next() finally rs.close()
  }

  private def columnsOf(conn: Connection, table: String): Seq[String] = {
    val rs = conn.getMetaData.getColumns(
      null, null, escapePattern(conn, table), null)
    val b = Seq.newBuilder[String]
    try { while (rs.next()) b += rs.getString("COLUMN_NAME") } finally rs.close()
    b.result()
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }
}
