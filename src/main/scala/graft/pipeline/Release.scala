package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, Sampling}
import graft.sources.Layout

/**
 * Versioned TRAINING-DATA RELEASE — the at-rest artifact the whole
 * curation stack exists to produce, with the same durable-lifecycle
 * discipline as [[graft.ann.IvfIndex]] and [[graft.dedup.ClusterIndex]]:
 * build per corpus snapshot, open from ANY later session, prune on a
 * retention cadence. A "release" is what a training run actually
 * mounts: the curated, deduplicated, budget-capped document set laid
 * out as shard-partitioned, position-sorted files (the
 * [[Layout.writeSharded]] epoch-0 layout, text included), plus a
 * deterministic manifest recording what went in and why.
 *
 * Pipeline (every stage a previously-pinned operator, composed):
 *
 *   1. [[PipelineQueries.curatedTrainDocs]] — quality rules →
 *      exact-dedup keepers → train split (two shuffles);
 *   2. [[Sampling.tokenBudgetFill]] — at most `budget` tokens per
 *      source, chosen in the seeded deal order (distributed prefix
 *      sum, beyond-budget chunks pruned pre-shuffle);
 *   3. [[Dedup.shuffleDeal]] over the kept ids — reproducible global
 *      mix, shard = key high bits (id-only, no text in the shuffle);
 *   4. [[Layout.writeSharded]] — text joined back by doc_id and
 *      written as `shards/shard=<i>/` files pos-sorted inside, the
 *      zero-runtime-sort epoch layout a 1000-reader job maps 1:1.
 *
 * Directory layout under `root`:
 * {{{
 *   root/v<N>/shards/shard=<i>/  parquet (doc_id, source, n_tokens, pos, text)
 *   root/v<N>/manifest.json      commit marker, written LAST
 * }}}
 *
 * The manifest is the COMMIT MARKER: [[latestVersion]] only counts
 * versions whose manifest exists, so a build that dies mid-write
 * leaves an invisible partial, never a corrupt "latest" — and because
 * every stage is deterministic in (snapshot, seed, budget, shards),
 * rebuilding a version is replay-idempotent: same kept set, same
 * per-source stats, same order-independent content fingerprint
 * (xor-fold of per-row hashes; ReleaseSpec pins rebuild equality).
 * The manifest carries no wall-clock for exactly this reason.
 *
 * [[prune]] applies the keep-N retention discipline
 * (`CdcOps.compactSnapshotRetained`): delete every version strictly
 * older than the newest `keep` committed ones — readers of the
 * retained versions are never invalidated by a build.
 */
object Release {

  val ManifestFile = "manifest.json"

  /** Provenance sidecar ([[buildFromCorpus]] only); never a commit
    * marker — [[latestVersion]] ignores it. */
  val LineageFile = "lineage.json"

  /** Per-source seed for q_pipeline_release and the spec builds. */
  val Seed = 11L

  /** Per-source token budget — sized so sources truncate at the
    * harness SFs after curation (~15 curated docs · ~50 tokens). */
  val Budget = 400L

  /** Shard count for the spec/smoke builds (power of two). */
  val Shards = 8

  /** The release's kept set: curated train docs capped at `budget`
    * tokens per source in deal order — (doc_id, source, n_tokens,
    * cum_tokens). The in-query face; [[build]] materializes it. */
  def candidates(docs: DataFrame, seed: Long, budget: Long): DataFrame =
    // counted face: curatedTrainDocs carries n_tokens from the
    // curation barrier (≡ tokenCount(text) by construction), so the
    // budget fill's two passes read a long column instead of
    // re-tokenizing the curated set per release build
    Sampling.tokenBudgetFillCounted(PipelineQueries.curatedTrainDocs(docs),
      "source", "doc_id", "n_tokens", seed, budget)

  /** Per-source audit of the kept set (q_pipeline_release): how many
    * documents and tokens each source actually contributes under the
    * budget — the number a mixture owner checks before mounting. */
  def summary(docs: DataFrame, seed: Long, budget: Long): DataFrame =
    candidates(docs, seed, budget)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"),
        sum("n_tokens").as("tokens_kept"))

  /** Build version `version` under `root` from a corpus snapshot
    * (full curation pass). Overwrites a partial or prior build of the
    * SAME version (replay-idempotent); normally callers pass
    * `latestVersion(root).getOrElse(0) + 1`. */
  def build(docs: DataFrame, root: String, version: Int, seed: Long,
      budget: Long, shards: Int): Unit =
    graft.sources.Lease.withLease(docs.sparkSession, root) {
      commitVersion(
        CuratedCorpus.withCounts(PipelineQueries.curatedTrainDocs(docs)),
        root, version, seed, budget, shards, lineage = None)
    }

  /** Build a version from a STANDING [[CuratedCorpus]] table — the
    * incremental production path: curation and tokenization were paid
    * at init/fold time, so this is a budget fill over pre-counted
    * narrow rows plus the budget-bounded text layout join. Pinned
    * equal to [[build]] over the equivalent full corpus
    * (ReleaseSpec).
    *
    * `atBatch` cuts the version AS OF a fold watermark
    * ([[CuratedCorpus.openAt]]: base + folds ≤ the bound, a partition
    * filter) instead of the live table — the
    * [[IngestStream.lockstepView]] consumer: a cut pinned to the
    * loop's shared watermark matches the sibling indexes' answer AND
    * is immune to an in-flight fold's half-written partition files
    * (the excluded partition is never listed). The bound clamps to
    * the current watermark, must be ≥ the corpus's collapse floor
    * (openAt refuses below it), and is what the lineage records — the
    * cadence's advance math sees the state actually cut, not the
    * folds that happened to be in flight. Retractions apply in full,
    * as everywhere ([[graft.sources.StandingStore.openAt]]). */
  def buildFromCorpus(spark: SparkSession, corpusPath: String,
      root: String, version: Int, seed: Long, budget: Long,
      shards: Int,
      atBatch: Option[Long] = None): Unit =
    graft.sources.Lease.withLease(spark, root) {
    // lineage SIDECAR: which standing table and which fold watermark
    // this version was cut from — the provenance an auditor walks
    // from a mounted release back to the corpus state. Deliberately
    // NOT part of the manifest (the manifest stays a pure function of
    // (snapshot, seed, budget, shards), so the incremental-≡-full
    // bit-identity pin and rebuild determinism are unaffected by
    // where the rows happened to live), and written BEFORE the
    // manifest: a committed version must never be lineage-less, or
    // the cadence would read it as "always due" and cut a spurious
    // version after a crash between the two writes.
    // a release cadence on a quiesced corpus may be the FIRST entry
    // point after a crashed compact swap — heal it rather than throw
    // on the missing live dir until some fold happens to run. The
    // recovery MUTATES the corpus root, so it runs under the CORPUS
    // lease (not just this builder's release-root lease): recover's
    // marker-based roll-forward is armed for a live compact's whole
    // swap window, and racing it against the corpus's own maintainer
    // would interleave renames. Lease order is release-root → corpus
    // root, and nothing acquires them in reverse, so no deadlock.
    graft.sources.Lease.withLease(spark, corpusPath) {
      CuratedCorpus.recoverSwap(spark, corpusPath)
    }
    val wm = CuratedCorpus.batchWatermark(spark, corpusPath)
    val effective = atBatch.fold(wm)(b => math.min(b, wm))
    val rows = atBatch match {
      case Some(_) => CuratedCorpus.openAt(spark, corpusPath, effective)
      case None => CuratedCorpus.open(spark, corpusPath)
    }
    val escaped = escapeJsonString(corpusPath)
    commitVersion(rows, root, version, seed, budget, shards,
      lineage =
        Some(s"""{"corpus_path":"$escaped","corpus_batch":$effective}"""))
  }

  /** JSON-string escape for the tiny sidecars this module writes
    * (manifest source names, lineage corpus paths) — and its exact
    * inverse. The inverse is ONE left-to-right pass: each backslash
    * consumes exactly the next char, so it is the inverse of
    * [[escapeJsonString]] by construction, with no well-formedness
    * argument to maintain (chained replaces need one — the reader
    * and writer must share these, never re-derive them). */
  private[graft] def escapeJsonString(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private[graft] def unescapeJsonString(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { b.append(s.charAt(i + 1)); i += 2 }
      else { b.append(c); i += 1 }
    }
    b.toString
  }

  /**
   * The release CADENCE — the loop's last composition: cut the next
   * version from the standing corpus when its fold watermark has
   * advanced at least `everyBatches` past the newest committed
   * version's recorded lineage, then prune to the newest `keep`.
   * Called after every fold (or on a timer), this keeps a mounted-
   * release set rolling forward automatically: stream → gates → fold
   * → cadence, with nothing hand-cranked. A root whose newest version
   * has NO lineage (a full [[build]], or no version at all) is always
   * due — the first corpus-cut version establishes the baseline the
   * cadence advances from. Idempotent between due points: not-due
   * calls touch nothing but the manifest/lineage listings.
   *
   * ONE maintainer per root, mechanically enforced: the whole
   * check-build-prune sequence runs under the root's
   * [[graft.sources.Lease]], so two racing maintainers — which would
   * both read `latestVersion + 1` and interleave overwrites of the
   * same version directory — resolve as one winner and one fail-fast
   * `HeldElsewhereException` (same guard as
   * [[graft.ann.IvfIndex.ensure]] and every compact here).
   *
   * `atBatch` pins the cut to a caller-supplied watermark (a
   * lockstep view's — [[buildFromCorpus]]'s as-of contract); the
   * due-math then advances on the PINNED clock, so a bound that has
   * not moved never re-cuts.
   *
   * @return the version cut, when one was
   */
  def maintainFromCorpus(spark: SparkSession, corpusPath: String,
      root: String, seed: Long, budget: Long, shards: Int,
      everyBatches: Long, keep: Int = 2,
      atBatch: Option[Long] = None): Option[Int] =
    graft.sources.Lease.withLease(spark, root) {
    require(everyBatches >= 1, s"everyBatches must be >= 1, got $everyBatches")
    // corpus-root lease for the corpus-mutating recovery — see
    // buildFromCorpus (same race, same lease order)
    graft.sources.Lease.withLease(spark, corpusPath) {
      CuratedCorpus.recoverSwap(spark, corpusPath)
    }
    val liveWm = CuratedCorpus.batchWatermark(spark, corpusPath)
    val wm = atBatch.fold(liveWm)(b => math.min(b, liveWm))
    val latest = latestVersion(spark, root)
    val lastWm = latest.flatMap(v => lineageJson(spark, root, v))
      .flatMap(j => "\"corpus_batch\":(-?\\d+)".r.findFirstMatchIn(j))
      .map(_.group(1).toLong)
    val due = lastWm.forall(w => wm - w >= everyBatches)
    if (due) {
      val v = latest.getOrElse(0) + 1
      // forward the CLAMPED bound, not the raw one: the build re-reads
      // the live watermark, and a fold landing between the due-check
      // and the cut would otherwise move a pinned cut onto a clock the
      // due-math never saw (only the pinned path — an unpinned cadence
      // keeps the live-table read it always had)
      buildFromCorpus(spark, corpusPath, root, v, seed, budget, shards,
        atBatch.map(_ => wm))
      prune(spark, root, keep)
      Some(v)
    } else None
  }

  /** The mounted EPOCH view — [[openVersion]]'s rows carrying epoch
    * `e`'s (shard, pos) instead of the stored epoch 0's: what a
    * training reader iterates for its e-th pass. Epoch 0 is the
    * files themselves (zero extra work); later epochs join the
    * id-only [[epochDeal]] plan back onto the rows — one broadcast-
    * or hash-join on doc_id, still no byte rewritten. */
  def openEpoch(spark: SparkSession, root: String, version: Int,
      epoch: Int): DataFrame =
    if (epoch == 0) openVersion(spark, root, version)
    else openVersion(spark, root, version)
      .drop("shard", "pos")
      .join(epochDeal(spark, root, version, epoch), Seq("doc_id"))
      .select("doc_id", "source", "n_tokens", "pos", "text", "shard")

  /** The lineage sidecar for a committed version, when the version
    * was cut from a standing corpus ([[buildFromCorpus]]); a full
    * [[build]] from a raw snapshot has none. */
  def lineageJson(spark: SparkSession, root: String,
      version: Int): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/v$version/$LineageFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(readString(spark, p.toString)) else None
  }

  /** The shared layout-and-commit step over a curated train table
    * (doc_id, source, n_tokens, text). `lineage`, when present, lands
    * strictly BEFORE the manifest — a committed version is never
    * lineage-less. */
  private def commitVersion(train: DataFrame, root: String, version: Int,
      seed: Long, budget: Long, shards: Int,
      lineage: Option[String]): Unit = {
    val spark = train.sparkSession
    val vdir = s"$root/v$version"
    // a rebuild must first drop the old commit marker: if the new
    // shard write dies midway, the version must read as uncommitted,
    // not as "committed" with half-new files. The lineage sidecar goes
    // with it — a full rebuild of a formerly corpus-cut version must
    // not inherit stale provenance.
    deletePath(spark, s"$vdir/$ManifestFile")
    deletePath(spark, s"$vdir/$LineageFile")
    val cand = Sampling.tokenBudgetFillCounted(train,
      "source", "doc_id", "n_tokens", seed, budget)
    val deal = Dedup.shuffleDeal(cand, "doc_id", seed, shards)
    val rows = cand
      .join(deal.select("doc_id", "shard", "pos"), Seq("doc_id"))
      .join(train.select("doc_id", "text"), Seq("doc_id"))
      .select("doc_id", "source", "n_tokens", "shard", "pos", "text")
    Layout.writeSharded(rows, "shard", "pos", s"$vdir/shards")
    // manifest from the files just written (one bounded pass; also
    // proves the layout is readable before it is declared committed).
    // Explicit schema: a kept set the budget/curation emptied writes
    // zero data files, and schema inference over only a _SUCCESS
    // marker would abort the build instead of committing the
    // (legitimate, visible-as-empty) version.
    val written = spark.read
      .schema("doc_id LONG, source STRING, n_tokens LONG, pos LONG, " +
        "text STRING, shard INT")
      .parquet(s"$vdir/shards")
    val fp = written.agg(
        count(lit(1)).as("rows"),
        coalesce(sum("n_tokens"), lit(0L)).as("tokens"),
        coalesce(expr("bit_xor(xxhash64(doc_id, text))"), lit(0L))
          .as("fingerprint"))
      .head()
    // a null source is a valid budget group (the fill keeps it), so
    // the manifest must render it as JSON null — not crash the sort
    // or conflate it with a source literally named "null" — and
    // data-controlled source names must be escaped
    val perSource = written.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .sortBy { case (s, _, _) => (s.isEmpty, s.getOrElse("")) }
      .map { case (s, d, t) =>
        val key = s.map(v => "\"" + escapeJsonString(v) + "\"")
          .getOrElse("null")
        s"""{"source":$key,"docs":$d,"tokens":$t}"""
      }
      .mkString("[", ",", "]")
    val manifest =
      s"""{"version":$version,"seed":$seed,"budget":$budget,""" +
        s""""shards":$shards,"rows":${fp.getLong(0)},""" +
        s""""tokens":${fp.getLong(1)},"fingerprint":${fp.getLong(2)},""" +
        s""""sources":$perSource}"""
    lineage.foreach(writeString(spark, s"$vdir/$LineageFile", _))
    writeString(spark, s"$vdir/$ManifestFile", manifest)
  }

  /** Newest COMMITTED version under `root` (manifest present), if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/v$v/$ManifestFile")))
      .sorted.lastOption
  }

  /** The newest committed release's rows, from ANY session. */
  def open(spark: SparkSession, root: String): DataFrame =
    openVersion(spark, root,
      latestVersion(spark, root).getOrElse(throw new IllegalStateException(
        s"no committed release under $root")))

  /** A SPECIFIC committed version's rows — what a training run
    * actually mounts: the version is pinned in the run config, not
    * "whatever is newest when a reader happens to start" (two readers
    * of one run must never see different corpora because a build
    * landed between their starts). */
  def openVersion(spark: SparkSession, root: String, version: Int): DataFrame = {
    val m = new org.apache.hadoop.fs.Path(s"$root/v$version/$ManifestFile")
    require(m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m),
      s"version $version under $root is not committed")
    // explicit schema: a committed-but-empty version (rows:0 in its
    // manifest) has no data files to infer from
    spark.read
      .schema("doc_id LONG, source STRING, n_tokens LONG, pos LONG, " +
        "text STRING, shard INT")
      .parquet(s"$root/v$version/shards")
  }

  /**
   * EPOCH read plan for a mounted version — the multi-epoch training
   * story without rewriting a byte: the stored layout IS epoch 0
   * (`Dedup.shuffleDeal` with the manifest's seed), and epoch `e`'s
   * plan is the same nonlinear mix keyed by `seed + e`, so every
   * epoch is a genuinely re-dealt global permutation (not an affine
   * nudge of the last one) that any reader can recompute from the
   * release alone — seed and shard count come from the MANIFEST, so
   * the plan needs no side-channel config. Returns (doc_id, shard,
   * pos): the reader joins it against [[openVersion]] (or, for epoch
   * 0, just mounts the files — pinned identical in ReleaseSpec).
   */
  def epochDeal(spark: SparkSession, root: String, version: Int,
      epoch: Int): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val (seed, shards) = dealParams(spark, root, version)
    graft.dedup.Dedup.shuffleDeal(
      openVersion(spark, root, version).select("doc_id"),
      "doc_id", seed + epoch, shards)
      // the stored layout declares shard INT; the deal's key
      // arithmetic yields LONG — one type across epochs, or a reader
      // unioning / strictly typing epoch views breaks on epoch >= 1
      .select(col("doc_id"), col("shard").cast("int").as("shard"),
        col("pos"))
  }

  /** (seed, shards) of a committed version — ONE manifest read. */
  private def dealParams(spark: SparkSession, root: String,
      version: Int): (Long, Int) = {
    val manifest = readString(spark, s"$root/v$version/$ManifestFile")
    def field(name: String): Long =
      ("\"" + name + "\":(-?\\d+)").r.findFirstMatchIn(manifest)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(
          s"manifest for v$version carries no $name"))
    (field("seed"), field("shards").toInt)
  }

  /** Per-epoch PACKED-SEQUENCE plan for a mounted release — the
    * training-reader loop closed: epoch `e`'s placement
    * ([[epochDeal]]; the stored files themselves for epoch 0) packed
    * into fixed `seqLen`-token sequences per shard
    * ([[graft.text.TextAnalysis.packPlaced]], the q_text_pack
    * operator). ZERO text reads and no byte rewritten for ANY epoch:
    * the release stores per-doc token counts, so the whole plan is
    * (doc_id, shard, pos, n_tokens) arithmetic — an id-only scan
    * joined id-only (plan-pinned in PlanQualitySpec). Output is the
    * q_text_pack span shape: (shard, seq, doc_id, seq_offset,
    * n_tokens_in_seq); the reader maps spans back onto text by
    * doc_id, touching each shard's documents once, in pos order.
    *
    * For epoch ≥ 1 the token counts ride the re-deal itself
    * ([[graft.dedup.Dedup.shuffleDeal]]'s carry seam) instead of
    * joining [[epochDeal]] back against the stored counts — the deal
    * places by id arithmetic alone, so carrying `n_tokens` through
    * it yields row-identical placement while cutting the plan from
    * two scans + a doc_id-keyed join (two exchanges, two sorts) to
    * ONE scan feeding the shard window directly (plan-pinned). */
  def packEpoch(spark: SparkSession, root: String, version: Int,
      epoch: Int, seqLen: Int): DataFrame = {
    val counted = openVersion(spark, root, version)
      .select("doc_id", "shard", "pos", "n_tokens")
    val placed =
      if (epoch == 0) counted
      else {
        val (seed, shards) = dealParams(spark, root, version)
        graft.dedup.Dedup.shuffleDeal(
          counted.drop("shard", "pos"), "doc_id", seed + epoch, shards,
          carry = Seq("n_tokens"))
          .select(col("doc_id"), col("shard").cast("int").as("shard"),
            col("pos"), col("n_tokens"))
      }
    graft.text.TextAnalysis.packPlaced(placed, "doc_id", "shard", "pos",
      "n_tokens", seqLen)
  }

  /** The newest committed release's manifest JSON. */
  def manifestJson(spark: SparkSession, root: String): String = {
    val v = latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed release under $root"))
    readString(spark, s"$root/v$v/$ManifestFile")
  }

  /** Keep the newest `keep` committed versions; delete every version
    * directory (committed or partial) strictly older than the oldest
    * retained one. */
  def prune(spark: SparkSession, root: String, keep: Int): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val all = fs.listStatus(p).toSeq.map(_.getPath.getName)
        .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      val committed = all.filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/v$v/$ManifestFile")))
        .sorted
      val floor = committed.takeRight(keep).headOption.getOrElse(Int.MaxValue)
      all.filter(_ < floor).foreach(v =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/v$v"), true))
    }
  }

  /** Retire the whole release root. */
  def delete(spark: SparkSession, root: String): Unit =
    deletePath(spark, root)

  private def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  private def writeString(spark: SparkSession, path: String,
      s: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readString(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
  }
}
