package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Near-dup cluster resolution: connected components over the
 * candidate-pair graph, labeling every doc with the minimum doc id of
 * its component (the conventional "keeper" choice).
 *
 * Algorithm: iterative min-label propagation — each round every node
 * takes the min of its own label and its neighbors' labels, until a
 * fixpoint. Converges in ≤ diameter rounds; near-dup components are
 * tiny (pairs/triangles), so this typically stops after 2-3 rounds.
 * At billion-edge scale you'd switch to the large-star/small-star
 * formulation (log-diameter rounds, same join primitive); the shape
 * here — join labels⋈edges, groupBy min, compare-and-swap — is that
 * algorithm's inner loop.
 *
 * Determinism: labels are min doc ids, joins are equi-joins — the
 * result is independent of execution order.
 */
object Clusters {

  /**
   * @param docs  (idCol) — every document (singletons keep their own id)
   * @param pairs (aCol, bCol) — undirected near-dup edges
   * @return (doc_id, cluster, keeper) — cluster = component min id
   */
  /** Edge-count threshold below which the component resolution runs as
    * a driver-side union-find: after LSH + Jaccard filtering the dup
    * graph is typically a sliver of the corpus, and a local union-find
    * beats N distributed join rounds by orders of magnitude. Above the
    * threshold the distributed min-propagation loop takes over. */
  val LocalEdgeThreshold = 1000000L

  def resolve(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20, localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // ONE bounded fetch decides the path AND feeds the local one:
    // limit(threshold+1) returns the COMPLETE edge set whenever the
    // graph is within the local budget (the limit(cap+1) house
    // pattern), so the common small-graph case pays a single driver
    // action instead of the old persist → count → collect triple —
    // per incremental-maintenance call, that was a full extra
    // materialization of the candidate-pair funnel. The cap stays
    // [[LocalEdgeThreshold]]-bounded (~32 MB of edge tuples at the
    // default), same bound the old collect path carried. A genuinely
    // large graph falls through and re-derives the edges inside the
    // star rounds' round-0 checkpoint (one wasted bounded probe —
    // noise next to the rounds; the old persist bought nothing there
    // either, since the checkpoint consumes the edges exactly once).
    val cap = math.min(localThreshold, Int.MaxValue - 1L).toInt
    val spark = docs.sparkSession
    import spark.implicits._
    val probe = p.as[(Long, Long)].limit(cap + 1).collect()
    if (probe.length <= cap) resolveLocal(docs, idCol, probe)
    else resolveDistributed(docs, idCol, p, maxIters)
  }

  /**
   * INCREMENTAL cluster maintenance — fold one batch into a standing
   * assignment table without re-clustering the corpus. At 100 TB the
   * daily question is never "what are the components of everything"
   * but "where do today's documents land, and which existing clusters
   * did they merge" — answering it must not touch corpus-scale state
   * beyond one broadcast join.
   *
   * Works on the QUOTIENT graph: each corpus doc is represented by its
   * cluster representative (already the MIN doc id of its component),
   * each batch doc by itself; the new edges' endpoints map through the
   * assignment table. Components of that graph are exactly the merged
   * components, and the quotient min IS the global min (every corpus
   * doc ≥ its representative), so the output is IDENTICAL to
   * re-running [[resolve]] on corpus ∪ batch from scratch
   * (equivalence-tested, and oracle-checked via the from-scratch SQL).
   *
   * Scale shape: the quotient graph has |batch| + |touched clusters|
   * nodes — batch-sized, corpus-independent; [[resolve]] on it is the
   * usual union-find/star machinery. The corpus-sized assignment table
   * is touched ONCE, by a broadcast join on its cluster column (the
   * quotient label map is batch-sized, so it broadcasts by contract).
   *
   * @param assignments (doc_id, cluster) standing labels, cluster =
   *                    component min doc id (a prior resolve output)
   * @param batchDocs   new docs (idCol); ids disjoint from the corpus
   * @param newPairs    (aCol, bCol) near-dup edges touching the batch:
   *                    within-batch pairs plus batch↔corpus probe
   *                    matches — the incremental funnels' outputs
   * @return (doc_id, cluster, keeper) for corpus ∪ batch
   */
  def incrementalResolve(assignments: DataFrame, batchDocs: DataFrame,
      idCol: String, newPairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val asgA = assignments.select(col("doc_id").as("__a"), col("cluster").as("__ca"))
    val asgB = assignments.select(col("doc_id").as("__b"), col("cluster").as("__cb"))
    val quotientEdges = newPairs
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
      .join(asgA, Seq("__a"), "left")
      .join(asgB, Seq("__b"), "left")
      .select(coalesce(col("__ca"), col("__a")).as("qa"),
        coalesce(col("__cb"), col("__b")).as("qb"))
    // batch docs off every edge come back as singletons; touched
    // corpus representatives are edge nodes, so they need no seeding
    val quotient = resolve(batchDocs.select(col(idCol).as("doc_id")), "doc_id",
      quotientEdges, "qa", "qb")
      .select(col("doc_id"), col("cluster"))
    // corpus side: relabel through the quotient map on the REP —
    // untouched clusters (no quotient row) keep their label. Batch ids
    // are disjoint from corpus doc ids by contract, so a batch row in
    // the map can never capture a corpus cluster.
    val repMap = broadcast(
      quotient.select(col("doc_id").as("cluster"), col("cluster").as("__new")))
    val corpusOut = assignments
      .join(repMap, Seq("cluster"), "left")
      .select(col("doc_id"), coalesce(col("__new"), col("cluster")).as("cluster"))
    val batchOut = quotient
      .join(batchDocs.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
    corpusOut.unionByName(batchOut)
      .withColumn("keeper", (col("doc_id") === col("cluster")).cast("int"))
  }

  /** Driver-side union-find over an already-collected (cap-bounded)
    * edge list. Union-by-min keeps every tree's root at its
    * component's minimum id, so the labels are independent of the
    * edge order the bounded fetch happened to return. */
  private def resolveLocal(docs: DataFrame, idCol: String,
      edges: Array[(Long, Long)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodeIds = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // Data-proportional parallelism for the driver-local label table:
    // LocalTableScanExec fans a local relation out to min(rows,
    // leafNodeDefaultParallelism) tasks — defaultParallelism-many
    // micro-tasks for a few hundred labels, and every consumer of a
    // resolve output (the standing assignment caches feed ~6 queries)
    // pays that fixed per-task setup on EVERY scan (measured ~0.5 s
    // executor CPU per action against a 33-partition cached assignment
    // at sf0.1, vs ~0.02 s of actual data work). One partition per
    // ~500k labels keeps the local path (≤ 2·LocalEdgeThreshold rows
    // by construction) at ≤ 4 tasks; coalesce preserves LocalRelation
    // stats so broadcast decisions downstream are unchanged.
    val labels = nodeIds.map(n => (n, find(n))).toSeq.toDF("doc_id", "cluster")
      .coalesce(math.max(1, nodeIds.length / 500000))
    val singletons = docs.select(col(idCol).as("doc_id"))
      .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("cluster", col("doc_id"))
    labels.unionByName(singletons)
      .withColumn("keeper", (col("doc_id") === col("cluster")).cast("int"))
  }

  /**
   * Distributed path: alternating large-star / small-star rounds
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14) — converges in O(log diameter) rounds, not diameter
   * rounds, so chain-shaped dup graphs (crawl near-dup chains) of any
   * realistic depth finish well inside `maxIters` (20 rounds covers
   * diameters past 2^20; the loud throw below is a correctness
   * backstop, not an expected exit).
   *
   * Both operators are groupBy-min + equi-join rather than a window:
   * the partial (map-side) aggregation absorbs hub-node skew on the
   * min computation, and the remaining skewed join is exactly the
   * shape AQE's skew-join splitting handles.
   *
   * Invariant: edges are kept canonical (src > dst, distinct); at the
   * fixpoint every component is a star rooted at its minimum node, so
   * the edge set IS the label map.
   */
  private def resolveDistributed(docs: DataFrame, idCol: String,
      pairs: DataFrame, maxIters: Int): DataFrame = {
    // Each round is CHECKPOINTED, not just persisted: one round's plan
    // references the previous round's ~12 times (bidir unions + joins),
    // so without lineage truncation the logical plan grows as
    // 12^rounds and the optimizer OOMs long before the data does.
    // localCheckpoint truncates to the materialized blocks; a
    // multi-executor deployment would set a reliable checkpoint dir
    // and use checkpoint() instead (localCheckpoint dies with a lost
    // executor).
    var edges = pairs
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    // Only nodes on some edge loop; the untouched corpus majority
    // joins back as singletons at the end. (Derived lazily from the
    // round-0 checkpoint — the two anti-joins below each recompute one
    // cheap distinct over its blocks; a persist here would never
    // materialize before the caller's action anyway.)
    val nodes = edges.select(col("src").as("doc_id"))
      .union(edges.select(col("dst").as("doc_id"))).distinct()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // Fixpoint test on canonical sets: same size and no new edges.
      converged = next.count() == edges.count() &&
        next.except(edges).isEmpty
      // NOTE: no unpersist — localCheckpoint blocks are not tracked by
      // the CacheManager; dropping the reference lets the
      // ContextCleaner reclaim each superseded round's blocks.
      edges = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"large-star/small-star did not converge within $maxIters rounds " +
        "(log-diameter expected; this indicates a bug or maxIters ~ 0)")
    val labels = edges.select(col("src").as("doc_id"), col("dst").as("cluster"))
    val roots = nodes.join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("cluster", col("doc_id"))
    val singletons = docs.select(col(idCol).as("doc_id"))
      .join(nodes, Seq("doc_id"), "left_anti")
      .withColumn("cluster", col("doc_id"))
    labels.unionByName(roots).unionByName(singletons)
      .withColumn("keeper", (col("doc_id") === col("cluster")).cast("int"))
  }

  /** Large-star: every neighbor v > u re-links to m = min(N(u) ∪ {u}).
    * Output stays canonical (v > m). */
  private def largeStar(e: DataFrame): DataFrame = {
    val bidir = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = bidir.groupBy("src").agg(min("dst").as("mn"))
    bidir.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), least(col("mn"), col("src")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Small-star: all smaller neighbors (and u itself) re-link to
    * m = min(N_≤(u) ∪ {u}); on canonical edges m = min(dst) per src. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("src").agg(min("dst").as("m"))
    val nbr = e.join(mins, "src")
      .filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = mins.select(col("src"), col("m").as("dst"))
    nbr.union(self).filter(col("src") =!= col("dst")).distinct()
  }
}
