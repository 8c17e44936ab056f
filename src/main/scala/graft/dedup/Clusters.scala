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
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst")).persist()
    val nEdges = p.count()
    val out =
      if (nEdges <= localThreshold) resolveLocal(docs, idCol, p)
      else resolveDistributed(docs, idCol, p, maxIters)
    p.unpersist()
    out
  }

  /** Driver-side union-find over a collected (small) edge list. */
  private def resolveLocal(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val edges = pairs.as[(Long, Long)].collect()
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
    val labels = nodeIds.map(n => (n, find(n))).toSeq.toDF("doc_id", "cluster")
    val singletons = docs.select(col(idCol).as("doc_id"))
      .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("cluster", col("doc_id"))
    labels.unionByName(singletons)
      .withColumn("keeper", (col("doc_id") === col("cluster")).cast("int"))
  }

  /** Distributed min-propagation (the >threshold scale path). */
  private def resolveDistributed(docs: DataFrame, idCol: String,
      pairs: DataFrame, maxIters: Int): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    // The loop only touches nodes that appear in some edge — at corpus
    // scale the near-dup subgraph is a sliver of the corpus, and the
    // untouched majority joins back as singletons at the end.
    val nodes = edges.select(col("src").as("doc_id")).distinct().persist()
    var labels = nodes.withColumn("cluster", col("doc_id")).persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min("cluster").as("nbr_min"))
      val next = labels.withColumnRenamed("cluster", "old")
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("old"),
          least(col("old"), coalesce(col("nbr_min"), col("old"))).as("cluster"))
        .persist()
      val changed = next.filter(col("cluster") =!= col("old")).count()
      labels.unpersist()
      labels = next.drop("old")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // Silent non-convergence would split real components into several
    // clusters with no signal — fail loudly; callers with genuinely
    // deep graphs raise maxIters (rounds needed = graph diameter).
    if (!converged) throw new IllegalStateException(
      s"cluster propagation did not converge within $maxIters rounds; " +
        "raise maxIters (needs >= component diameter)")
    val singletons = docs.select(col(idCol).as("doc_id"))
      .join(nodes, Seq("doc_id"), "left_anti")
      .withColumn("cluster", col("doc_id"))
    nodes.unpersist()
    labels.unionByName(singletons)
      .withColumn("keeper", (col("doc_id") === col("cluster")).cast("int"))
  }
}
