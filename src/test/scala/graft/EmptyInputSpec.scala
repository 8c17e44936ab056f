package graft

import java.nio.file.Files

/**
 * Empty-input robustness sweep: EVERY driver query must run (not
 * throw) over a corpus with the right schemas and ZERO rows — the
 * shape of a fresh deployment's first day, an empty micro-batch's
 * batch twin, or a fully-filtered partition. Queries legitimately
 * return zero rows here; what they must never do is crash on a
 * head() of an empty aggregate, a min of nothing, or a train step
 * with no sample. (The driver's oracle compare would pass such a
 * query trivially — both engines emit nothing — so this sweep is the
 * only place the no-crash contract is enforced.)
 *
 * The few queries that REQUIRE a nonempty corpus by contract are
 * listed with the reason; each must fail with a CLEAR
 * IllegalArgumentException/IllegalStateException, not an opaque
 * NoSuchElementException three operators deep.
 */
class EmptyInputSpec extends SparkSpec {

  /** Queries whose contract genuinely needs data: centroid training
    * (can't seed K centroids from nothing) and the resident-state
    * caches built on first touch. Each must throw something
    * intentional, not an arbitrary runtime error. */
  private val needsData = Set(
    "q_ann_ivf", "q_ann_ivf_trained", "q_ann_cluster_sizes",
    "q_ann_assign", "q_dedup_semantic", "q_dedup_semantic_trained")

  test("every query runs on a zero-row corpus; data-dependent ones fail clearly") {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      Tables(spark, src, t).limit(0)
        .write.parquet(s"$dir/$t.parquet")
    }
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        if (needsData(name))
          failures += s"$name: expected a clear failure on empty data, got $n rows"
      } catch {
        case _: IllegalArgumentException | _: IllegalStateException
            if needsData(name) => // intentional, clearly-typed refusal
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
    }
    assert(failures.isEmpty,
      s"queries not empty-safe:\n${failures.mkString("\n")}")
  }

  test("text/embedding queries survive all-null payloads (rows present, values null)") {
    import org.apache.spark.sql.functions._
    // the "scraper returned nulls" shape: documents/embeddings keep
    // their rows and keys but every payload value is null; the
    // relational tables stay intact (the CDC feed derives from events)
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-nullpay").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      Tables(spark, src, t).write.parquet(s"$dir/$t.parquet")
    }
    Tables(spark, src, "documents")
      .withColumn("text", lit(null).cast("string"))
      .write.parquet(s"$dir/documents.parquet")
    Tables(spark, src, "embeddings")
      .withColumn("embedding", lit(null).cast("array<float>"))
      .write.parquet(s"$dir/embeddings.parquet")
    // centroid trainers now also lack a sample (all-null vectors are
    // filtered before seeding) — same clearly-typed refusal contract
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, dir).count(); () }
      catch {
        case _: IllegalArgumentException | _: IllegalStateException
            if needsData(name) => ()
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
    }
    assert(failures.isEmpty,
      s"queries not null-payload-safe:\n${failures.mkString("\n")}")
  }
}
